"""IVF (inverted-file) ANN kernels: deterministic k-means + cell assignment.

The IVF/coarse-quantizer scheme follows Jegou, Douze & Schmid, "Product
quantization for nearest neighbor search" (TPAMI 2011) — here only the
coarse inverted-file stage, with exact scoring inside probed cells (no PQ
compression; exactness inside the cell keeps the driver check value-stable).

The IVF scale path for cosine similarity search: vectors are L2-normalized,
a small seeded Lloyd's k-means (trained driver-side on a bounded
deterministic sample) defines the cells, every vector is assigned to its
max-dot-product cell in one vectorized Arrow hop, and a query only scans the
``nprobe`` cells nearest to it — candidate generation becomes an equi-join
on cell id, exactly like the LSH bucket join but with data-adaptive regions
(typically better recall per candidate at the same fan-out).

Everything is a pure function of the seed so driver-harness results are
value-stable across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np


def normalize(X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
    return X / np.where(norms == 0.0, 1.0, norms)


def kmeans_fit(
    X: np.ndarray, k: int, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Seeded Lloyd's iterations on normalized vectors; returns normalized
    centroids (k x dim).  Deterministic: fixed init, fixed iteration count,
    empty clusters keep their previous centroid."""
    Xn = normalize(X)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(Xn), size=min(k, len(Xn)), replace=False)
    C = Xn[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (Xn @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = Xn[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = normalize(C)
    return C


def assign_cells(X, C: np.ndarray) -> np.ndarray:
    """Nearest (max cosine) centroid per row -> int32 cell ids."""
    Xn = normalize(np.asarray(list(X), dtype=np.float64))
    return (Xn @ C.T).argmax(axis=1).astype(np.int32)


def assign_cells_multi(X, C: np.ndarray, a: int) -> list[list[int]]:
    """Top-``a`` highest-cosine cells per row (multi-assignment: each vector
    is indexed in its ``a`` best cells, trading index size for recall — the
    standard IVF replication knob).  Stable order, cell ids sorted."""
    Xn = normalize(np.asarray(list(X), dtype=np.float64))
    aff = Xn @ C.T
    top = np.argsort(-aff, axis=1, kind="stable")[:, :a]
    return [sorted(int(c) for c in row) for row in top]


def probe_cells(q: np.ndarray, C: np.ndarray, nprobe: int) -> np.ndarray:
    """The nprobe highest-cosine cells for one query vector (sorted ids) —
    multiprobe by centroid margin: cells are ranked by cosine to the query,
    so probe i+1 is always the next-best margin."""
    qn = normalize(q.reshape(1, -1))[0]
    order = np.argsort(-(C @ qn), kind="stable")
    return np.sort(order[:nprobe]).astype(np.int32)


def lsh_probe_sigs(
    q: np.ndarray, planes: np.ndarray, nflip: int
) -> list[list[int]]:
    """Multiprobe sign-LSH: per hash table, the query's own bucket plus the
    buckets reached by flipping each of the ``nflip`` lowest-|margin| bits
    (Lv et al., "Multi-Probe LSH", VLDB 2007).  A near neighbor that lands
    one low-confidence bit away still becomes a candidate without paying
    for more tables or wider buckets.

    Uses the identical einsum/threshold arithmetic as the corpus-side
    signature UDF (harness/similarity.py make_sign_lsh_udf) so a query's
    base bucket always equals its corpus signature bit-for-bit.
    """
    X = np.asarray(q, dtype=np.float64).reshape(1, -1)
    proj = np.einsum("nd,tbd->ntb", X, planes)[0]  # (T, bits) margins
    bits = proj > 0
    weights = (1 << np.arange(planes.shape[1])).astype(np.int64)
    out: list[list[int]] = []
    for t in range(planes.shape[0]):
        base = int((bits[t].astype(np.int64) * weights).sum())
        sigs = [base]
        order = np.argsort(np.abs(proj[t]), kind="stable")
        for j in order[:nflip]:
            sigs.append(base ^ int(weights[j]))
        out.append(sigs)
    return out
