"""Vectorized per-row sketch kernels (SimHash, MinHash) over token hashes.

Algorithms are the published originals, reimplemented from the papers (no
reference code exists in this sandbox — SURVEY.md §0): MinHash per Broder,
"On the resemblance and containment of documents" (SEQUENCES 1997); SimHash
per Charikar, "Similarity estimation techniques from rounding algorithms"
(STOC 2002); banding/blocking per Leskovec-Rajaraman-Ullman, *Mining of
Massive Datasets* ch. 3.

These let the dedup sketches be computed WITHOUT shuffling tokens: the plan
is  split(text) -> transform(xxhash64) [JVM, per row]  ->  one Arrow hop
computing the per-doc sketch here in numpy.  The previous formulation
exploded every token/shingle and ran a 64-column groupBy aggregation — a
full shuffle of the corpus' token stream; per-row sketching removes that
shuffle entirely, which is the difference that matters at 10^12 turns
(candidate-generation then only shuffles the tiny (doc_id, band, sig)
stream).

Bit/arithmetic conventions match the previous JVM-aggregation formulation
exactly (pytest-pinned in tests/test_kernels.py):
- simhash bit i is set iff sum over tokens of (bit_i(xxhash64(tok))*2 - 1)
  is > 0; bit index = two's-complement bit of the signed 64-bit hash.
- minhash_i = min over shingles of (h*a_i + b_i) mod M, M = 2^31-1,
  h = pmod(xxhash64(shingle), M); all values < 2^62 so int64 never wraps.
"""

from __future__ import annotations

import numpy as np

MERSENNE31 = (1 << 31) - 1


def _flatten(hash_lists):
    """list of int64 sequences -> (flat, offsets, lens); empties disallowed
    (callers filter size>=1 rows, matching the old explode semantics where
    token-less docs simply produced no rows)."""
    lens = np.array([len(h) for h in hash_lists], dtype=np.int64)
    if (lens == 0).any():
        raise ValueError("empty token-hash list; filter size >= 1 upstream")
    flat = (
        np.concatenate([np.asarray(h, dtype=np.int64) for h in hash_lists])
        if len(hash_lists)
        else np.zeros(0, dtype=np.int64)
    )
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    return flat, offsets, lens


def simhash_batch(token_hash_lists) -> np.ndarray:
    """per-row 64-bit SimHash from per-token xxhash64 values -> int64[n]."""
    n = len(token_hash_lists)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    flat, offsets, lens = _flatten(token_hash_lists)
    u = flat.view(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for i in range(64):
        signs = (((u >> np.uint64(i)) & np.uint64(1)).astype(np.int64) * 2) - 1
        sums = np.add.reduceat(signs, offsets)
        out |= (sums > 0).astype(np.uint64) << np.uint64(i)
    return out.view(np.int64)


def minhash_params(k: int = 64, seed: int = 1729):
    """The (a, b) affine coefficients — MUST stay in sync with the seed the
    harness used for the aggregation formulation so signatures are stable."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=k, dtype=np.int64)
    b = rng.randint(0, MERSENNE31, size=k, dtype=np.int64)
    return a, b


def minhash_batch(shingle_hash_lists, a: np.ndarray, b: np.ndarray):
    """per-row k MinHashes from per-shingle hashes (already reduced mod M).

    Returns a list of k-length int64 lists (Arrow-friendly array<long>).
    """
    n = len(shingle_hash_lists)
    k = len(a)
    if n == 0:
        return []
    flat, offsets, lens = _flatten(shingle_hash_lists)
    sigs = np.empty((n, k), dtype=np.int64)
    for i in range(k):
        vals = (flat * a[i] + b[i]) % MERSENNE31
        sigs[:, i] = np.minimum.reduceat(vals, offsets)
    return list(sigs)
