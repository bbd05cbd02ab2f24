"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03).

The classic rolling-hash document fingerprint: hash every k-byte window
with a polynomial rolling code, then keep the minimum hash of every
w-window of those codes (rightmost minimum).  Near-identical documents
share most selected hashes, so the digest supports plagiarism-style
near-dup detection at scale.

Fully vectorized over a packed Arrow batch: the k-gram codes come from k
shifted adds over the byte buffer (no per-byte Python), window minima from
a sliding-window view.  Deterministic — no Python hash(), no randomness.
"""

from __future__ import annotations

import hashlib

import numpy as np

from moira_spark.kernels import hashing

K = 8          # k-gram length in bytes
W = 16         # winnowing window (guarantee: every W consecutive k-grams
               # contribute at least one fingerprint)
_BASE = np.int64(1_000_003)
_MASK = np.int64((1 << 61) - 1)


def _kgram_codes(buffer: np.ndarray) -> np.ndarray:
    """Polynomial code of every k-byte window start (last K-1 are junk)."""
    b = buffer.astype(np.int64)
    n = len(b)
    code = np.zeros(n, dtype=np.int64)
    if n < K:
        return code
    acc = np.zeros(n - K + 1, dtype=np.int64)
    for j in range(K):
        acc = (acc * _BASE + b[j : n - K + 1 + j]) & _MASK
    code[: n - K + 1] = acc
    return code


def fingerprint_batch(texts) -> tuple[list[int], list[str]]:
    """-> (n_selected per text, hex digest of the sorted selected hashes).

    The digest is md5 of the comma-joined DECIMAL selected hashes in
    ascending order — a canonical text form any engine can reproduce
    (``md5(string_agg(DISTINCT h::VARCHAR, ',' ORDER BY h))``), which is
    what lets the driver hash-check this kernel against a first-principles
    SQL oracle instead of trusting the bytes-of-int64 layout."""
    buffer, lengths, offsets = hashing.pack_texts(texts)
    codes = _kgram_codes(buffer)
    n_out, digests = [], []
    for i in range(len(lengths)):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        m = max(hi - lo - K + 1, 0)  # k-grams fully inside this text
        if m == 0:
            n_out.append(0)
            digests.append(hashlib.md5(b"").hexdigest())
            continue
        c = codes[lo : lo + m]
        if m <= W:
            selected = np.array([c.min()])
        else:
            win = np.lib.stride_tricks.sliding_window_view(c, W)
            selected = np.unique(win.min(axis=1))
        n_out.append(int(len(selected)))
        canon = ",".join(str(int(h)) for h in selected)
        digests.append(hashlib.md5(canon.encode()).hexdigest())
    return n_out, digests
