"""Vectorized byte-level n-gram machinery shared by langid and the LM.

A batch of texts is UTF-8-encoded once into a single contiguous byte buffer;
n-gram statistics are computed with pure numpy over that buffer using
contiguous-segment reductions (np.add.reduceat), with the (n-1) boundary
positions of every text zeroed via a direct (small) index array — nothing is
allocated per-position except the value arrays themselves.  This is the
Arrow-batch analog of moira's C hot loop (bernoullimodule.c [M]) — the
per-element work happens in vectorized native code, not per-row Python.

Exactness contract: per-text sums are contiguous left-to-right float64
reductions, so a text's score depends only on its own bytes — independent of
batch composition, partitioning, or engine (oracle and Spark UDFs share this
module), which is what makes label parity exact.
"""

from __future__ import annotations

import numpy as np


def pack_texts(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Encode strings into (byte_buffer, lengths, offsets); offsets has
    len(texts)+1 entries."""
    bufs = [t.encode("utf-8") for t in texts]
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    if offsets[-1] == 0:
        return np.empty(0, dtype=np.uint8), lengths, offsets
    buffer = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return buffer, lengths, offsets


def _run_ranges(run_lengths: np.ndarray) -> np.ndarray:
    """[0..r0), [0..r1), ... concatenated (standard vectorized multi-arange)."""
    total = int(run_lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.cumsum(run_lengths) - run_lengths
    return np.arange(total, dtype=np.int64) - np.repeat(starts, run_lengths)


def invalid_tail_indices(lengths: np.ndarray, offsets: np.ndarray, n: int) -> np.ndarray:
    """Buffer positions that cannot start an in-text n-gram: the trailing
    min(len, n-1) positions of every text.  Small: ~(n-1) * n_texts."""
    counts = np.maximum(lengths - (n - 1), 0)
    tail = np.minimum(lengths, n - 1)
    inv_starts = offsets[:-1] + counts
    return np.repeat(inv_starts, tail) + _run_ranges(tail)


def segment_counts(lengths: np.ndarray, n: int) -> np.ndarray:
    """Number of n-grams per text: max(len - n + 1, 0)."""
    return np.maximum(lengths - (n - 1), 0)


def mask_tails(
    codes: np.ndarray,
    lengths: np.ndarray,
    offsets: np.ndarray,
    n: int,
    sentinel: int,
) -> np.ndarray:
    """Overwrite the invalid tail positions of ``codes`` (in place) with a
    sentinel bucket index.  Lookup tables extended with table[sentinel]=0.0
    then contribute exactly 0.0 at those positions, so a full-segment
    contiguous reduction equals the valid-only sum bit-for-bit (x + 0.0 == x
    in IEEE754) — without ever copying the big value array."""
    codes[invalid_tail_indices(lengths, offsets, n)] = sentinel
    return codes


def segment_sums(
    values: np.ndarray, lengths: np.ndarray, offsets: np.ndarray, n: int
) -> np.ndarray:
    """Per-text sums of ``values`` over all positions of each segment.

    Caller contract: positions that must not contribute were already
    sentinel-masked (``mask_tails``) so their value is exactly 0.0.  The
    reduction is contiguous left-to-right per segment -> exact and
    batch-composition-independent.
    """
    n_seg = len(lengths)
    if n_seg == 0:
        return np.zeros(0, dtype=np.float64)
    total = int(offsets[-1])
    if total == 0:
        return np.zeros(n_seg, dtype=np.float64)
    starts = offsets[:-1]
    # Trailing empty segments have start == total (out of range for
    # reduceat); they sum to 0 by definition, so reduce only the prefix.
    k = int(np.searchsorted(starts, total, side="left"))
    sums = np.zeros(n_seg, dtype=np.float64)
    if k > 0:
        sums[:k] = np.add.reduceat(values, starts[:k])
    # reduceat artifact: a mid-batch empty segment (start_i == start_{i+1})
    # yields values[start_i] instead of 0 — overwrite using the true counts.
    sums[segment_counts(lengths, n) == 0] = 0.0
    return sums


def valid_mask(lengths: np.ndarray, offsets: np.ndarray, n: int) -> np.ndarray:
    """Boolean mask of valid n-gram start positions (used at train time)."""
    total = int(offsets[-1])
    mask = np.ones(total, dtype=bool)
    mask[invalid_tail_indices(lengths, offsets, n)] = False
    return mask


def trigram_hashes(buffer: np.ndarray, dim: int) -> np.ndarray:
    """Rolling polynomial hash of every byte trigram start position.

    h(b0,b1,b2) = ((b0*31 + b1)*31 + b2) mod dim — deterministic (no Python
    hash randomization), cheap, stable across processes/executors.  Output
    has length len(buffer); the final 2 positions are garbage and are zeroed
    by ``segment_sums``/masked by ``valid_mask``.
    """
    if len(buffer) < 3:
        return np.zeros(len(buffer), dtype=np.int32)
    # int32 throughout: the max pre-mod value is (255*31+255)*31+255 < 2^18,
    # and halving the element width halves memory traffic on this
    # bandwidth-bound path (the buffer is ~400 bytes/text x batch size).
    b = buffer.astype(np.int32)
    h = np.zeros(len(b), dtype=np.int32)
    h[:-2] = (b[:-2] * 31 + b[1:-1]) * 31 + b[2:]
    if dim & (dim - 1) == 0:  # power of two: bitmask beats integer division
        h &= dim - 1
        return h
    return h % dim


def bigram_codes(buffer: np.ndarray) -> np.ndarray:
    """Exact 16-bit code of every byte bigram start position (last is junk)."""
    if len(buffer) < 2:
        return np.zeros(len(buffer), dtype=np.int32)
    b = buffer.astype(np.int32)
    c = np.zeros(len(b), dtype=np.int32)
    c[:-1] = b[:-1] * 256 + b[1:]
    return c
