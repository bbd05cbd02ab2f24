"""Vectorized byte-level n-gram machinery shared by langid and the LM.

A batch of texts is UTF-8-encoded once into a single contiguous byte buffer;
n-gram statistics are then computed with pure numpy over that buffer, with
per-text segment ids so nothing crosses a text boundary.  This is the
Arrow-batch analog of moira's C hot loop (bernoullimodule.c [M]) — the
per-element work happens in vectorized native code, not per-row Python.
"""

from __future__ import annotations

import numpy as np


def pack_texts(texts) -> tuple[np.ndarray, np.ndarray]:
    """Encode a sequence of strings into (byte_buffer, lengths)."""
    bufs = [t.encode("utf-8") for t in texts]
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    if lengths.sum() == 0:
        return np.empty(0, dtype=np.uint8), lengths
    buffer = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    return buffer, lengths


def ngram_positions(lengths: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Segment ids and validity mask for n-gram start positions.

    For the concatenated buffer, position i starts an n-gram of text t iff
    i lies in [offset_t, offset_t + len_t - n + 1).  Returns (seg_ids, valid)
    over all buffer positions (length = total bytes); invalid positions are
    boundary-crossing or out-of-text n-gram starts.
    """
    total = int(lengths.sum())
    seg_ids = np.repeat(np.arange(len(lengths)), lengths)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    pos_in_text = np.arange(total) - offsets[seg_ids]
    valid = pos_in_text < (lengths[seg_ids] - (n - 1))
    return seg_ids, valid


def trigram_hashes(buffer: np.ndarray, dim: int) -> np.ndarray:
    """Rolling polynomial hash of every byte trigram start position.

    h(b0,b1,b2) = ((b0*31 + b1)*31 + b2) mod dim — deterministic (no Python
    hash randomization), cheap, and stable across processes/executors.
    Output has length len(buffer); the final 2 positions are garbage and must
    be masked by the caller via ``ngram_positions(..., 3)``.
    """
    if len(buffer) < 3:
        return np.zeros(len(buffer), dtype=np.int64)
    b = buffer.astype(np.int64)
    h = np.zeros(len(b), dtype=np.int64)
    h[: -2] = (b[:-2] * 31 + b[1:-1]) * 31 + b[2:]
    return h % dim


def bigram_codes(buffer: np.ndarray) -> np.ndarray:
    """Exact 16-bit code of every byte bigram start position (last is junk)."""
    if len(buffer) < 2:
        return np.zeros(len(buffer), dtype=np.int64)
    b = buffer.astype(np.int64)
    c = np.zeros(len(b), dtype=np.int64)
    c[:-1] = b[:-1] * 256 + b[1:]
    return c


def segment_sums(
    values: np.ndarray, seg_ids: np.ndarray, valid: np.ndarray, n_segments: int
) -> np.ndarray:
    """Per-text sums of ``values`` over valid n-gram positions."""
    if len(values) == 0:
        return np.zeros(n_segments, dtype=np.float64)
    v = np.where(valid, values, 0.0)
    return np.bincount(seg_ids, weights=v, minlength=n_segments).astype(np.float64)


def segment_counts(lengths: np.ndarray, n: int) -> np.ndarray:
    """Number of n-grams per text: max(len - n + 1, 0)."""
    return np.maximum(lengths - (n - 1), 0)
