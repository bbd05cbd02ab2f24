"""Needleman–Wunsch global alignment + paired-read consensus.

Re-implements, from scratch in numpy, moira's paired-end assembly path
(nw_align C extension + ``make_contig`` in moira.py [M], reconstructed from
public knowledge — /root/reference is empty, SURVEY.md §0, so parameter
defaults follow the published method, not verified source):

- global alignment with linear gap penalty (match/mismatch/gap scores);
- consensus ("posterior" mode): where the two reads agree, the consensus
  base keeps the higher quality (capped at ``qscore_cap``, agreement boosts
  confidence); where they disagree, the higher-quality base wins and its
  quality is penalized by the loser's (``deltaq`` gate drops hopeless
  disagreements to quality 2, the Illumina convention for "no confidence").

Used by the ``read_pair_assembly`` driver query and FIXTURES.md §5 tests.
"""

from __future__ import annotations

import numpy as np

MATCH = 2
MISMATCH = -1
GAP = -2
QSCORE_CAP = 40
DELTAQ = 6

_COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(seq: str) -> str:
    """Reverse complement (moira.py helper [M]): reverse + base-complement."""
    return seq.translate(_COMP)[::-1]


def nw_align(
    a: str, b: str, match: int = MATCH, mismatch: int = MISMATCH, gap: int = GAP
) -> tuple[str, str, int]:
    """Global alignment -> (aligned_a, aligned_b, score), '-' for gaps.

    Vectorized over the DP anti-diagonal rows (numpy per row); ties broken
    diag > up > left for determinism.
    """
    n, m = len(a), len(b)
    score = np.zeros((n + 1, m + 1), dtype=np.int64)
    score[0, :] = np.arange(m + 1) * gap
    score[:, 0] = np.arange(n + 1) * gap
    a_arr = np.frombuffer(a.encode(), dtype=np.uint8)
    b_arr = np.frombuffer(b.encode(), dtype=np.uint8)
    for i in range(1, n + 1):
        sub = np.where(b_arr == a_arr[i - 1], match, mismatch)
        diag = score[i - 1, :-1] + sub
        up = score[i - 1, 1:] + gap
        row = score[i]
        prev = row[0]
        best = np.maximum(diag, up)
        # left-dependency is sequential; loop the single row (m ops)
        for j in range(1, m + 1):
            prev = max(best[j - 1], prev + gap)
            row[j] = prev
    aligned_a, aligned_b = _traceback(a, b, score, match, mismatch, gap)
    return aligned_a, aligned_b, int(score[n, m])


def _traceback(
    a: str, b: str, score: np.ndarray, match: int, mismatch: int, gap: int
) -> tuple[str, str]:
    """Shared by the scalar and batch DP paths — same matrix, same tie-break
    order (diag > up > left), so the two paths cannot diverge."""
    out_a, out_b = [], []
    i, j = len(a), len(b)
    while i > 0 or j > 0:
        if i > 0 and j > 0:
            sub = match if a[i - 1] == b[j - 1] else mismatch
            if score[i, j] == score[i - 1, j - 1] + sub:
                out_a.append(a[i - 1])
                out_b.append(b[j - 1])
                i -= 1
                j -= 1
                continue
        if i > 0 and score[i, j] == score[i - 1, j] + gap:
            out_a.append(a[i - 1])
            out_b.append("-")
            i -= 1
        else:
            out_a.append("-")
            out_b.append(b[j - 1])
            j -= 1
    return "".join(reversed(out_a)), "".join(reversed(out_b))


def nw_align_batch(
    a_list, b_list, match: int = MATCH, mismatch: int = MISMATCH, gap: int = GAP
):
    """Batched global alignment: the DP recurrence runs once per CELL,
    vectorized across all pairs of the batch (the per-cell left-scan is
    sequential in j but a length-k numpy op over pairs), instead of once per
    pair.  Padding rows/columns beyond a pair's true lengths never influence
    cells inside its true region (DP dependencies only point to smaller
    indices), so each pair's matrix slice is bit-identical to the scalar
    path and the traceback is the SAME function — pytest-pinned parity.

    Returns list of (aligned_a, aligned_b, score).
    """
    k = len(a_list)
    if k == 0:
        return []
    N = max(len(a) for a in a_list)
    M = max(len(b) for b in b_list)
    A = np.zeros((k, max(N, 1)), dtype=np.uint8)
    B = np.zeros((k, max(M, 1)), dtype=np.uint8)
    for idx, s in enumerate(a_list):
        if s:
            A[idx, : len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
    for idx, s in enumerate(b_list):
        if s:
            B[idx, : len(s)] = np.frombuffer(s.encode(), dtype=np.uint8)
    score = np.zeros((k, N + 1, M + 1), dtype=np.int64)
    score[:, 0, :] = np.arange(M + 1) * gap
    score[:, :, 0] = np.arange(N + 1)[None, :] * gap
    for i in range(1, N + 1):
        sub = np.where(B == A[:, i - 1 : i], match, mismatch)  # (k, M)
        diag = score[:, i - 1, :-1] + sub
        up = score[:, i - 1, 1:] + gap
        best = np.maximum(diag, up)
        prev = score[:, i, 0].copy()
        row = score[:, i]
        for j in range(1, M + 1):
            prev = np.maximum(best[:, j - 1], prev + gap)
            row[:, j] = prev
    out = []
    for idx, (a, b) in enumerate(zip(a_list, b_list)):
        n, m = len(a), len(b)
        mat = score[idx, : n + 1, : m + 1]
        aligned_a, aligned_b = _traceback(a, b, mat, match, mismatch, gap)
        out.append((aligned_a, aligned_b, int(mat[n, m])))
    return out


# Cap on DP cells materialized at once by the batched aligner: bounds worker
# memory at ~128MB of int64 regardless of Arrow batch size or read length
# (10k pairs of 250-base reads would otherwise allocate ~5GB per worker).
_MAX_BATCH_CELLS = 16_000_000


def make_contig_batch(
    seqs_f, quals_f, seqs_r, quals_r,
    deltaq: int = DELTAQ,
    qscore_cap: int = QSCORE_CAP,
):
    """Batched paired-read assembly: vectorized NW DP over the Arrow batch in
    memory-bounded chunks (see _MAX_BATCH_CELLS), then the O(len) consensus
    walk per pair.  Identical outputs to make_contig pair-by-pair (shared
    DP + consensus code; chunk boundaries cannot affect per-pair results)."""
    k = len(seqs_f)
    if k == 0:
        return []
    rcs = [revcomp(s) for s in seqs_r]
    cells = (max(len(s) for s in seqs_f) + 1) * (max(len(s) for s in rcs) + 1)
    chunk = max(1, _MAX_BATCH_CELLS // max(cells, 1))
    aligned = []
    for lo in range(0, k, chunk):
        aligned.extend(nw_align_batch(list(seqs_f[lo : lo + chunk]), rcs[lo : lo + chunk]))
    return [
        _consensus(af, ar, list(qf), list(reversed(qr)), deltaq, qscore_cap)
        for (af, ar, _), qf, qr in zip(aligned, quals_f, quals_r)
    ]


def make_contig(
    seq_f: str,
    quals_f: list[int],
    seq_r: str,
    quals_r: list[int],
    deltaq: int = DELTAQ,
    qscore_cap: int = QSCORE_CAP,
) -> tuple[str, list[int]]:
    """Assemble a consensus from forward read + reverse read (given 5'->3');
    the reverse read is reverse-complemented before alignment (moira's
    paired flow [M])."""
    rc = revcomp(seq_r)
    rq = list(reversed(quals_r))
    aligned_f, aligned_r, _ = nw_align(seq_f, rc)
    return _consensus(aligned_f, aligned_r, quals_f, rq, deltaq, qscore_cap)


def _consensus(
    aligned_f: str,
    aligned_r: str,
    quals_f: list[int],
    rq: list[int],
    deltaq: int,
    qscore_cap: int,
) -> tuple[str, list[int]]:
    out_seq: list[str] = []
    out_q: list[int] = []
    fi = ri = 0
    for ca, cb in zip(aligned_f, aligned_r):
        if ca == "-":
            out_seq.append(cb)
            out_q.append(rq[ri])
            ri += 1
        elif cb == "-":
            out_seq.append(ca)
            out_q.append(quals_f[fi])
            fi += 1
        else:
            qa, qb = quals_f[fi], rq[ri]
            if ca == cb:
                out_seq.append(ca)
                out_q.append(min(qa + qb, qscore_cap))
            else:
                hi, lo = (ca, qa), (cb, qb)
                if qb > qa:
                    hi, lo = (cb, qb), (ca, qa)
                out_seq.append(hi[0])
                out_q.append(hi[1] - lo[1] if hi[1] - lo[1] >= deltaq else 2)
            fi += 1
            ri += 1
    return "".join(out_seq), out_q
