"""Poisson-binomial expected-error kernel — the semantic anchor to moira.

Re-implements, from scratch in numpy, the statistic at the heart of
fpusan/moira (Puente-Sánchez, Aguirre & Parro, NAR 44(4):e40, 2016;
bernoullimodule.c ``prob_j_errors`` / ``calculate_errors_PB`` [M],
reconstructed from the published method — /root/reference is empty, see
SURVEY.md §0):

Given per-base error probabilities p_i = 10^(-q_i/10) from Phred qualities,
the number of errors follows a Poisson-binomial distribution.  moira returns
the smallest j such that P(errors <= j) >= 1 - alpha, i.e. an upper
confidence bound on the error count, with an incremental early exit.

This kernel exists (a) to pin the transposition honestly — the perplexity
bound in ``kernels.lm`` is this bound re-expressed for text — and (b) as a
reusable quality statistic over any array<int> quality column.
"""

from __future__ import annotations

import numpy as np


def phred_to_prob(quals: np.ndarray) -> np.ndarray:
    """p_i = 10^(-q_i / 10)."""
    return np.power(10.0, -np.asarray(quals, dtype=np.float64) / 10.0)


def expected_errors_pb(quals, alpha: float = 0.005) -> float:
    """Upper confidence bound on error count at confidence 1 - alpha.

    Dynamic programme over P(#errors = j), extended one j at a time with an
    early exit once the CDF reaches 1 - alpha (moira's incremental trick).
    dp[j] after processing all n bases: P(exactly j errors among them),
    maintained incrementally via the standard Poisson-binomial recurrence.
    """
    p = phred_to_prob(np.asarray(quals))
    n = len(p)
    if n == 0:
        return 0.0
    q = 1.0 - p
    # dp over error counts; build the full distribution column-by-column in
    # vectorized numpy (row = error count), early-exit on the CDF.
    dp = np.zeros(n + 1, dtype=np.float64)
    dp[0] = 1.0
    for i in range(n):
        dp[1 : i + 2] = dp[1 : i + 2] * q[i] + dp[0 : i + 1] * p[i]
        dp[0] *= q[i]
    cdf = np.cumsum(dp)
    target = 1.0 - alpha
    j = int(np.searchsorted(cdf, target - 1e-12))
    return float(min(j, n))


def expected_errors_pb_batch(quals_list, alpha: float = 0.005) -> np.ndarray:
    """Vectorized expected_errors_pb over a batch of reads.

    Reads are padded to the batch max length with p=0 positions, which are
    exact no-ops in the recurrence (dp*1.0 + prev*0.0), so every read's full
    error distribution is bit-identical to the scalar path; the DP then runs
    as one (n_reads x max_len+1) matrix updated column-by-column — the hot
    loop is O(max_len) numpy slice ops instead of O(n_reads * len) Python.
    """
    n_reads = len(quals_list)
    if n_reads == 0:
        return np.zeros(0, dtype=np.float64)
    lens = np.array([len(q) for q in quals_list], dtype=np.int64)
    max_len = int(lens.max())
    if max_len == 0:
        return np.zeros(n_reads, dtype=np.float64)
    p = np.zeros((n_reads, max_len), dtype=np.float64)
    for r, quals in enumerate(quals_list):
        if len(quals):
            p[r, : len(quals)] = phred_to_prob(np.asarray(quals))
    q = 1.0 - p
    dp = np.zeros((n_reads, max_len + 1), dtype=np.float64)
    dp[:, 0] = 1.0
    for i in range(max_len):
        qi = q[:, i : i + 1]
        pi = p[:, i : i + 1]
        dp[:, 1 : i + 2] = dp[:, 1 : i + 2] * qi + dp[:, 0 : i + 1] * pi
        dp[:, 0] *= qi[:, 0]
    cdf = np.cumsum(dp, axis=1)
    target = 1.0 - alpha - 1e-12
    # per-read searchsorted: count of cdf entries strictly below target
    j = (cdf < target).sum(axis=1)
    return np.minimum(j, lens).astype(np.float64)


def expected_errors_poisson(quals, alpha: float = 0.005) -> float:
    """Poisson approximation (moira --error_calc poisson): lambda = sum p_i,
    bound = smallest j with PoissonCDF(j; lambda) >= 1 - alpha."""
    p = phred_to_prob(np.asarray(quals))
    lam = float(p.sum())
    if lam == 0.0:
        return 0.0
    target = 1.0 - alpha
    term = np.exp(-lam)
    cdf = term
    j = 0
    while cdf < target and j < 10_000:
        j += 1
        term *= lam / j
        cdf += term
    return float(j)


def sum_expected_errors(quals) -> float:
    """Plain expectation sum(p_i) — USEARCH-maxee-style, moira's lambda."""
    return float(phred_to_prob(np.asarray(quals)).sum())


def expected_errors_bootstrap(
    quals, alpha: float = 0.005, n_boot: int = 200, seed: int = 0
) -> float:
    """moira's --error_calc bootstrap mode (Monte-Carlo per-base Bernoulli
    sampling), made DETERMINISTIC: the RNG seed is an explicit argument the
    caller derives from the record's identity, so the estimate is a pure
    function of (quals, alpha, n_boot, seed) — identical under any
    partitioning or cluster size, which is what lets this mode live under
    the exact-match gate instead of being excluded.

    Returns the ceil-interpolated (1-alpha) quantile of the bootstrap error
    counts — the Monte-Carlo estimate of the same upper confidence bound the
    exact Poisson-binomial DP computes.
    """
    p = phred_to_prob(np.asarray(quals, dtype=np.float64))
    n = len(p)
    if n == 0:
        return 0.0
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    draws = rng.random_sample((n_boot, n)) < p
    counts = np.sort(draws.sum(axis=1))
    idx = min(n_boot - 1, int(np.ceil((1.0 - alpha) * n_boot)) - 1)
    return float(counts[max(idx, 0)])
