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
