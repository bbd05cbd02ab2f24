"""Broadcast Bloom-filter semi-join reduction.

The 100 TB problem this solves: a semi join of a petabyte fact table
against a few million dim keys shuffles every fact row to the join —
including the vast majority that match nothing.  Spark's own runtime
row-filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects
exactly this pattern, but only for joins its heuristics recognise, and its
``bloom_filter_agg`` aggregate is not exposed to SQL/PySpark.  This module
is the explicit, composable version: build a Bloom bitmap over the small
side's keys with ONE distributed aggregation, embed it in the plan as a
constant-folded array literal, and pre-filter the big side scan-side —
inside whole-stage codegen, before any shuffle — so only probable matches
reach the exact join that removes false positives.

Everything stays JVM-side: ``xxhash64`` seeds the k probes, ``bit_or``
assembles 64-bit words, ``getbit`` tests them.  No Python touches a row.

The filter is one-sided correct by construction: no false negatives
(every true match passes), tunable false positives (cleaned up by the
exact join that follows).  The end result is therefore bit-identical to
the plain join — which is what lets the driver hash-check the composed
query against a plain-SQL oracle.

Sizing: ``num_bits`` ≈ n·k/ln2 for the classic optimum; the default
(2^16 bits, 5 hashes) holds ~9k keys at <1% fp and costs an 8 KiB plan
literal.  At cluster scale the bitmap rides the plan to every executor
once — the same distribution cost as a broadcast join's hash relation,
minus the relation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_WORD_BITS = 64


def build_bloom(df: DataFrame, key, num_bits: int = 1 << 16,
                num_hashes: int = 5) -> list[int]:
    """Aggregate a Bloom bitmap over ``df[key]`` and return it as
    ``num_bits / 64`` int64 words (driver-side, a few KiB).

    ``key`` is a column name or an arbitrary Column expression (composite
    keys hash as e.g. ``F.xxhash64("a", "b")`` — build and probe must use
    the same expression).

    One distributed pass: explode each key into its ``num_hashes`` bit
    positions, map-side-combine ``bit_or`` per word, collect the at most
    ``num_bits/64`` non-zero words.  NULL keys are skipped (SQL semantics:
    NULL never equi-joins, so it must not set bits)."""
    if num_bits % _WORD_BITS:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // _WORD_BITS
    kc = F.col(key) if isinstance(key, str) else key
    pos = F.explode(
        F.array(*[
            F.pmod(F.xxhash64(kc, F.lit(s)), F.lit(num_bits))
            for s in range(num_hashes)
        ])
    ).alias("pos")
    words = (
        df.filter(kc.isNotNull())
        .select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).cast("int").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * n_words
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def bits_for(n_keys: int, num_hashes: int = 5,
             lo: int = 1 << 14, hi: int = 1 << 20) -> int:
    """Bitmap size for ~<1% false positives at ``n_keys``: the next power
    of two >= 2·k·n (fp ≈ (1-e^(-kn/m))^k ≈ 0.9% at m = 2kn, k = 5),
    clamped so the plan literal stays between 2 KiB and 128 KiB.  Above
    the clamp the filter degrades gracefully (more false positives reach
    the exact join; never a wrong result)."""
    want = max(lo, min(hi, 2 * num_hashes * max(n_keys, 1)))
    return 1 << (want - 1).bit_length()


def might_contain(key: Column, words: list[int],
                  num_hashes: int = 5) -> Column:
    """Boolean Column: True iff ``key`` may be in the set the bitmap was
    built from (never False for a true member).  NULL keys test False.

    The words list becomes a foldable array expression that Catalyst
    constant-folds into a single array literal, so the per-row work is
    ``num_hashes`` × (hash, shift, getbit) in whole-stage codegen."""
    num_bits = len(words) * _WORD_BITS
    # explicit bigint elements: F.lit infers array<int> when every word
    # happens to fit 32 bits (e.g. an empty build side), and getbit on an
    # int rejects bit positions >= 32 at runtime
    bits = F.lit(words).cast("array<bigint>")
    cond = F.lit(True)
    for s in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(num_bits))
        word = F.get(bits, F.shiftright(pos, 6).cast("int"))
        cond = cond & (F.getbit(word, (pos.bitwiseAND(F.lit(63))).cast("int")) == 1)
    return key.isNotNull() & cond


def bloom_prefiltered_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """``big LEFT SEMI JOIN small ON key`` with a Bloom pre-filter on the
    big side.  Exact (the broadcast semi join removes false positives);
    the pre-filter just keeps non-candidates out of the join's input."""
    words = build_bloom(small.select(key), key, num_bits, num_hashes)
    return big.filter(might_contain(F.col(key), words, num_hashes)).join(
        F.broadcast(small.select(key).distinct()), on=key, how="left_semi"
    )
