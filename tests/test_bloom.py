"""Bloom-filter semi-join reduction (operators/bloom.py): membership
guarantees, pruning power, NULL semantics, and plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from moira_spark.operators.bloom import (
    bloom_prefiltered_semi_join,
    build_bloom,
    might_contain,
)


@pytest.fixture(scope="module")
def keys(spark):
    # members: multiples of 7 in [0, 7000); probes: all of [0, 7000)
    members = spark.range(0, 7000, 7).toDF("k")
    probes = spark.range(0, 7000).toDF("k")
    return members, probes


class TestBitmap:
    def test_no_false_negatives(self, spark, keys):
        members, _ = keys
        words = build_bloom(members, "k")
        missed = members.filter(~might_contain(F.col("k"), words)).count()
        assert missed == 0

    def test_false_positive_rate_bounded(self, spark, keys):
        members, probes = keys
        words = build_bloom(members, "k")  # 1000 keys in 2^16 bits, k=5
        non_members = probes.join(members, "k", "left_anti")
        n = non_members.count()
        fp = non_members.filter(might_contain(F.col("k"), words)).count()
        # theoretical fp ~ (1 - e^(-kn/m))^k ≈ 2.2e-6 here; allow slack
        assert fp / n < 0.01, f"fp rate {fp}/{n}"

    def test_null_keys_neither_set_bits_nor_match(self, spark):
        src = spark.createDataFrame([(1,), (None,)], "k bigint")
        words = build_bloom(src, "k")
        got = src.select(
            might_contain(F.col("k"), words).alias("hit")
        ).collect()
        by_key = {r["hit"] for r in got}
        assert by_key == {True, False}  # 1 hits, NULL does not

    def test_bitmap_size_and_dtype(self, spark, keys):
        members, _ = keys
        words = build_bloom(members, "k", num_bits=1 << 12)
        assert len(words) == (1 << 12) // 64
        assert all(isinstance(w, int) for w in words)
        with pytest.raises(ValueError, match="multiple of 64"):
            build_bloom(members, "k", num_bits=100)


class TestSemiJoin:
    def test_equals_plain_semi_join(self, spark, keys):
        members, probes = keys
        big = probes.withColumn("v", F.col("k") * 3)
        got = bloom_prefiltered_semi_join(big, members, "k")
        want = big.join(members, "k", "left_semi")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_probe_stays_jvm_side(self, spark, keys):
        members, probes = keys
        words = build_bloom(members, "k")
        plan = (
            probes.filter(might_contain(F.col("k"), words))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan  # no Python in the hot path
        assert "*(1) Filter" in plan  # probe runs inside codegen stage 1
        assert "getbit(" in plan  # bitmap folded into the filter itself


class TestIncrementalDedupBloom:
    """history_bloom in incremental_flags: flags identical with the bloom
    on or off (the equi-joins remove false positives), and the history
    scans carry the folded bitmap probe."""

    def _fixtures(self, spark):
        from moira_spark.harness import dedup

        docs = spark.createDataFrame(
            [
                (i, f"alpha bravo charlie delta echo foxtrot golf {i % 40}")
                for i in range(200)
            ],
            "doc_id long, text string",
        )
        committed = dedup._with_signatures(docs).select(
            "doc_id", "text", "fingerprint", "mh"
        )
        # batch: 5 exact copies of history, 5 fresh docs
        batch_src = spark.createDataFrame(
            [(1000 + i, f"alpha bravo charlie delta echo foxtrot golf {i % 40}")
             for i in range(5)]
            + [(2000 + i, f"november oscar papa quebec romeo sierra {i}")
               for i in range(5)],
            "doc_id long, text string",
        )
        batch = dedup._with_signatures(batch_src).select(
            "doc_id", "s", "fingerprint", "mh"
        )
        return dedup, batch, committed

    def test_flags_identical_with_and_without_bloom(self, spark):
        dedup, batch, committed = self._fixtures(spark)
        on = {
            r["doc_id"]: (r["dup_exact"], r["dup_near"], r["survives"])
            for r in dedup.incremental_flags(
                batch, committed, history_bloom=True
            ).collect()
        }
        off = {
            r["doc_id"]: (r["dup_exact"], r["dup_near"], r["survives"])
            for r in dedup.incremental_flags(
                batch, committed, history_bloom=False
            ).collect()
        }
        assert on == off
        assert all(on[1000 + i][0] for i in range(5))  # copies flagged
        # fresh docs are near-dups of each other (only the trailing token
        # differs): none is an exact dup, min-id wins, the rest flag near
        assert not any(on[2000 + i][0] for i in range(5))
        assert on[2000][2] and all(on[2000 + i][1] for i in range(1, 5))

    def test_history_scan_carries_the_bitmap_probe(self, spark):
        dedup, batch, committed = self._fixtures(spark)
        plan = (
            dedup.incremental_flags(batch, committed, history_bloom=True)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert plan.count("getbit(") >= 2  # band-key AND fingerprint probes


def test_empty_build_side_matches_nothing_without_crashing(spark):
    # an all-zero bitmap once inferred array<int> and getbit(int, 51) threw
    # BIT_POSITION_RANGE at runtime; the cast to array<bigint> pins the fix
    empty = spark.createDataFrame([], "k bigint")
    words = build_bloom(empty, "k")
    probes = spark.range(100).toDF("k")
    assert probes.filter(might_contain(F.col("k"), words)).count() == 0
