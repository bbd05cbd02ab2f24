"""Hierarchical prefix sum (operators/prefix.py) vs the window form.

The operator's contract is bit-identical output to
``SUM(v) OVER (PARTITION BY g ORDER BY k ROWS UNBOUNDED PRECEDING)``
whenever k is unique per group — with NO single-partition exchange.  These
tests pin equivalence on adversarial shapes (hot groups, sparse ids, empty
partitions, more partitions than rows) and partitioning invariance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from moira_spark.operators.prefix import running_rank, running_sum


def _window_cumsum(df, value, order, group=()):
    w = (
        Window.partitionBy(*group)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("cum", F.sum(value).over(w))


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("nparts", [1, 3, 16, 64])
def test_global_cumsum_matches_window(spark, nparts):
    data = [(i * 7 % 101, (i % 13) + 1) for i in range(101)]  # permuted ids
    df = spark.createDataFrame(data, "id long, v long").repartition(5)
    got = running_sum(
        df, "v", order_cols=["id"], out_col="cum", num_partitions=nparts
    )
    want = _window_cumsum(df, "v", ["id"])
    assert _rows(got, "id", "v", "cum") == _rows(want, "id", "v", "cum")


def test_grouped_cumsum_matches_window_with_hot_group(spark):
    # 'en' holds 90% of rows — the exact skew shape the operator exists for.
    data = [("en" if i % 10 else "de", i, i % 5) for i in range(400)]
    df = spark.createDataFrame(data, "lang string, id long, v long")
    got = running_sum(
        df, "v", order_cols=["id"], group_cols=["lang"], out_col="cum",
        num_partitions=8,
    )
    want = _window_cumsum(df, "v", ["id"], ["lang"])
    assert _rows(got, "lang", "id", "cum") == _rows(want, "lang", "id", "cum")


def test_running_rank_matches_row_number(spark):
    data = [(("a", "b", "c")[i % 3], 1000 - i) for i in range(250)]
    df = spark.createDataFrame(data, "g string, id long")
    got = running_rank(
        df, order_cols=["id"], group_cols=["g"], out_col="rk", num_partitions=7
    )
    w = Window.partitionBy("g").orderBy("id")
    want = df.withColumn("rk", F.row_number().over(w))
    assert _rows(got, "g", "id", "rk") == _rows(want, "g", "id", "rk")


def test_partitioning_invariance(spark):
    # Same answer whatever the input partitioning and the operator fan-out.
    data = [(i, i % 7) for i in range(300)]
    base = None
    for in_parts, op_parts in ((1, 2), (13, 13), (40, 64)):
        df = spark.createDataFrame(data, "id long, v long").repartition(in_parts)
        got = _rows(
            running_sum(df, "v", ["id"], out_col="cum", num_partitions=op_parts),
            "id",
            "cum",
        )
        if base is None:
            base = got
        assert got == base


def test_zero_and_empty(spark):
    # Leading zero values and an empty frame must not break offsets.
    df = spark.createDataFrame([(0, 0), (1, 0), (2, 5)], "id long, v long")
    got = dict(
        (r.id, r.cum)
        for r in running_sum(df, "v", ["id"], out_col="cum").collect()
    )
    assert got == {0: 0, 1: 0, 2: 5}
    empty = spark.createDataFrame([], "id long, v long")
    assert running_sum(empty, "v", ["id"], out_col="cum").count() == 0


def test_no_single_partition_exchange_in_plan(spark):
    df = spark.createDataFrame([(i, 1) for i in range(50)], "id long, v long")
    out = running_sum(df, "v", ["id"], out_col="cum", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_null_group_keys_survive_and_match_window(spark):
    # A NULL lang stratum must neither crash the driver-side sort nor be
    # dropped by the offsets join (NULL != NULL in plain join semantics).
    data = [(None if i % 5 == 0 else ("en" if i % 2 else "de"), i, 1)
            for i in range(60)]
    df = spark.createDataFrame(data, "lang string, id long, v long")
    got = running_sum(
        df, "v", order_cols=["id"], group_cols=["lang"], out_col="cum",
        num_partitions=6,
    )
    want = _window_cumsum(df, "v", ["id"], ["lang"])

    def rows(frame):
        return sorted(
            (tuple(r) for r in frame.select("lang", "id", "cum").collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    assert rows(got) == rows(want)


def test_double_valued_running_sum(spark):
    # The offsets column inherits SUM's result type — double values must
    # round-trip (previously the bigint-hardcoded schema rejected floats).
    data = [(i, 0.5 + (i % 3) * 0.25) for i in range(40)]
    df = spark.createDataFrame(data, "id long, v double")
    got = running_sum(df, "v", ["id"], out_col="cum", num_partitions=5)
    want = _window_cumsum(df, "v", ["id"])
    a = {r.id: round(r.cum, 9) for r in got.collect()}
    b = {r.id: round(r.cum, 9) for r in want.collect()}
    assert a == b


@pytest.mark.parametrize("n,b", [(7, 3), (64, 8), (500, 8), (501, 8), (5, 9)])
def test_running_ntile_matches_window_ntile(spark, n, b):
    # bit-identical to NTILE(b) OVER (ORDER BY key, id) — including the
    # ceil/floor split when b does not divide n, and b > n
    from moira_spark.operators.prefix import running_ntile

    data = [(i, (i * 37) % 11) for i in range(n)]
    df = spark.createDataFrame(data, "id long, key long")
    got = {
        r.id: r.bucket
        for r in running_ntile(df, b, ["key", "id"], num_partitions=4).collect()
    }
    w = Window.orderBy("key", "id")
    want = {
        r.id: r.nt
        for r in df.withColumn("nt", F.ntile(b).over(w)).collect()
    }
    assert got == want
