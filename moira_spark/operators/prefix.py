"""Distributed running aggregates without a global-order window.

``Window.orderBy(k)`` with no ``partitionBy`` is the classic Spark scale
trap: the plan inserts ``Exchange SinglePartition`` and the ENTIRE input
serializes through one reducer (Spark even logs "No Partition Defined for
Window operation! Moving all data to a single partition").  Fine at sf0.1,
fatal at 10^12 rows.  ``Window.partitionBy(g).orderBy(k)`` has the same
problem per group when a group is hot (the English stratum of a training
mix IS most of the corpus).

This module computes the same running sums hierarchically, the textbook
two-phase parallel prefix sum (Blelloch, "Prefix Sums and Their
Applications", CMU-CS-90-190):

1. range-repartition the input on (group, order) so each partition holds a
   contiguous, disjoint key range (partition i's keys all sort before
   partition i+1's);
2. one map-side aggregate produces per-(partition, group) totals — at most
   ``n_partitions + n_groups`` tiny rows regardless of input size;
3. the driver computes exclusive prefix offsets over those totals (a few
   thousand rows even on a 100k-partition cluster) and broadcast-joins them
   back;
4. a window partitioned by (physical partition, group) — balanced by
   construction — adds the local running sum to the offset.

The output is bit-identical to the single-reducer window whenever the
order key is unique within each group (ties across partition boundaries
would otherwise be resolved by physical placement; callers here order by
unique ids).  The plan contains NO ``Exchange SinglePartition`` —
tests/test_plans.py pins that property.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

_PID = "__prefix_pid"
_OFF = "__prefix_off"


def running_sum(
    df: DataFrame,
    value_col,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` over ``order_cols`` (per ``group_cols``
    if given), equivalent to

        SUM(value) OVER (PARTITION BY group ORDER BY order
                         ROWS UNBOUNDED PRECEDING)

    but computed with the hierarchical two-phase prefix sum above, so no
    single-partition exchange ever appears in the plan.

    ``value_col`` may be a column name or Column expression.  ``order_cols``
    must be unique per group (ascending order assumed) for bit-identical
    equivalence with the window form.

    The returned frame keeps every input column plus ``out_col``.  The
    intermediate range-partitioned frame is localCheckpoint-ed, NOT
    persist/unpersist-ed, and that choice is load-bearing: the collected
    offsets are only valid for the exact partition placement they were
    computed under, and RangePartitioner's reservoir sampling is seeded by
    the runtime RDD id — recomputation after a cache eviction could draw
    different range bounds and silently shift boundary rows onto partitions
    whose offsets don't include them.  Checkpointing materializes the
    placement once and truncates lineage so the final pass can never
    re-sample (see the inline comment below); do not "simplify" this back
    to persist().
    """
    spark = df.sparkSession
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    group_cols = list(group_cols)
    order_cols = list(order_cols)
    keys = [*group_cols, *order_cols]
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # localCheckpoint (NOT persist + unpersist): the offsets below are only
    # valid for the exact partition placement they were computed under, and
    # RangePartitioner's reservoir sampling is seeded by the runtime RDD id
    # — a recomputation after cache eviction could draw different bounds,
    # silently shifting boundary rows onto partitions whose offsets don't
    # include them.  Checkpointing materializes the placement once and
    # truncates lineage, so the final pass can never re-sample; blocks are
    # freed by the ContextCleaner when the frame is garbage collected.
    ranged = (
        df.withColumn("__prefix_val", value)
        .repartitionByRange(n, *[F.col(c) for c in keys])
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = (
        ranged.groupBy(_PID, *group_cols)
        .agg(F.sum("__prefix_val").alias("__tot"))
        .collect()
    )
    # Exclusive prefix per group over partition ids.  Range partitioning
    # guarantees pid order == key order, so summing totals of lower pids
    # (same group) gives exactly the amount that precedes this partition.
    # NULL group keys sort first via the (is-null, value) key — matching
    # the NULLS FIRST placement of the range partitioning.
    totals.sort(
        key=lambda r: (
            [(r[c] is None, r[c]) for c in group_cols],
            r[_PID],
        )
    )
    # Offsets inherit the type Spark's own SUM produced for the value (sum
    # of int -> bigint, double -> double, decimal -> widened decimal), so a
    # non-integral value_col round-trips through createDataFrame exactly;
    # the running accumulator starts from the matching Python zero.
    sum_type = (
        df.select(F.sum(value).alias("__t")).schema[0].dataType.simpleString()
    )
    if sum_type in ("double", "float"):
        zero: object = 0.0
    elif sum_type.startswith("decimal"):
        from decimal import Decimal

        zero = Decimal(0)
    else:
        zero = 0
    offsets, acc, cur_group = [], zero, object()
    for r in totals:
        g = tuple(r[c] for c in group_cols)
        if g != cur_group:
            cur_group, acc = g, zero
        offsets.append((*g, r[_PID], acc))
        acc += r["__tot"] if r["__tot"] is not None else zero
    off_schema = ", ".join(
        [f"`{c}` {t}" for c, t in zip(group_cols, _types_of(df, group_cols))]
        + [f"{_PID} int", f"{_OFF} {sum_type}"]
    )
    off_df = spark.createDataFrame(offsets, schema=off_schema)

    # Null-safe equi-join on the group columns: a plain column-list join
    # would drop every NULL-group row (NULL != NULL in join semantics),
    # whereas the window form this operator replaces keeps them.
    w = Window.partitionBy(_PID, *group_cols).orderBy(
        *[F.col(c) for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranged.join(F.broadcast(off_df.withColumnsRenamed(
            {c: f"__off_{c}" for c in group_cols}
        ).withColumnRenamed(_PID, "__off_pid")),
            (ranged[_PID] == F.col("__off_pid"))
            & _null_safe_all(ranged, group_cols),
        )
        .withColumn(out_col, F.sum("__prefix_val").over(w) + F.col(_OFF))
        .drop(
            _PID, _OFF, "__prefix_val", "__off_pid",
            *[f"__off_{c}" for c in group_cols],
        )
    )


def _null_safe_all(left: DataFrame, group_cols: Sequence[str]):
    cond = F.lit(True)
    for c in group_cols:
        cond = cond & left[c].eqNullSafe(F.col(f"__off_{c}"))
    return cond


def running_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """ROW_NUMBER() OVER (PARTITION BY group ORDER BY order) without a
    hot-group single-reducer window: a running sum of the constant 1."""
    return running_sum(
        df,
        F.lit(1).cast("bigint"),
        order_cols,
        group_cols,
        out_col=out_col,
        num_partitions=num_partitions,
    )


def running_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: Sequence[str],
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order)`` without the single-reducer
    global-order window, bit-identical to the SQL function whenever the
    order key is unique (callers append a unique id).

    NTILE is a closed form of the global row number: with ``n`` rows and
    ``B`` buckets the first ``n mod B`` buckets hold ``ceil(n/B)`` rows
    and the rest ``floor(n/B)`` — so one distributed rank
    (``running_rank`` above) plus one scalar count reproduces it.  All
    bucket math is integer (floats misplace boundary ranks once
    ``rank * B`` leaves double's exact range)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    n = df.count()
    ranked = running_rank(
        df, order_cols, out_col="__ntile_rk", num_partitions=num_partitions
    )
    q, rmd = divmod(n, n_buckets)
    cut = rmd * (q + 1)  # last rank served by a ceil-sized bucket
    return ranked.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN __ntile_rk <= {cut} "
            f"THEN (__ntile_rk - 1) div {q + 1} + 1 "
            f"ELSE {rmd} + (__ntile_rk - {cut} - 1) div {max(q, 1)} + 1 END"
        ),
    ).drop("__ntile_rk")


def _types_of(df: DataFrame, cols: Sequence[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[c] for c in cols]
