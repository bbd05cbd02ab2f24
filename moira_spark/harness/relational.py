"""Relational operator coverage (SURVEY.md §2.2 #13): filter, aggregation,
multi-way broadcast joins, group-by-having, windows, sessionization, top-k.

These exercise the DuckDB-oracle path over the driver-provided TPC-H-ish
tables.  Every aggregate follows the decimal/integerize conventions from
``moira_spark.harness`` so both engines produce bit-identical values.
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from moira_spark.harness import load, register


def _dec(col, scale=2):
    return F.col(col).cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------- Q1-ish
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    flt = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    agg = flt.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(
            _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("sum_disc_price"),
        F.round(
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_qty"),
        F.round(
            F.sum(_dec("l_discount", 4)).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg


# --------------------------------------------------------------------- Q3-ish
@register(
    "q3_top_orders",
    """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY ROUND(revenue, 2) DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # customer is the small side -> broadcast; lineitem stays the probe side.
    joined = li.join(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner"),
        li.l_orderkey == o.o_orderkey,
        "inner",
    )
    rev = joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.sum(
            _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        rev.orderBy(F.round("revenue", 2).desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# --------------------------------------------------------------------- Q5-ish
@register(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dims are tiny: broadcast nation+region onto supplier, then broadcast
    # the enriched supplier; the fact-fact join (lineitem x orders) shuffles.
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(sn),
            (li.l_suppkey == sn.s_suppkey) & (c.c_nationkey == sn.s_nationkey),
        )
    )
    return j.groupBy("n_name").agg(
        F.sum(
            _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("revenue")
    )


# ------------------------------------------------- group-by-having (conv analog)
@register(
    "top_customers_having",
    """
    SELECT c.c_custkey, c.c_name, t.n_orders, t.total_price
    FROM (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    ) t JOIN customer c ON c.c_custkey = t.o_custkey
    """,
)
def top_customers_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conversation-verdict analog: group, threshold, join back."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    t = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .filter(F.col("n_orders") >= 15)
    )
    return t.join(F.broadcast(c), t.o_custkey == c.c_custkey).select(
        "c_custkey", "c_name", "n_orders", "total_price"
    )


# ----------------------------------------------------------- window: first row
@register(
    "first_event_per_user",
    """
    SELECT user_id, event_id, event_type, ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


# -------------------------------------------------------- window: top-k per key
@register(
    "top3_events_per_user",
    """
    SELECT user_id, event_id, value_m
    FROM (
      SELECT user_id, event_id,
             CAST(ROUND(value * 1000) AS BIGINT) AS value_m,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ROUND(value * 1000) AS BIGINT) DESC,
                                         event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def top3_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "value_m", F.round(F.col("value") * 1000).cast("bigint")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("value_m").desc(), F.col("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value_m")
    )


# ------------------------------------------------------------- sessionization
@register(
    "sessionize_events",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ) GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # microsecond precision on both engines (a bare cast-to-long truncates
    # sub-second gaps and would disagree with DuckDB's INTERVAL comparison)
    # parquet gives TIMESTAMP_NTZ; cast both sides to TIMESTAMP (the session
    # -TZ shift cancels in the difference) so unix_micros applies.
    new_session = F.when(
        prev.isNull()
        | (
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
            )
            > 1800 * 1_000_000
        ),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("new_session").cast("bigint").alias("n_sessions"),
        )
    )


# ------------------------------------------------------------------ global topk
@register(
    "topk_events_global",
    """
    SELECT event_id, user_id, event_type,
           CAST(ROUND(value * 1000) AS BIGINT) AS value_m
    FROM events
    ORDER BY value_m DESC, event_id
    LIMIT 20
    """,
)
def topk_events_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "value_m", F.round(F.col("value") * 1000).cast("bigint")
    )
    return (
        e.orderBy(F.col("value_m").desc(), F.col("event_id"))
        .limit(20)
        .select("event_id", "user_id", "event_type", "value_m")
    )


# ---------------------------------------------------------- anti / semi joins
@register(
    "customers_without_big_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "suppliers_with_lineitems",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
    """,
)
def suppliers_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


# -------------------------------------------------------------- date buckets
@register(
    "orders_by_month",
    """
    SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM"))
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
    )


# --------------------------------------------------------------------- cube
@register(
    "lineitem_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


# -------------------------------------------------------------- percentiles
@register(
    "value_percentiles_by_type",
    """
    SELECT event_type,
           ROUND(QUANTILE_CONT(value, 0.5), 6) AS p50,
           ROUND(QUANTILE_CONT(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
    """,
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark percentile() and DuckDB
    QUANTILE_CONT share the linear-interpolation definition."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


# ---------------------------------------------------------------- JSON props
@register(
    "events_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


# -------------------------------------------------------------------- rollup
@register(
    "events_rollup",
    """
    SELECT event_type,
           CAST(user_id % 4 AS BIGINT) AS user_band,
           COUNT(*) AS n
    FROM events
    GROUP BY ROLLUP(event_type, CAST(user_id % 4 AS BIGINT))
    """,
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn(
        "user_band", (F.col("user_id") % 4).cast("bigint")
    )
    return e.rollup("event_type", "user_band").agg(
        F.count(F.lit(1)).alias("n")
    )


# ------------------------------------------------------------ set operations
@register(
    "heavy_buyers_minus_heavy_errorers",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING COUNT(*) >= 15
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    GROUP BY user_id HAVING COUNT(*) >= 15
    """,
)
def heavy_buyers_minus_heavy_errorers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")

    def heavy(kind):
        return (
            e.filter(F.col("event_type") == kind)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 15)
            .select("user_id")
        )

    # subtract == EXCEPT DISTINCT (exceptAll would keep surplus duplicates)
    return heavy("purchase").subtract(heavy("error"))


# ------------------------------------------------------------- grouped counts
@register(
    "event_type_stats",
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_m
    FROM events GROUP BY event_type
    """,
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 1000).cast("bigint"))
        .cast("bigint")
        .alias("sum_value_m"),
    )


# ------------------------------------------------- approximate sketch tier
@register("events_approx_distinct", None)  # HLL values are engine-specific
def events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type, with the
    exact count alongside and the relative error ASSERTED in-query.

    The sketch tier a 100 TB pipeline actually uses: COUNT(DISTINCT) over
    10^12 rows shuffles every distinct value; approx_count_distinct merges
    fixed-size HLL sketches map-side (one pass, no distinct shuffle).  HLL
    estimates are engine- and rsd-specific so there is no DuckDB hash
    oracle; instead the query computes the exact answer too (driver-scale
    data makes that cheap) and raises if any relative error exceeds 3x the
    configured rsd=0.02 — a self-verifying approximation.
    """
    e = load(spark, sf_dir, "events")
    out = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ),
        )
        .orderBy("event_type")
    )
    pdf = out.toPandas()
    if (pdf.rel_err > 0.06).any():
        raise RuntimeError(
            "HLL relative error exceeded 3x rsd:\n" + pdf.to_string()
        )
    return spark.createDataFrame(
        pdf,
        schema=(
            "event_type string, approx_users long, exact_users long, "
            "rel_err double"
        ),
    )


@register("events_approx_quantiles", None)  # sketch values engine-specific
def events_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) percentiles of the event
    value column, accuracy asserted in-query.

    Exact percentiles need a full sort per group; the GK sketch is a
    bounded-size mergeable summary — the only viable shape at 10^12 rows.
    accuracy=10000 bounds RANK error at ~1e-4; the query re-derives the
    actual rank of each returned value and raises if it deviates from the
    target quantile by more than 0.01, making the approximation
    self-verifying without an engine-specific oracle (a VALUE bound would
    be wrong: adjacent ranks in a sparse tail can be far apart).
    """
    e = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value"), 3).alias("v")
    )
    qs = [0.5, 0.9, 0.99]
    approx = e.groupBy("event_type").agg(
        F.percentile_approx("v", qs, 10000).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    # The GK guarantee is on RANK, not value (a sparse tail can put a large
    # value gap between adjacent ranks), so verify what the sketch promises:
    # the fraction of rows <= the returned value must sit within eps of q.
    ranked = (
        e.join(F.broadcast(approx), "event_type")
        .groupBy("event_type", "n", "ap")
        .agg(
            *[
                F.sum(
                    F.when(
                        F.col("v") <= F.element_at("ap", i + 1), 1
                    ).otherwise(0)
                ).alias(f"le_{i}")
                for i in range(len(qs))
            ]
        )
    )
    out = ranked.select(
        "event_type",
        *[
            F.round(F.element_at("ap", i + 1), 3).alias(f"p{int(q * 100)}")
            for i, q in enumerate(qs)
        ],
        *[
            F.round(
                F.abs(F.col(f"le_{i}") / F.col("n") - F.lit(q)), 6
            ).alias(f"rank_err_p{int(q * 100)}")
            for i, q in enumerate(qs)
        ],
    ).orderBy("event_type")
    pdf = out.toPandas()
    err_cols = [c for c in pdf.columns if c.startswith("rank_err")]
    if (pdf[err_cols] > 0.01).any().any():
        raise RuntimeError(
            "GK sketch rank error exceeded the 0.01 bound:\n" + pdf.to_string()
        )
    return spark.createDataFrame(
        pdf,
        schema=(
            "event_type string, p50 double, p90 double, p99 double, "
            "rank_err_p50 double, rank_err_p90 double, rank_err_p99 double"
        ),
    )


# ------------------------------------------------------------- as-of join
@register(
    "events_asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    errors AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
    ),
    best AS (
      SELECT e.event_id AS error_id, MAX(c.ts) AS cts
      FROM errors e JOIN clicks c
        ON e.user_id = c.user_id AND c.ts <= e.ts
      GROUP BY e.event_id
    ),
    pick AS (
      SELECT b.error_id, b.cts, MAX(c.event_id) AS click_id
      FROM best b
      JOIN errors e ON e.event_id = b.error_id
      JOIN clicks c ON c.user_id = e.user_id AND c.ts = b.cts
      GROUP BY b.error_id, b.cts
    )
    SELECT e.event_id AS error_id,
           e.user_id,
           COALESCE(p.click_id, -1) AS click_id,
           COALESCE(EPOCH_US(e.ts) - EPOCH_US(p.cts), -1) AS gap_us
    FROM errors e
    LEFT JOIN pick p ON e.event_id = p.error_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time AS-OF join — attribute every 'error' event to the same
    user's most recent 'click' at or before it (last-interaction
    attribution), an operator Spark lacks natively; the DuckDB oracle
    verifies it with an independent two-step formulation (max click ts per
    error via the range join, then max event_id among that-ts clicks).
    Rounds 1-4 used DuckDB's native ASOF LEFT JOIN, but ASOF's pick among
    same-(user_id, ts) clicks is arbitrary, as is F.last over a window
    ordered only by (ts, is_click) — both sides are now total-ordered on
    (ts, is_click, event_id) so attribution is deterministic (ADVICE r4).

    Spark side uses the merge-tag formulation, the shape that survives
    10^12 events: tag clicks and errors, UNION them, one window pass per
    user ordered by (ts, is_click DESC) carrying last-click state forward
    (same-ts clicks sort before errors, matching ASOF's >= bound).  ONE
    shuffle on user_id and a linear scan per user — never the
    range-predicate join (a theta-join on ts >= ts explodes to
    |errors| x |clicks| per user before the greatest-ts filter).
    NULL-free output (-1 sentinels) keeps both engines' pandas dtypes
    int64, out of float-promotion territory.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    tagged = ev.filter(F.col("event_type").isin("click", "error")).withColumn(
        "is_click", (F.col("event_type") == "click").cast("int")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(), F.col("is_click").desc(), F.col("event_id").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("is_click") == 1, F.struct("ts", "event_id")),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.withColumn("lc", last_click)
        .filter(F.col("is_click") == 0)
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.coalesce(F.col("lc.event_id"), F.lit(-1)).alias("click_id"),
            # the parquet ts is TIMESTAMP_NTZ, which unix_micros rejects;
            # casting to TIMESTAMP is a pure reinterpretation because the
            # session timezone is pinned to UTC (session.py), and the
            # difference is tz-invariant regardless
            F.coalesce(
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("lc.ts").cast("timestamp")),
                F.lit(-1),
            ).alias("gap_us"),
        )
    )


# ------------------------------------------------ funnel analysis
@register(
    "events_funnel",
    """
    WITH v AS (
      SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, CAST(MIN(epoch_us(e.ts)) AS BIGINT) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, CAST(MIN(epoch_us(e.ts)) AS BIGINT) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                AS INT) AS depth
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase) per user:
    stage k's timestamp is the EARLIEST event of that type strictly after
    stage k-1 — the sequential-pattern query behind every product-analytics
    funnel (and, in a data pipeline, behind "did doc X pass stage A before
    stage B" provenance checks).  Output: per-user stage times (unix
    micros; the TIMESTAMP_NTZ -> session-UTC cast convention of
    sessionize_events) and funnel depth 1-3.

    Scale shape: three conditional MIN aggregations and their join-backs,
    ALL keyed on user_id — one logical shuffle key end to end, so AQE can
    reuse the exchange and no stage introduces a new partitioning; no
    window over the full event stream, no cross-stage fan-out.  Strictly-
    greater comparisons make the stage chain deterministic (equal-ts
    events cannot satisfy two stages at once on either engine).
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    depth = (
        F.lit(1)
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    ).cast("int")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase", depth.alias("depth"))
    )


# ----------------------------------------------------- cohort retention
def retention_cohorts(activity: DataFrame) -> DataFrame:
    """Cohort-retention matrix over a ``(user_id, day)`` activity frame
    (day = any integer period index): cohort = each user's MIN day,
    active_users = distinct users of that cohort active at each offset,
    cohort_size joined broadcast.  All-integer output; see
    events_retention_cohorts for the scale shape."""
    uw = activity.select("user_id", "day").distinct()
    firsts = uw.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        uw.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = firsts.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    return act.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day", "day_offset", "active_users", "cohort_size"
    )



@register(
    "events_retention_cohorts",
    """
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS INT) AS day
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(day) AS cohort_day FROM uw GROUP BY user_id
    ),
    act AS (
      SELECT f.cohort_day,
             CAST(uw.day - f.cohort_day AS INT) AS day_offset,
             COUNT(*) AS active_users
      FROM uw JOIN firsts f ON uw.user_id = f.user_id
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_day, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
    )
    SELECT a.cohort_day, a.day_offset, a.active_users, s.cohort_size
    FROM act a JOIN sizes s ON a.cohort_day = s.cohort_day
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention matrix: users are cohorted by the period of their
    FIRST event (integer day index from a fixed epoch — portable integer
    arithmetic, no engine-specific date-truncation semantics; the period
    width is a constant, day-granular here because the fixture's 30-day
    stream makes every coarser cohort degenerate) and counted once per
    (cohort, offset) period they were active in.  The classic
    product-analytics retention triangle; in a data pipeline the same
    shape answers "how much of crawl-snapshot W's content is still alive
    k snapshots later".

    Scale shape: the (user, day) de-dup is a partial-aggregating
    distinct on the same user_id-led key the cohort MIN groupBy then
    reuses; the cohort join is user_id-keyed (one logical shuffle key for
    all the heavy stages, like events_funnel); the final (cohort, offset)
    rollup and the cohort-size join operate on period-cardinality rows —
    broadcast-sized by construction regardless of input scale.  All
    emitted columns are exact integers, so the cross-engine hash cannot
    ride on float formatting.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.col("ts").cast("timestamp").cast("date"), F.lit("2024-01-01"))
        .cast("int")
        .alias("day"),
    )
    return retention_cohorts(e)


# ------------------------------------- bucketed temporal proximity join
# Window half-width for the error->purchase proximity join (microseconds)
# and the pack base for the (abs_dt, purchase_id) argmin encoding.  The
# pack is exact while purchase event_ids stay below 2^24 (16.7M; max
# event_id at sf0.1 is 99,999) and |dt| * 2^24 stays well inside int64 —
# at larger id spaces widen the base; the encoding is checked by
# tests/test_corpus_ops.py.
_PROX_W_US = 600_000_000  # +/- 10 minutes
_PROX_PACK = 1 << 24


def temporal_proximity_join(
    left: DataFrame,
    right: DataFrame,
    window_us: int,
    pack: int = _PROX_PACK,
) -> DataFrame:
    """Bucketed temporal proximity join: for every ``left`` row
    (``left_id``, ``us``), the count of ``right`` rows (``right_id``,
    ``us``) within ``+/- window_us`` plus the nearest one (ties on
    |dt| broken by smaller right_id via an exact integer packing).
    Bucket width = window width; the right side is replicated to its
    bucket and both neighbors (constant 3x fan-out), so any qualifying
    pair meets on exactly ONE equi-join key and no post-join de-dup is
    needed.  See events_proximity_join for the full scale narrative."""
    lb = left.select(
        "left_id",
        "us",
        F.expr(f"us div {window_us}").alias("bucket"),
    )
    rb = F.expr(f"us div {window_us}")
    rx = right.select(
        F.col("right_id"),
        F.col("us").alias("r_us"),
        F.explode(F.array(rb - 1, rb, rb + 1)).alias("bucket"),
    )
    pairs = lb.join(rx, "bucket").filter(
        F.abs(F.col("us") - F.col("r_us")) <= F.lit(window_us)
    )
    nk = F.abs(F.col("us") - F.col("r_us")) * F.lit(pack) + F.col("right_id")
    agg = pairs.groupBy("left_id").agg(
        F.count(F.lit(1)).alias("n_within"),
        F.min(nk).alias("nk"),
    )
    return (
        left.select("left_id")
        .join(agg, "left_id", "left")
        .select(
            "left_id",
            F.coalesce(F.col("n_within"), F.lit(0)).cast("bigint").alias("n_within"),
            F.expr(f"nk div {pack}").alias("nearest_dt_us"),
            (F.col("nk") % F.lit(pack)).cast("bigint").alias("nearest_right_id"),
        )
    )


@register(
    "events_proximity_join",
    f"""
    WITH e AS (
      SELECT event_id AS error_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'error'
    ),
    p AS (
      SELECT event_id AS p_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT e.error_id,
             COUNT(p.p_id) AS n_within,
             MIN(ABS(e.us - p.p_us) * {_PROX_PACK} + p.p_id) AS nk
      FROM e LEFT JOIN p
        ON p.p_us BETWEEN e.us - {_PROX_W_US} AND e.us + {_PROX_W_US}
      GROUP BY e.error_id
    )
    SELECT error_id, n_within,
           nk // {_PROX_PACK} AS nearest_dt_us,
           nk % {_PROX_PACK} AS nearest_purchase_id
    FROM m
    """,
)
def events_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-to-large temporal proximity join: for every error event, the
    count of purchases within +/-10 minutes ANYWHERE in the stream plus
    the nearest such purchase — the ad-attribution / incident-correlation
    query whose naive form is an unbounded inequality join (O(n*m)).

    Scale shape — the bucketed band-join pattern: each side is assigned
    an integer time bucket of exactly the window width; the probe side is
    replicated to its bucket and both neighbors (a fixed 3x fan-out,
    independent of data volume), and the join becomes a hash equi-join on
    bucket id.  Any pair within the window shares exactly ONE
    (error-bucket, replicated-bucket) key, so no post-join de-dup is
    needed; pairs further apart than one bucket can never meet.  This is
    the same binning trick behind range-join optimizers (and our
    events_asof_join's sibling); it holds at 100 TB because the fan-out
    is constant and the join is a plain shuffled hash join on a dense
    integer key.  Nearest-purchase is an argmin via MIN over an exact
    integer (abs_dt, purchase_id) packing — deterministic on both engines
    with a total tie-break, no window sort over the stream.  All outputs
    are exact integers.
    """
    e = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("left_id"), "us"
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("right_id"), "us"
    )
    return temporal_proximity_join(err, pur, _PROX_W_US).select(
        F.col("left_id").alias("error_id"),
        "n_within",
        "nearest_dt_us",
        F.col("nearest_right_id").alias("nearest_purchase_id"),
    )


# ------------------------------------------------ hourly count anomalies
def bucket_count_anomalies(counts: DataFrame, z2: int = 9) -> DataFrame:
    """Flag buckets whose count deviates more than sqrt(z2) population
    standard deviations from their group's mean, in EXACT integer
    arithmetic: with n buckets, S = sum(c), SS = sum(c^2), the test
    ``z^2 > z0^2`` rewrites to ``(c*n - S)^2 > z0^2 * (n*SS - S^2)`` —
    no division, no floats, so both engines agree bit-for-bit and a
    constant series (variance 0) flags nothing.  STRICT inequality:
    a lone outlier among n-1 identical values sits at exactly
    z^2 = n-1, so the n=10 single-spike case is deliberately NOT an
    anomaly at z0=3.  Input ``(grp, bucket, c)``; int64 bound: valid
    while c*n < ~3e9 (the square must fit int64; Spark ANSI fails loud,
    not silent, past it) — at larger scales rescale counts or widen to
    decimal.  Group stats are a partial-aggregating groupBy to
    group-cardinality rows, broadcast back onto the bucket stream."""
    s = counts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("S"),
        F.sum(F.col("c") * F.col("c")).alias("SS"),
    )
    dev = F.col("c") * F.col("n") - F.col("S")
    var_n = F.col("n") * F.col("SS") - F.col("S") * F.col("S")
    return (
        counts.join(F.broadcast(s), "grp")
        .select(
            "grp",
            "bucket",
            "c",
            (dev * dev > F.lit(z2) * var_n).alias("is_anomaly"),
        )
    )


@register(
    "events_anomaly",
    """
    WITH c AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(n_events) AS BIGINT) AS S,
             CAST(SUM(n_events * n_events) AS BIGINT) AS SS
      FROM c GROUP BY 1
    )
    SELECT c.event_type, c.hour_idx, c.n_events,
           (c.n_events * s.n - s.S) * (c.n_events * s.n - s.S)
             > 9 * (s.n * s.SS - s.S * s.S) AS is_anomaly
    FROM c JOIN s ON c.event_type = s.event_type
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume-anomaly detection per event type — the monitoring
    query a streaming ingest pipeline runs continuously (a traffic spike
    or outage hour shows up as a >3-sigma bucket).  Statistics are over
    OBSERVED hours only (an entirely silent hour is absent from the
    groupBy — detecting those is a calendar anti-join, a different
    query); the fixture's Poisson-ish stream yields a handful of natural
    3-sigma hours per type (3-8 at sf0.01), so the flag is exercised
    without planting.

    Scale shape: one partial-aggregating groupBy to (type, hour) cells,
    one more to 5 per-type stat rows broadcast back — the anomaly test
    itself is ``bucket_count_anomalies``'s exact integer algebra, so the
    cross-engine hash rides only on integers and booleans.
    """
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias(
            "hour_idx"
        ),
    )
    c = e.groupBy("event_type", "hour_idx").agg(F.count(F.lit(1)).alias("c"))
    out = bucket_count_anomalies(
        c.select(F.col("event_type").alias("grp"), F.col("hour_idx").alias("bucket"), "c")
    )
    return out.select(
        F.col("grp").alias("event_type"),
        F.col("bucket").alias("hour_idx"),
        F.col("c").alias("n_events"),
        "is_anomaly",
    )


# ----------------------------------------- bucketed co-located join
@register(
    "bucketed_join_colocated",
    """
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(ROUND(value * 1000) AS BIGINT) AS value_m
      FROM events
    ),
    tot AS (
      SELECT user_id, CAST(SUM(value_m) AS BIGINT) AS user_total_m
      FROM ev GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value_m, t.user_total_m,
           CAST((e.value_m * 1000000) // t.user_total_m AS BIGINT) AS frac_ppm
    FROM ev e JOIN tot t ON e.user_id = t.user_id
    """,
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-side bucketing: the fact stream and a per-user aggregate are
    both written as Hive-bucketed tables on user_id (``bucketBy`` +
    ``sortBy``), then joined — and the join plan contains ZERO Exchange
    nodes (asserted in-query, hard-fail): both scans are already
    co-partitioned by the bucket hash, so the sort-merge join runs
    shuffle-free.  This is THE pattern for a 100 TB store that is joined
    on the same key every day (events x user dims, transcripts x conv
    metadata): pay the partitioning once at write time, never again at
    read time — the brief's "bucketing for co-located joins" made
    concrete and driver-checkable.

    The merge hint pins the sort-merge strategy so the zero-Exchange
    assertion tests bucketing (a broadcast would also avoid the shuffle,
    but only while the dim is small — bucketing holds at any scale).
    Values are integer-exact end to end: value milli-units, bigint
    per-user totals, truncating-division ppm fractions (both operands
    nonnegative, so Spark's ``div`` and DuckDB's ``//`` agree) — no
    float division, no rounding-boundary risk.  Output is materialized
    before the scratch tables are dropped.
    """
    import tempfile as _tf
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:10]
    work = _tf.mkdtemp(prefix="moira_bucketed_")
    fact_t, dim_t = f"bkt_ev_{tag}", f"bkt_tot_{tag}"
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 1000).cast("bigint").alias("value_m"),
    )
    tot = ev.groupBy("user_id").agg(
        F.sum("value_m").cast("bigint").alias("user_total_m")
    )
    try:
        (
            ev.write.bucketBy(16, "user_id")
            .sortBy("user_id")
            .option("path", f"{work}/fact")
            .saveAsTable(fact_t)
        )
        (
            tot.write.bucketBy(16, "user_id")
            .sortBy("user_id")
            .option("path", f"{work}/dim")
            .saveAsTable(dim_t)
        )
        joined = (
            spark.table(fact_t)
            .hint("merge")
            .join(spark.table(dim_t), "user_id")
            .select(
                "event_id",
                "user_id",
                "value_m",
                "user_total_m",
                F.expr("value_m * 1000000 div user_total_m")
                .cast("bigint")
                .alias("frac_ppm"),
            )
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "SortMergeJoin" not in plan:
            raise AssertionError(f"bucketed join lost its SMJ strategy:\n{plan}")
        if "Exchange" in plan:
            raise AssertionError(
                f"bucketed co-located join shuffled (Exchange in plan):\n{plan}"
            )
        pdf = joined.toPandas()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {fact_t}")
        spark.sql(f"DROP TABLE IF EXISTS {dim_t}")
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf,
        schema=(
            "event_id bigint, user_id bigint, value_m bigint, "
            "user_total_m bigint, frac_ppm bigint"
        ),
    )


# ---------------------------------------------------- bloom semi-join (r5)
@register(
    "events_bloom_prefilter",
    """
    SELECT user_id,
           COUNT(*) AS n_clicks,
           CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT)
               AS click_value_m
    FROM events
    WHERE event_type = 'click'
      AND user_id IN (SELECT user_id FROM events WHERE event_type = 'error')
    GROUP BY user_id
    """,
)
def events_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (operators/bloom.py): per-user
    click stats restricted to users that ever errored.

    The scale story: at 10^12 events the semi join's shuffle is dominated
    by rows that match nothing.  The Bloom bitmap built over the (small)
    error-user side rides the plan as a constant-folded literal and drops
    non-candidates inside the scan's whole-stage codegen, BEFORE any
    shuffle or join; the broadcast semi join that follows removes the
    false positives, so the composed result is bit-identical to the plain
    semi join — which is exactly what the DuckDB oracle checks.

    Two invariants hard-fail in-query: the filter must be a superset of
    the true matches that actually prunes (false-positive side), and no
    true match may be dropped (false-negative side — zero by construction,
    verified anyway)."""
    from moira_spark.operators.bloom import bits_for, build_bloom, might_contain

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    err_users = (
        ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    )

    # size the bitmap to the build side (ADVICE r5: the fixed 2^16 default
    # drifts past ~1% fp beyond ~9k distinct keys, which can hard-fail the
    # pruning-power gate below at larger sf even though results stay exact)
    n_err = err_users.count()
    words = build_bloom(err_users, "user_id", num_bits=bits_for(n_err))
    passed = clicks.filter(might_contain(F.col("user_id"), words))
    exact = clicks.join(F.broadcast(err_users), on="user_id", how="left_semi")

    n_clicks, n_passed, n_exact = (
        clicks.count(),
        passed.count(),
        exact.count(),
    )
    if not (n_exact <= n_passed <= n_clicks):
        raise AssertionError(
            "bloom pre-filter not a superset of true matches: "
            f"clicks={n_clicks} passed={n_passed} exact={n_exact}"
        )
    # pruning power: of the non-member rows (n_clicks - n_exact), at most
    # half may false-positive through — and at tiny sf every clicking user
    # may also have errored, in which case there is nothing to prune
    n_nonmember = n_clicks - n_exact
    if n_nonmember and (n_passed - n_exact) > max(1, n_nonmember // 2):
        raise AssertionError(
            f"bloom passed {n_passed - n_exact} of {n_nonmember} "
            "non-member rows — filter is not pruning"
        )
    false_neg = exact.filter(~might_contain(F.col("user_id"), words)).count()
    if false_neg:
        raise AssertionError(f"bloom dropped {false_neg} true matches")

    # reuse the bitmap + pre-filtered frame the invariants already built
    # (bloom_prefiltered_semi_join would redundantly rebuild both)
    out = passed.join(F.broadcast(err_users), on="user_id", how="left_semi")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum(F.round(F.col("value") * 1000).cast("bigint"))
        .cast("bigint")
        .alias("click_value_m"),
    )
