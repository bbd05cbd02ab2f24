"""A/B: plain vs salted conversation aggregation on the skewed 1M table.

Run: python scripts/ab_salting.py   (expects the staged 1M bench table)

Measured on this host (local[8], warm best-of-3): plain 1.18s, salted
1.38s, results identical.  Interpretation — for ALGEBRAIC aggregations
(count/sum) Spark's map-side partial aggregation already defuses hot-key
skew: the reduce task for the hot conversation receives one partial row per
map task, not one row per turn, so even a conversation holding 5% of 10^12
turns is harmless.  The salted two-phase aggregation in
operators/conv_agg.py is kept because (a) the north rule pins it, and (b)
it is the correct shape the moment the per-conversation payload becomes
holistic (collect_list of reasons, percentiles) or the verdict join-back
stops broadcasting — those paths DO straggle on a hot key.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from moira_spark import config  # noqa: E402
from moira_spark.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(
        os.path.join(REPO, ".bench_cache", "transcripts_1000000")
    ).withColumn("keep", F.length("text") > 20)

    def plain():
        return src.groupBy("conv_id").agg(
            F.count(F.when(~F.col("keep"), True)).alias("bad_turns")
        )

    def salted():
        salt = F.pmod(F.hash(F.col("turn_idx")), F.lit(config.CONV_AGG_SALT_BUCKETS))
        p = src.groupBy("conv_id", salt.alias("s")).agg(
            F.count(F.when(~F.col("keep"), True)).alias("b")
        )
        return p.groupBy("conv_id").agg(F.sum("b").alias("bad_turns"))

    for name, fn in [("plain", plain), ("salted", salted)]:
        best = 9e9
        for _ in range(3):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.2f}s")
    a = plain().toPandas().sort_values("conv_id").reset_index(drop=True)
    b = salted().toPandas().sort_values("conv_id").reset_index(drop=True)
    print("identical:", a.equals(b))


if __name__ == "__main__":
    main()
