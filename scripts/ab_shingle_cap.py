"""A/B: hot-shingle document-frequency capping for the near-dup joins.

At web scale a few boilerplate shingles shared by a large fraction of docs
dominate the candidate equi-join (fan-out is quadratic per hot key).
``cap_hot_shingles`` bounds that; this script measures what the cap costs
(one extra agg + semi-join) and what it saves on a corpus with a planted
boilerplate sentence, and verifies the planted near-dups are still found.

Usage: python scripts/ab_shingle_cap.py [sf_dir]  -> one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from moira_spark.harness import dedup
    from moira_spark.session import build_session

    spark = build_session(app_name="ab-shingle-cap", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    # Make the scale problem visible at bench scale: append one shared
    # boilerplate sentence to 30% of docs (a single shingle set hitting
    # thousands of docs — the web-footer case).
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    boiler = " all rights reserved contact us terms of service apply today"
    salted = base.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 3, F.concat(F.col("text"), F.lit(boiler)))
        .otherwise(F.col("text")),
    )
    # cache keyed by sf_dir so switching scale factors cannot silently
    # reuse a stale corpus
    sf_label = os.path.basename(sf_dir.rstrip("/"))
    work = os.path.join(REPO, ".bench_cache", f"docs_boiler_{sf_label}")
    if not os.path.exists(os.path.join(work, "_SUCCESS")):
        salted.write.mode("overwrite").parquet(work)

    # monkeypatch the loader so the harness queries read the boilerplate
    # corpus; everything else (planting, thresholds) is unchanged
    import moira_spark.harness as H

    orig_load = H.load

    def load_boiler(spark_, d, t):
        if t == "documents":
            return spark_.read.parquet(work)
        return orig_load(spark_, d, t)

    H.load = dedup.load = load_boiler

    out = {}
    for name, fn in (
        ("jaccard", dedup.dedup_jaccard_3gram),
        ("minhash", dedup.dedup_minhash_lsh),
    ):
        for label, kw in (("off", {}), ("cap64", {"max_shingle_df": 64})):
            best = 9e9
            rows = None
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, sf_dir, **kw)
                rows = df.count()
                best = min(best, time.time() - t0)
            out[f"{name}_{label}"] = {"sec": round(best, 2), "pairs": rows}

    # planted-dup recall under the cap: planted pairs have doc_b >= 1000000
    planted_off = (
        dedup.dedup_jaccard_3gram(spark, sf_dir)
        .filter(F.col("doc_b") >= 1000000).count()
    )
    planted_cap = (
        dedup.dedup_jaccard_3gram(spark, sf_dir, max_shingle_df=64)
        .filter(F.col("doc_b") >= 1000000).count()
    )
    out["planted_recall_cap64"] = planted_cap / max(planted_off, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
