"""Resumable quality-filter job: chunked, snapshot-committed, audited.

The production entry (driver script for ``spark-submit --py-files``): the
input conversation space is split into ``n_buckets`` hash buckets; each
bucket is filtered, staged, audited, and committed as one snapshot.  A crash
— executor or driver — loses at most the in-flight bucket, whose staging
directory is invisible to readers (sources/tableio.py); re-running the same
run_id skips every committed bucket and reproduces the identical final table
(pytest-pinned in tests/test_resume.py).

Bucketing by conv_id hash keeps conversation atomicity (a conversation is
judged whole inside exactly one bucket — required because the conv-level
verdict depends on all its turns).
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from moira_spark.pipeline import release_cache, run_pipeline
from moira_spark.sources.tableio import SnapshotTable

AUDIT_SCHEMA_DOC = (
    "run_id string, snapshot_bucket int, partition_id int, input_turns long, "
    "kept_turns long, dropped_turns long, rule_hits map<string,long>, "
    "convs_dropped long, wall_ms long"
)


def _bucket_of(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def audit_rows(labels: DataFrame, run_id: str, bucket: int, wall_ms: int) -> DataFrame:
    """Per-(Spark-partition) lineage/metric rows for the audit table."""
    with_pid = labels.withColumn("partition_id", F.spark_partition_id())
    base = with_pid.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("input_turns"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("kept_turns"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("dropped_turns"),
        F.countDistinct(F.when(~F.col("conv_keep"), F.col("conv_id"))).alias(
            "convs_dropped"
        ),
    )
    hits = (
        with_pid.select("partition_id", F.explode("reasons").alias("reason"))
        .groupBy("partition_id", "reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("partition_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("reason", "n")))
            ).alias("rule_hits")
        )
    )
    empty_map = F.map_from_entries(
        F.array().cast("array<struct<reason:string,n:long>>")
    )
    return (
        base.join(hits, "partition_id", "left")
        # partitions where no rule fired get an EMPTY map, not NULL — the
        # audit schema declares map<string,long> and downstream map ops
        # (element_at, map_concat) must not hit nulls
        .withColumn("rule_hits", F.coalesce(F.col("rule_hits"), empty_map))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("snapshot_bucket", F.lit(bucket))
        .withColumn("wall_ms", F.lit(wall_ms).cast("long"))
        .select(
            "run_id",
            "snapshot_bucket",
            "partition_id",
            "input_turns",
            "kept_turns",
            "dropped_turns",
            "rule_hits",
            "convs_dropped",
            "wall_ms",
        )
    )


def run_filter_job(
    spark: SparkSession,
    source: DataFrame,
    output_dir: str,
    run_id: str,
    n_buckets: int = 4,
    fail_after_buckets: int | None = None,
) -> SnapshotTable:
    """Filter ``source`` into ``output_dir`` (labels + audit tables).

    ``fail_after_buckets`` is a test hook: raise after committing that many
    buckets, simulating a driver crash mid-job.
    """
    labels_table = SnapshotTable(f"{output_dir}/labels")
    audit_table = SnapshotTable(f"{output_dir}/audit")

    done = 0
    committed = set(
        (labels_table.latest_snapshot().committed_keys)
        if labels_table.latest_snapshot()
        else []
    )
    for bucket in range(n_buckets):
        key = f"{run_id}/bucket={bucket}"
        if key in committed:
            continue  # resume: this slice is already in the committed table
        t0 = time.time()
        slice_df = source.filter(_bucket_of(F.col("conv_id"), n_buckets) == bucket)
        labels = run_pipeline(spark, slice_df)
        bucket_run = f"{run_id}-b{bucket}"
        labels_table.stage(labels, bucket_run)
        wall_ms = int((time.time() - t0) * 1000)
        staged = spark.read.parquet(labels_table.staged_dir(bucket_run))
        # commit order: audit first, labels last — a crash between the two
        # leaves an audit run whose labels are uncommitted; the next resume
        # re-runs the bucket (labels staging dir is an unreferenced orphan,
        # safe to overwrite) but MUST NOT re-stage the audit dir: it is
        # already referenced by a committed audit snapshot, and overwriting
        # it would violate snapshot immutability (a crash mid-overwrite
        # would corrupt committed data).  The audit content is deterministic
        # modulo wall_ms, so keeping the committed copy is exact.
        if not audit_table.is_committed(bucket_run):
            audit_table.stage(audit_rows(staged, run_id, bucket, wall_ms), bucket_run)
            audit_table.commit(spark, bucket_run, committed_keys=[key])
        labels_table.commit(spark, bucket_run, committed_keys=[key])
        # Release the pipeline's internal persisted frame so the cache does
        # not grow by one MEMORY_AND_DISK copy per bucket.
        release_cache(labels)
        done += 1
        if fail_after_buckets is not None and done >= fail_after_buckets:
            raise RuntimeError(f"injected crash after {done} buckets")
    return labels_table
