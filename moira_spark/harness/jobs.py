"""Driver-contract query for the resumable bucketed job (rows-only).

SURVEY.md §2.2 #12 (idempotent resume) was pytest-only in round 1 — the one
operator with no driver-visible check.  This query runs the REAL job twice
on a deterministic fixture: the first run is killed by the crash-injection
hook after committing 2 of 4 conv-hash buckets, the second resumes from the
snapshot log and finishes.  The output summarizes everything that must hold:
the resumed table equals a direct single-pass pipeline run row-for-row, a
snapshot exists per committed bucket, time travel to the pre-crash snapshot
sees exactly the first runs' rows, and audit lineage rows cover every
bucket.  Every value is deterministic (seed-fixed input, wall_ms excluded).
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from moira_spark.harness import register

_N_TURNS = 1500
_BUCKETS = 4
_CRASH_AFTER = 2


@register("job_resume_identity", None)
def job_resume_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from moira_spark.datagen import transcripts as tg
    from moira_spark.job import run_filter_job
    from moira_spark.pipeline import release_cache, run_pipeline
    from moira_spark.sources.tableio import SnapshotTable

    work = tempfile.mkdtemp(prefix="moira_job_check_")
    src = tg.gen_spark(spark, _N_TURNS, seed=42)

    # run 1: injected crash after 2 committed buckets
    crashed = False
    try:
        run_filter_job(
            spark, src, work, run_id="driver-check",
            n_buckets=_BUCKETS, fail_after_buckets=_CRASH_AFTER,
        )
    except RuntimeError:
        crashed = True
    labels_table = SnapshotTable(f"{work}/labels")
    pre_crash = labels_table.latest_snapshot()
    pre_crash_rows = sum(pre_crash.row_counts.values()) if pre_crash else 0

    # run 2: resume from the snapshot log and finish
    run_filter_job(spark, src, work, run_id="driver-check", n_buckets=_BUCKETS)
    final = labels_table.read(spark)

    # identity vs a direct single-pass pipeline over the same input
    direct = run_pipeline(spark, src)
    key_cols = ["conv_id", "turn_idx", "keep", "conv_keep", "scrubbed_text"]
    diff = (
        final.select(*key_cols).exceptAll(direct.select(*key_cols)).count()
        + direct.select(*key_cols).exceptAll(final.select(*key_cols)).count()
    )
    n_final = final.count()
    release_cache(direct)

    # time travel: the pre-crash snapshot must see exactly its own rows
    travel = labels_table.read(spark, version=pre_crash.version if pre_crash else 1)
    travel_rows = travel.count() if travel is not None else -1

    audit = SnapshotTable(f"{work}/audit").read(spark)
    audit_buckets = (
        audit.select("snapshot_bucket").distinct().count() if audit is not None else 0
    )
    final_snap = labels_table.latest_snapshot()

    row = {
        "crashed_at_bucket": _CRASH_AFTER if crashed else -1,
        "n_labels": n_final,
        "diff_vs_direct": diff,
        "identical_to_direct": diff == 0,
        "snapshots_committed": final_snap.version if final_snap else 0,
        "pre_crash_rows": pre_crash_rows,
        "time_travel_rows": travel_rows,
        "time_travel_consistent": travel_rows == pre_crash_rows,
        "audit_buckets": audit_buckets,
    }
    shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [row],
        schema=(
            "crashed_at_bucket int, n_labels long, diff_vs_direct long, "
            "identical_to_direct boolean, snapshots_committed int, "
            "pre_crash_rows long, time_travel_rows long, "
            "time_travel_consistent boolean, audit_buckets int"
        ),
    )


@register("table_maintenance_lifecycle", None)
def table_maintenance_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg-semantics maintenance tier under the driver harness:
    additive schema evolution -> compaction -> vacuum, on one table.

    Sequence: commit 3 runs (the third adds a column -> earlier rows read
    back NULL there), zone-map pruned scan (Iceberg-style column metrics:
    a filtered read plans only the run dirs whose min/max can match, and a
    filter on the evolved column skips the runs committed before it
    existed), compact (data-identical rewrite, schema carried, folded runs
    retired so replayed commits stay idempotent), vacuum with age-0
    (expired + orphaned staging dirs removed), and re-read.  A second
    table exercises FILE-level zone maps: a cluster_by sorted write into 4
    files, then a point read that must plan exactly 1 of them, then an
    append + rollback pinning the metadata-only undo contract.  A third
    table pins Z-curve clustering: point slices on BOTH clustered dims
    must prune files sublinearly.  One row of
    deterministic values; the zone-map invariants hard-fail in-query (a
    regression turns the driver row red), and any drift in
    schema-evolution NULL backfill, compaction row preservation, retire
    bookkeeping, or vacuum scope flips a value.
    """
    import os

    from moira_spark.sources.tableio import SnapshotTable

    work = tempfile.mkdtemp(prefix="moira_maint_check_")
    t = SnapshotTable(f"{work}/t")
    t.stage(spark.range(0, 5).toDF("x"), "r1")
    t.commit(spark, "r1")
    t.stage(spark.range(5, 8).toDF("x"), "r2")
    t.commit(spark, "r2")
    t.stage(
        spark.range(8, 10).toDF("x").withColumn("y", F.col("x") * 2), "r3"
    )
    t.commit(spark, "r3")
    t.stage(spark.range(90, 95).toDF("x"), "orphan")  # never committed

    evolved = t.read(spark)
    nulls_backfilled = evolved.filter(F.col("y").isNull()).count()
    sum_y = evolved.agg(
        F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("s")
    ).collect()[0]["s"]

    # zone-map file skipping: x>=8 lives only in r3 (r1 [0,4], r2 [5,7]),
    # so the pruned scan must plan ONLY r3's files; a filter on the evolved
    # column y must also skip r1/r2 (committed before y existed, all-NULL)
    pre = t.latest_snapshot()
    pruned_read = t.read(spark, filters=[("x", ">=", 8)])
    scan_files = pruned_read.inputFiles()
    _, skipped_x = t.prune(pre, [("x", ">=", 8)])
    _, skipped_y = t.prune(pre, [("y", ">", 0)])
    zone = {
        "zone_runs_skipped": len(skipped_x),
        "zone_pruned_rows": pruned_read.count(),
        "zone_scan_reads_only_matching_run": bool(scan_files)
        and all("run_id=r3" in p for p in scan_files),
        "zone_evolution_skips_pre_column_runs": sorted(skipped_y)
        == ["r1", "r2"],
    }
    expect = {
        "zone_runs_skipped": 2,
        "zone_pruned_rows": 2,
        "zone_scan_reads_only_matching_run": True,
        "zone_evolution_skips_pre_column_runs": True,
    }
    if zone != expect:
        raise AssertionError(
            f"zone-map pruning invariants violated: {zone} != {expect}"
        )

    # incremental append scan (round 5): consumers of a growing table read
    # only the rows ADDED in a snapshot range — appends contribute,
    # compaction (checked after the compact below) contributes nothing
    inc_12 = sorted(
        r.x for r in t.read_changes(spark, 1, 3).collect()
    ) == [5, 6, 7, 8, 9]
    inc_bootstrap = t.read_changes(spark, 0, 1).count() == 5
    if not (inc_12 and inc_bootstrap):
        raise AssertionError(
            f"incremental append scan broke: v1->v3 ok={inc_12}, "
            f"bootstrap ok={inc_bootstrap}"
        )

    # file-level zone maps (round 5): a cluster_by sorted write splits the
    # run into files with disjoint key ranges; the per-file stats recorded
    # at commit let a point read plan ONE file of N — Iceberg's file-level
    # manifest pruning below the run-level skipping checked above
    t2 = SnapshotTable(f"{work}/t2")
    t2.stage(
        spark.range(100, 200).toDF("x"),
        "c1",
        cluster_by=["x"],
        cluster_partitions=4,
    )
    t2.commit(spark, "c1")
    point = t2.read(spark, filters=[("x", "=", 150)])
    point_files = point.inputFiles()
    fzone = {
        "file_zone_total_files": len(
            t2.latest_snapshot().file_stats["c1"]
        ),
        "file_zone_files_planned": len(point_files),
        "file_zone_point_row_ok": [r.x for r in point.collect()] == [150],
    }
    fexpect = {
        "file_zone_total_files": 4,
        "file_zone_files_planned": 1,
        "file_zone_point_row_ok": True,
    }
    if fzone != fexpect:
        raise AssertionError(
            f"file-level pruning invariants violated: {fzone} != {fexpect}"
        )

    # z-order clustering (round 5, sixth session): a Z-curve sorted write
    # prunes sublinearly on EVERY clustered column, where lexicographic
    # cluster_by prunes only the leading one.  16x16 grid into 4 files: a
    # point slice on either dim must plan <= 3 of 4 files and return all
    # 16 matching rows.
    t3 = SnapshotTable(f"{work}/t3")
    grid = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a int, b int"
    )
    t3.stage(grid, "z1", cluster_by=["a", "b"], cluster_partitions=4,
             zorder=True)
    t3.commit(spark, "z1")
    za = t3.read(spark, filters=[("a", "==", 5)])
    zb = t3.read(spark, filters=[("b", "==", 5)])
    zrow = {
        "zorder_files_a": len(za.inputFiles()),
        "zorder_files_b": len(zb.inputFiles()),
        "zorder_rows_ok": za.count() == 16 and zb.count() == 16,
    }
    if not (
        zrow["zorder_rows_ok"]
        and 1 <= zrow["zorder_files_a"] <= 3
        and 1 <= zrow["zorder_files_b"] <= 3
    ):
        raise AssertionError(f"z-order pruning invariants violated: {zrow}")

    snap = t.compact(spark)
    inc_across_compact = t.read_changes(
        spark, 3, snap.version
    ).count()  # the rewrite added no rows, so the scan yields none
    if inc_across_compact != 0:
        raise AssertionError(
            "incremental scan surfaced a compaction rewrite as "
            f"{inc_across_compact} appended rows"
        )
    removed = t.vacuum(retain_last=1, min_age_seconds=0)
    after = t.read(spark)

    # rollback (round 5): Iceberg rollback_to_snapshot — a metadata-only
    # undo.  Append a second run to t2, roll back to v1, and pin the full
    # contract: state restored as a NEW version, the undone run no longer
    # committed (a corrected re-ingest re-appends), the undone version
    # still time-travelable, and the incremental scan refusing to cross
    # the rewrite while consuming normally from it forward.
    t2.stage(spark.range(200, 210).toDF("x"), "c2")
    t2.commit(spark, "c2")  # v2
    rb = t2.rollback(1)  # v3
    try:
        t2.read_changes(spark, 1)  # spans the rollback -> must refuse
        inc_refused = False
    except ValueError:
        inc_refused = True
    roll = {
        "rollback_is_new_version": rb.version == 3
        and rb.operation == "rollback",
        "rollback_state_restored": t2.read(spark).count() == 100,
        "rollback_undoes_commit": not t2.is_committed("c2"),
        "rollback_history_travelable": t2.read(spark, version=2).count()
        == 110,
        "rollback_blocks_incremental_scan": inc_refused,
    }
    if not all(roll.values()):
        raise AssertionError(f"rollback invariants violated: {roll}")

    # tags (round 5): pin the rolled-back-over version as a published
    # release, vacuum to the minimum window, and require the pinned read
    # to survive — Iceberg ref retention, the WAP publish pointer
    t2.tag("release", 2)
    t2.vacuum(retain_last=1, min_age_seconds=0)
    tag_ok = (
        t2.read(spark, tag="release").count() == 110
        and t2.tags() == {"release": 2}
    )
    if not tag_ok:
        raise AssertionError("tagged version did not survive vacuum")

    row = {
        **zone,
        **fzone,
        **zrow,
        "incremental_scan_ok": inc_12 and inc_bootstrap,
        "incremental_rows_across_compact": inc_across_compact,
        "rollback_ok": all(roll.values()),
        "tag_retention_ok": tag_ok,
        "rows_before": 10,
        "rows_after_compact_vacuum": after.count(),
        "sum_x": after.agg(F.sum("x").cast("long").alias("s")).collect()[0]["s"],
        "nulls_backfilled_in_new_col": nulls_backfilled,
        "sum_new_col": sum_y,
        "schema_after": ",".join(after.columns),
        "runs_retired": len(snap.retired_run_ids),
        "replayed_commit_idempotent": t.is_committed("r2"),
        "dirs_vacuumed": len(removed),
        "data_dirs_left": sum(
            1 for e in os.listdir(t.data_dir) if e.startswith("run_id=")
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [row],
        schema=(
            "zone_runs_skipped int, zone_pruned_rows long, "
            "zone_scan_reads_only_matching_run boolean, "
            "zone_evolution_skips_pre_column_runs boolean, "
            "file_zone_total_files int, file_zone_files_planned int, "
            "file_zone_point_row_ok boolean, "
            "zorder_files_a int, zorder_files_b int, zorder_rows_ok boolean, "
            "incremental_scan_ok boolean, "
            "incremental_rows_across_compact long, rollback_ok boolean, "
            "tag_retention_ok boolean, "
            "rows_before int, rows_after_compact_vacuum long, sum_x long, "
            "nulls_backfilled_in_new_col long, sum_new_col long, "
            "schema_after string, runs_retired int, "
            "replayed_commit_idempotent boolean, dirs_vacuumed int, "
            "data_dirs_left int"
        ),
    )


@register("table_merge_upsert", None)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style MERGE under the driver harness: copy-on-write upsert
    with run-dir pruning on SnapshotTable (the mutation primitive a
    transcript store needs for redaction / re-scoring without full
    rewrites — at 100 TB a merge touching one partition's keys must not
    rewrite the others).

    Sequence: commit 2 runs -> MERGE (one update, one insert, one delete
    hitting only run 1's keys) -> re-merge the same merge_id (idempotent
    no-op) -> read back + time-travel.  Hard-fails in-query (raise, ->
    red driver row) if any of the pinned invariants drifts: merged
    contents, the untouched run dir surviving unrewritten, the matched
    run retiring (still replay-recognized), idempotency, or pre-merge
    time travel.  tests/test_merge.py pins the same surface plus CAS
    races and schema evolution.

    Round 6 adds the MERGE-ON-READ leg on a second table: a small-key
    mode="mor" merge must write ONE equality-delete keys file (zone-map
    scoped to the runs that can match) plus ONE insert run — no run-dir
    rewrite, nothing retired — read back correct through the anti-join,
    and compact() must fold the deletes away data-identically.  That is
    the O(keys) mutation path a high-churn 100 TB table needs between
    compactions.
    """
    import os

    from moira_spark.sources.tableio import SnapshotTable

    work = tempfile.mkdtemp(prefix="moira_merge_check_")
    t = SnapshotTable(f"{work}/t")
    t.stage(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), "r1")
    t.commit(spark, "r1")
    t.stage(spark.createDataFrame([(3, "c"), (4, "d")], "k long, v string"), "r2")
    t.commit(spark, "r2")

    upd = spark.createDataFrame(
        [(2, "B", False), (9, "new", False), (1, None, True)],
        "k long, v string, is_delete boolean",
    )
    snap = t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_delete")
    again = t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_delete")

    # compare as sorted row LISTS, not key-indexed dicts: a regression that
    # leaves BOTH the old survivor and its replacement in the table must
    # fail loudly, not collapse into one dict entry (review finding r5s4)
    merged = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    travel = sorted((r["k"], r["v"]) for r in t.read(spark, version=2).collect())
    row = {
        "merged_rows": len(merged),
        "merged_ok": merged == [(2, "B"), (3, "c"), (4, "d"), (9, "new")],
        "untouched_run_kept": "r2" in snap.run_ids,
        "matched_run_retired": (
            "r1" not in snap.run_ids and "r1" in snap.retired_run_ids
        ),
        "retired_still_committed": t.is_committed("r1"),
        "rerun_idempotent": again.version == snap.version,
        "time_travel_pre_merge": travel
        == [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
        "data_dirs": sum(
            1 for e in os.listdir(t.data_dir) if e.startswith("run_id=")
        ),
    }

    # merge-on-read leg (round 6): small-key merge = delete file + insert
    # run, zero rewrites; compaction folds the deletes data-identically
    t2 = SnapshotTable(f"{work}/t2")
    for i in range(4):
        t2.stage(
            spark.createDataFrame(
                [(i * 10 + j, f"v{i * 10 + j}") for j in range(10)],
                "k long, v string",
            ),
            f"m{i}",
        )
        t2.commit(spark, f"m{i}")
    upd2 = spark.createDataFrame(
        [(7, "U7", False), (23, None, True)], "k long, v string, is_delete boolean"
    )
    msnap = t2.merge(
        spark, upd2, ["k"], merge_id="mor1", delete_col="is_delete", mode="mor"
    )
    mor_rows = sorted((r["k"], r["v"]) for r in t2.read(spark).collect())
    want = sorted(
        [(k, f"v{k}") for k in range(40) if k not in (7, 23)] + [(7, "U7")]
    )
    csnap = t2.compact(spark)
    after_compact = sorted((r["k"], r["v"]) for r in t2.read(spark).collect())
    row.update(
        {
            "mor_no_rewrite": len(msnap.run_ids) == 5
            and msnap.retired_run_ids == [],
            # the update-key BOUNDING BOX is [7, 23]: zone-map scoping must
            # keep m3 (keys 30-39, provably outside) out of the reader's
            # anti-join while m0-m2 (ranges overlapping the box) stay in
            "mor_delete_scoped": len(msnap.delete_files) == 1
            and sorted(msnap.delete_files[0]["applies_to"])
            == ["m0", "m1", "m2"],
            "mor_read_ok": mor_rows == want,
            "mor_compact_folds": csnap.delete_files == []
            and after_compact == want,
        }
    )
    shutil.rmtree(work, ignore_errors=True)
    bad = [k for k, v in row.items() if v is False]
    if bad:
        raise AssertionError(f"MERGE invariants violated: {bad} in {row}")
    return spark.createDataFrame(
        [row],
        schema=(
            "merged_rows int, merged_ok boolean, untouched_run_kept boolean, "
            "matched_run_retired boolean, retired_still_committed boolean, "
            "rerun_idempotent boolean, time_travel_pre_merge boolean, "
            "data_dirs int, mor_no_rewrite boolean, mor_delete_scoped "
            "boolean, mor_read_ok boolean, mor_compact_folds boolean"
        ),
    )


# --------------------------------------------------------------- round 6
# The DuckDB oracle computes the EXPECTED changelog purely from the static
# documents table: deletes = the pre-merge values of every matched key
# (updates and delete-rows alike), inserts = every non-delete update row.
# The Spark side produces the same rows by actually committing the base
# batch, MERGING the updates, and reading the row-level changelog back —
# so the value hash checks the whole batch -> merge -> read_changelog
# round trip, not a reimplementation of it.
_CDC_SQL = """
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
    ),
    upd_keys AS (
      SELECT doc_id FROM documents WHERE doc_id % 3 = 0 AND doc_id % 7 = 0
      UNION ALL
      SELECT doc_id FROM documents
      WHERE doc_id % 3 = 0 AND doc_id % 11 = 0 AND doc_id % 7 <> 0
    )
    SELECT b.doc_id,
           b.text,
           'delete' AS _change_type,
           2 AS _change_version
    FROM base b JOIN upd_keys u USING (doc_id)
    UNION ALL
    SELECT doc_id,
           'REDACTED ' || text AS text,
           'insert' AS _change_type,
           2 AS _change_version
    FROM documents WHERE doc_id % 3 = 0 AND doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id,
           text,
           'insert' AS _change_type,
           2 AS _change_version
    FROM documents WHERE doc_id % 13 = 0 AND doc_id % 3 <> 0
"""


@register("table_changes_cdc", _CDC_SQL)
def table_changes_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch -> MERGE -> read_changelog round trip, value-checked against a
    DuckDB-computed diff (round-6 verdict item 3).

    Sequence: commit the %3 documents slice as v1, MERGE a deterministic
    redaction batch (updates: %21 keys get 'REDACTED ' prefixed text;
    deletes: %33 keys not already updated; inserts: fresh +2e6 keys) as
    v2, then read the row-level changelog over (1, 2].  The changelog
    must emit exactly: one delete per matched key carrying the PRE-merge
    value, one insert per update with the post-merge value, one insert
    per fresh key — and nothing for the survivors, which appear
    identically in the rewritten and replacement files and cancel in the
    EXCEPT ALL diff.  The oracle computes that exact multiset from the
    static table, so any drift in merge row handling, changelog diffing,
    or version tagging is a driver-red hash mismatch."""
    from moira_spark.harness import load
    from moira_spark.sources.tableio import SnapshotTable

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="moira_cdc_check_")
    try:
        t = SnapshotTable(f"{work}/t")
        t.stage(docs.filter(F.col("doc_id") % 3 == 0), "base")
        t.commit(spark, "base")  # v1

        updates = (
            docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 7 == 0))
            .select(
                "doc_id",
                F.concat(F.lit("REDACTED "), F.col("text")).alias("text"),
                F.lit(False).alias("is_del"),
            )
            .unionByName(
                docs.filter(
                    (F.col("doc_id") % 3 == 0)
                    & (F.col("doc_id") % 11 == 0)
                    & (F.col("doc_id") % 7 != 0)
                ).select(
                    "doc_id",
                    F.lit(None).cast("string").alias("text"),
                    F.lit(True).alias("is_del"),
                )
            )
            .unionByName(
                docs.filter(
                    (F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 3 != 0)
                ).select(
                    (F.col("doc_id") + 2000000).alias("doc_id"),
                    "text",
                    F.lit(False).alias("is_del"),
                )
            )
        )
        t.merge(spark, updates, ["doc_id"], merge_id="cdc-1", delete_col="is_del")

        out = t.read_changelog(spark, 1).select(
            "doc_id", "text", "_change_type", "_change_version"
        )
        # materialize before the workdir is removed (the driver collects
        # AFTER this function returns)
        return spark.createDataFrame(
            out.collect(),
            schema=(
                "doc_id long, text string, _change_type string, "
                "_change_version int"
            ),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register("table_lifecycle_compose", None)
def table_lifecycle_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table-lifecycle COMPOSITION under the driver harness (round-6
    verdict item 8): ingest -> redaction MERGE -> changelog consumption ->
    Z-order compaction -> tag publish -> rollback -> vacuum, value-checked
    at every seam on ONE table.  The pieces each have their own query
    (table_maintenance_lifecycle, table_merge_upsert, table_changes_cdc);
    composition is where table bugs hide — a merge that poisons
    compaction's stats, a rollback that breaks tag retention, a vacuum
    that eats a tagged post-merge version.  Hard-fails in-query on any
    invariant, so the rows-only driver row is meaningful."""
    import os

    from moira_spark.sources.tableio import SnapshotTable

    work = tempfile.mkdtemp(prefix="moira_compose_check_")
    try:
        t = SnapshotTable(f"{work}/t")
        mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
            F.col("id").alias("k"),
            (F.col("id") % 16).alias("g"),
            F.concat(F.lit("text-"), F.col("id")).alias("txt"),
        )
        t.stage(mk(0, 100), "r1")
        t.commit(spark, "r1")  # v1
        t.stage(mk(100, 200), "r2")
        t.commit(spark, "r2")  # v2

        # redaction merge: update every %10 key, delete every %17 key
        # (disjoint from the updates), insert 10 fresh keys
        upd = (
            mk(0, 200)
            .filter((F.col("k") % 10 == 0))
            .select("k", "g", F.lit("[REDACTED]").alias("txt"),
                    F.lit(False).alias("is_del"))
            .unionByName(
                mk(0, 200)
                .filter((F.col("k") % 17 == 0) & (F.col("k") % 10 != 0))
                .select("k", "g", F.lit(None).cast("string").alias("txt"),
                        F.lit(True).alias("is_del"))
            )
            .unionByName(
                # fresh keys INSIDE the existing key range: out-of-range
                # inserts would stretch the z domain and (correctly,
                # uniform cells are not quantiles) wreck k-slice pruning
                mk(200, 210).select(
                    "k", "g", "txt", F.lit(False).alias("is_del"))
            )
        )
        merged = t.merge(spark, upd, ["k"], merge_id="redact", delete_col="is_del")
        n_del = 10  # 12 %17-keys in [0,200) minus the %10 overlaps (0, 170)
        n_upd, n_ins = 20, 10
        rows_v3 = 200 - n_del + n_ins
        got_v3 = t.read(spark).count()
        if not (merged.version == 3 and got_v3 == rows_v3):
            raise AssertionError(
                f"merge state wrong: v{merged.version}, {got_v3} rows "
                f"(want {rows_v3})"
            )

        # changelog over the merge reconstructs v3 from v2 exactly
        state = {
            r["k"]: r["txt"] for r in t.read(spark, version=2).collect()
        }
        log = t.read_changelog(spark, 2, 3).collect()
        for r in sorted(log, key=lambda r: r["_change_type"] == "insert"):
            if r["_change_type"] == "delete":
                if state.pop(r["k"]) != r["txt"]:
                    raise AssertionError("changelog delete carries wrong value")
            else:
                state[r["k"]] = r["txt"]
        truth = {r["k"]: r["txt"] for r in t.read(spark).collect()}
        if state != truth:
            raise AssertionError("changelog replay diverged from the table")
        n_changes = len(log)
        if n_changes != n_del + 2 * n_upd + n_ins:
            raise AssertionError(
                f"changelog emitted {n_changes} rows, want "
                f"{n_del + 2 * n_upd + n_ins}"
            )

        # Z-order compaction AFTER the merge: data identical, both dims
        # prune files sublinearly using the snapshot's own column stats
        pre = sorted((r["k"], r["txt"]) for r in t.read(spark).collect())
        zsnap = t.compact(spark, target_partitions=4,
                          cluster_by=["k", "g"], zorder=True)  # v4
        post = sorted((r["k"], r["txt"]) for r in t.read(spark).collect())
        if pre != post:
            raise AssertionError("z-order compaction changed table contents")
        files_k = len(t.read(spark, filters=[("k", "between", (40, 60))])
                      .inputFiles())
        files_g = len(t.read(spark, filters=[("g", "==", 3)]).inputFiles())
        n_files = len(zsnap.file_stats[zsnap.run_ids[0]])
        if not (n_files == 4 and files_k < n_files and files_g < n_files):
            raise AssertionError(
                f"z-order pruning weak after merge: k={files_k}, "
                f"g={files_g} of {n_files}"
            )

        # publish the compacted version, keep ingesting, then undo
        t.tag("published", zsnap.version)
        t.stage(mk(300, 350), "r3")
        t.commit(spark, "r3")  # v5
        rb = t.rollback(zsnap.version)  # v6
        if t.is_committed("r3") or t.read(spark).count() != rows_v3:
            raise AssertionError("rollback did not cleanly undo the append")

        # vacuum to the minimum window: the tagged publish must survive,
        # the rolled-back run dir and the merge-retired dirs must go
        removed = t.vacuum(retain_last=1, min_age_seconds=0)
        tag_read = t.read(spark, tag="published").count()
        if tag_read != rows_v3:
            raise AssertionError("tagged publish did not survive vacuum")
        final = t.read(spark)
        n_final = final.count()
        sum_k = final.agg(F.sum("k").cast("long").alias("s")).collect()[0]["s"]
        row = {
            "versions": rb.version,
            "rows_final": n_final,
            "sum_k_final": sum_k,
            "changelog_rows": n_changes,
            "zorder_files_k": files_k,
            "zorder_files_g": files_g,
            "dirs_vacuumed": len(removed),
            "tag_rows": tag_read,
            "data_dirs_left": sum(
                1 for e in os.listdir(t.data_dir) if e.startswith("run_id=")
            ),
        }
        return spark.createDataFrame(
            [row],
            schema=(
                "versions int, rows_final long, sum_k_final long, "
                "changelog_rows int, zorder_files_k int, zorder_files_g int, "
                "dirs_vacuumed int, tag_rows long, data_dirs_left int"
            ),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# The oracle computes the FINAL per-source stats from the same
# deterministic mutation plan the Spark side executes as real table
# operations: base = the %3 slice, a merge-on-read redaction (updates %21
# keys to n_chars+1000, deletes %33-not-%7 keys, inserts fresh %13 keys),
# then an append of the %3==1 slice.  The Spark side never aggregates the
# table — it folds the CDC changelog's signed deltas, so the hash match
# proves changelog-driven materialized-view maintenance converges to the
# table's truth.
_MATVIEW_SQL = """
    WITH state AS (
      SELECT doc_id,
             doc_id % 5 AS src,
             CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000
                  ELSE n_chars END AS n_chars
      FROM documents
      WHERE doc_id % 3 = 0 AND NOT (doc_id % 11 = 0 AND doc_id % 7 <> 0)
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, doc_id % 5 AS src, n_chars
      FROM documents WHERE doc_id % 13 = 0 AND doc_id % 3 <> 0
      UNION ALL
      SELECT doc_id, doc_id % 5 AS src, n_chars
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT src,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM state GROUP BY src
"""


@register("table_cdc_matview", _MATVIEW_SQL)
def table_cdc_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog-driven MATERIALIZED-VIEW maintenance (round 6): the
    downstream consumer read_changelog exists for.  A per-source stats
    view is maintained purely from CDC delete/insert rows — one signed
    aggregation over the changelog, never a rescan of the table — across
    an append, a MERGE-ON-READ redaction (update + delete + insert via an
    equality-delete file), and a second append.

    Because count/sum are linear, folding the signed deltas of the whole
    range IS incremental maintenance (per-batch folding composes the same
    way); the in-query gate additionally hard-fails unless the folded
    view is row-identical to a direct aggregate of the final table, and
    the DuckDB oracle value-checks the result against fixture math."""
    from moira_spark.harness import load
    from moira_spark.sources.tableio import SnapshotTable

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 5).alias("src"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    work = tempfile.mkdtemp(prefix="moira_matview_check_")
    try:
        t = SnapshotTable(f"{work}/t")
        t.stage(docs.filter(F.col("doc_id") % 3 == 0), "base")
        t.commit(spark, "base")  # v1

        updates = (
            docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 7 == 0))
            .select(
                "doc_id", "src",
                (F.col("n_chars") + 1000).alias("n_chars"),
                F.lit(False).alias("is_del"),
            )
            .unionByName(
                docs.filter(
                    (F.col("doc_id") % 3 == 0)
                    & (F.col("doc_id") % 11 == 0)
                    & (F.col("doc_id") % 7 != 0)
                ).select(
                    "doc_id", "src",
                    F.lit(None).cast("long").alias("n_chars"),
                    F.lit(True).alias("is_del"),
                )
            )
            .unionByName(
                docs.filter(
                    (F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 3 != 0)
                ).select(
                    (F.col("doc_id") + 2000000).alias("doc_id"),
                    "src", "n_chars", F.lit(False).alias("is_del"),
                )
            )
        )
        t.merge(spark, updates, ["doc_id"], merge_id="redact",
                delete_col="is_del", mode="mor")  # v2
        t.stage(docs.filter(F.col("doc_id") % 3 == 1), "late")
        t.commit(spark, "late")  # v3

        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        mv = (
            t.read_changelog(spark, 0)
            .groupBy("src")
            .agg(
                F.sum(sign).cast("bigint").alias("n_docs"),
                F.sum(sign * F.col("n_chars")).cast("bigint").alias("sum_chars"),
            )
            # a source whose inserts and deletes cancel completely leaves
            # the view (matches the direct aggregate, which never saw it)
            .filter(F.col("n_docs") > 0)
        )
        direct = (
            t.read(spark)
            .groupBy("src")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
            )
        )
        drift = (
            mv.exceptAll(direct).count() + direct.exceptAll(mv).count()
        )
        if drift:
            raise AssertionError(
                f"changelog-maintained view drifted from the table by "
                f"{drift} rows"
            )
        return spark.createDataFrame(
            mv.collect(), "src bigint, n_docs bigint, sum_chars bigint"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
