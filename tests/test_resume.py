"""Crash/resume semantics (SURVEY.md §5.2: resume test) + snapshot IO."""

from __future__ import annotations

import os

import pytest

from moira_spark.datagen import transcripts as tg
from moira_spark.job import run_filter_job
from moira_spark.sources.tableio import SnapshotTable

N_TURNS = 3000


def _final_state(spark, table: SnapshotTable):
    df = table.read(spark)
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pdf


class TestSnapshotTable:
    def test_read_before_any_commit(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        assert t.read(spark) is None

    def test_stage_without_commit_is_invisible(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        df = spark.range(5).toDF("x")
        t.stage(df, "r1")
        assert t.read(spark) is None  # no snapshot -> invisible
        t.commit(spark, "r1")
        assert t.read(spark).count() == 5

    def test_commit_idempotent(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.stage(spark.range(3).toDF("x"), "r1")
        s1 = t.commit(spark, "r1")
        s2 = t.commit(spark, "r1")
        assert s1.version == s2.version == 1
        assert t.read(spark).count() == 3

    def test_multiple_runs_union(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.stage(spark.range(3).toDF("x"), "r1")
        t.commit(spark, "r1")
        t.stage(spark.range(4).toDF("x"), "r2")
        t.commit(spark, "r2")
        assert t.read(spark).count() == 7
        assert t.latest_snapshot().version == 2

    def test_time_travel(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        t.stage(spark.range(3).toDF("x"), "r1")
        t.commit(spark, "r1")
        t.stage(spark.range(4).toDF("x"), "r2")
        t.commit(spark, "r2")
        assert t.read(spark, version=1).count() == 3  # as-of v1
        assert t.read(spark, version=2).count() == 7
        assert t.read(spark, version=99) is None


class TestResume:
    def test_crash_then_resume_identical(self, spark, tmp_path):
        src = tg.gen_spark(spark, N_TURNS)

        # reference: single uninterrupted job
        ref_table = run_filter_job(spark, src, str(tmp_path / "ref"), "runA")
        ref = _final_state(spark, ref_table)

        # crashed job: dies after 2 of 4 buckets...
        out_dir = str(tmp_path / "crashy")
        with pytest.raises(RuntimeError, match="injected crash"):
            run_filter_job(
                spark, src, out_dir, "runA", fail_after_buckets=2
            )
        partial = SnapshotTable(f"{out_dir}/labels")
        n_partial = partial.read(spark).count()
        assert 0 < n_partial < len(ref)

        # ...then resumes: completes only the missing buckets
        resumed_table = run_filter_job(spark, src, out_dir, "runA")
        resumed = _final_state(spark, resumed_table)

        assert len(resumed) == len(ref)
        for col in ("conv_id", "turn_idx", "keep", "scrubbed_text", "conv_keep"):
            assert resumed[col].tolist() == ref[col].tolist(), col

        # re-running a completed job changes nothing (idempotence)
        again = _final_state(spark, run_filter_job(spark, src, out_dir, "runA"))
        assert again["scrubbed_text"].tolist() == ref["scrubbed_text"].tolist()
        # audit: one committed run per bucket, no duplicates
        audit = SnapshotTable(f"{out_dir}/audit").read(spark).toPandas()
        assert sorted(audit.snapshot_bucket.unique().tolist()) == [0, 1, 2, 3]

    def test_conversation_atomicity(self, spark, tmp_path):
        """Every conversation is judged whole inside one bucket: the bucketed
        job's verdicts equal the single-pipeline verdicts."""
        from moira_spark.oracle import ref_pipeline as orc

        src = tg.gen_spark(spark, N_TURNS)
        table = run_filter_job(spark, src, str(tmp_path / "atom"), "runB")
        got = _final_state(spark, table)
        ref = orc.run(tg.gen_pandas(N_TURNS)).sort_values(
            ["conv_id", "turn_idx"]
        ).reset_index(drop=True)
        assert got.keep.tolist() == ref.keep.tolist()
        assert got.conv_keep.tolist() == ref.conv_keep.tolist()
        assert got.scrubbed_text.tolist() == ref.scrubbed_text.tolist()
