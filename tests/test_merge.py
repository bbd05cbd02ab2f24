"""MERGE (copy-on-write upsert with run-dir pruning) on SnapshotTable —
matched-run rewrite only, delete clause, idempotency, time travel, CAS
semantics (moira_spark/sources/tableio.py merge)."""

from __future__ import annotations

import pytest

from moira_spark.sources.tableio import SnapshotTable


def _table(spark, tmp_path, runs):
    t = SnapshotTable(str(tmp_path / "t"))
    for run_id, rows in runs:
        df = spark.createDataFrame(rows, "k long, v string")
        t.stage(df, run_id)
        t.commit(spark, run_id)
    return t


def _rows(spark, t, version=None):
    df = t.read(spark, version=version)
    if df is None:
        return {}
    rows = df.collect()
    out = {r["k"]: r["v"] for r in rows}
    # a duplicate key (old survivor + replacement both present) must fail
    # the comparison, not collapse into one dict entry
    assert len(out) == len(rows), f"duplicate keys in table: {sorted(rows)}"
    return out


class TestMerge:
    def test_upsert_updates_and_inserts(self, spark, tmp_path):
        t = _table(
            spark,
            tmp_path,
            [("r1", [(1, "a"), (2, "b")]), ("r2", [(3, "c"), (4, "d")])],
        )
        upd = spark.createDataFrame([(2, "B"), (9, "new")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m1")
        assert _rows(spark, t) == {1: "a", 2: "B", 3: "c", 4: "d", 9: "new"}
        assert snap.version == 3

    def test_untouched_run_dirs_stay_referenced(self, spark, tmp_path):
        # the COW file-pruning property: updates hit only r1's keys, so
        # r2's original run dir must survive in the new snapshot while r1
        # is retired
        t = _table(
            spark,
            tmp_path,
            [("r1", [(1, "a"), (2, "b")]), ("r2", [(3, "c"), (4, "d")])],
        )
        upd = spark.createDataFrame([(1, "A")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m1")
        assert "r2" in snap.run_ids
        assert "r1" not in snap.run_ids and "r1" in snap.retired_run_ids
        assert snap.row_counts["r2"] == 2  # carried, not recounted
        assert _rows(spark, t) == {1: "A", 2: "b", 3: "c", 4: "d"}

    def test_delete_clause(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b"), (3, "c")])])
        upd = spark.createDataFrame(
            [(1, "A", False), (2, None, True)], "k long, v string, is_delete boolean"
        )
        t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_delete")
        assert _rows(spark, t) == {1: "A", 3: "c"}

    def test_idempotent_rerun(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        upd = spark.createDataFrame([(1, "A")], "k long, v string")
        s1 = t.merge(spark, upd, ["k"], merge_id="m1")
        s2 = t.merge(spark, upd, ["k"], merge_id="m1")  # crash-and-rerun
        assert s2.version == s1.version
        assert _rows(spark, t) == {1: "A"}

    def test_time_travel_to_pre_merge_state(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        pre = t.latest_snapshot().version
        upd = spark.createDataFrame([(1, "A")], "k long, v string")
        t.merge(spark, upd, ["k"], merge_id="m1")
        assert _rows(spark, t, version=pre) == {1: "a", 2: "b"}
        assert _rows(spark, t) == {1: "A", 2: "b"}

    def test_duplicate_update_keys_raise(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        upd = spark.createDataFrame([(1, "A"), (1, "B")], "k long, v string")
        with pytest.raises(ValueError, match="duplicate keys"):
            t.merge(spark, upd, ["k"], merge_id="m1")

    def test_bootstrap_merge_into_empty_table(self, spark, tmp_path):
        t = SnapshotTable(str(tmp_path / "t"))
        upd = spark.createDataFrame([(1, "a")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m0")
        assert snap.version == 1
        assert _rows(spark, t) == {1: "a"}

    def test_insert_only_merge_keeps_every_existing_run(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a")]), ("r2", [(2, "b")])])
        upd = spark.createDataFrame([(9, "z")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m1")
        assert {"r1", "r2"}.issubset(set(snap.run_ids))
        assert snap.retired_run_ids == []
        assert _rows(spark, t) == {1: "a", 2: "b", 9: "z"}

    def test_schema_evolution_on_merge(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        upd = spark.createDataFrame(
            [(2, "B", 7)], "k long, v string, score int"
        )
        t.merge(spark, upd, ["k"], merge_id="m1")
        rows = {r["k"]: r for r in t.read(spark).collect()}
        assert rows[2]["score"] == 7
        assert rows[1]["score"] is None  # survivor reads NULL for new column
        assert rows[1]["v"] == "a"

    def test_merge_then_resume_guard_still_recognizes_retired_runs(
        self, spark, tmp_path
    ):
        # the streaming replay guard checks is_committed(run_id); a run
        # retired by merge must still count as done
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        upd = spark.createDataFrame([(1, "A")], "k long, v string")
        t.merge(spark, upd, ["k"], merge_id="m1")
        assert t.is_committed("r1")

    def test_null_delete_flag_means_update_not_delete(self, spark, tmp_path):
        # SQL MERGE's WHEN MATCHED AND <cond> treats NULL as false: a NULL
        # is_delete row must UPDATE its match, never silently delete it
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        upd = spark.createDataFrame(
            [(2, "B", None)], "k long, v string, is_delete boolean"
        )
        t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_delete")
        assert _rows(spark, t) == {1: "a", 2: "B"}

    def test_null_key_raises(self, spark, tmp_path):
        # an equality MERGE can never match a NULL key; inserting it
        # silently on every merge would be data corruption, so raise
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        upd = spark.createDataFrame([(None, "x")], "k long, v string")
        with pytest.raises(ValueError, match="NULL in a merge key"):
            t.merge(spark, upd, ["k"], merge_id="m1")

    def test_distinct_null_keys_do_not_false_trip_duplicate_guard(
        self, spark, tmp_path
    ):
        # two different NULL-key rows must report the NULL-key error, not
        # a bogus "duplicate keys" (distinct() treats NULL == NULL)
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        upd = spark.createDataFrame(
            [(None, "x"), (None, "y")], "k long, v string"
        )
        with pytest.raises(ValueError, match="NULL in a merge key"):
            t.merge(spark, upd, ["k"], merge_id="m1")

    def test_merge_cas_race_keeps_concurrent_append(
        self, spark, tmp_path, monkeypatch
    ):
        # A plain append lands between merge's snapshot read and its CAS
        # write: the merge must lose, retry from the fresh snapshot, and
        # the concurrently appended rows must survive into the result.
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        real_write = SnapshotTable._write_snapshot
        fired = {"done": False}

        def racing_write(self_, snap):
            if not fired["done"] and str(snap.run_ids[-1]).startswith("merge-"):
                fired["done"] = True
                other = SnapshotTable(self_.table_dir)
                other.stage(
                    spark.createDataFrame([(7, "g")], "k long, v string"), "r9"
                )
                other.commit(spark, "r9")  # wins the CAS
            return real_write(self_, snap)

        monkeypatch.setattr(SnapshotTable, "_write_snapshot", racing_write)
        upd = spark.createDataFrame([(2, "B")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m1")
        assert fired["done"]
        assert _rows(spark, t) == {1: "a", 2: "B", 7: "g"}
        assert "r9" in snap.run_ids  # the winner's append is referenced


class TestMergeZoneMapPruning:
    """merge() consults committed zone-map key stats before scanning: runs
    whose key range provably misses every update key are never read (and
    an all-miss merge is a pure insert that scans nothing)."""

    def test_out_of_range_merge_is_pure_insert(self, spark, tmp_path):
        t = _table(
            spark, tmp_path,
            [("r1", [(1, "a"), (2, "b")]), ("r2", [(3, "c"), (4, "d")])],
        )
        upd = spark.createDataFrame([(500, "new")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m-insert")
        # every committed run survives unrewritten; nothing retired
        assert "r1" in snap.run_ids and "r2" in snap.run_ids
        assert snap.retired_run_ids == []
        assert _rows(spark, t) == {1: "a", 2: "b", 3: "c", 4: "d", 500: "new"}

    def test_range_pruned_run_keeps_its_stats(self, spark, tmp_path):
        t = _table(
            spark, tmp_path,
            [("r1", [(1, "a"), (2, "b")]), ("r2", [(30, "c"), (40, "d")])],
        )
        upd = spark.createDataFrame([(30, "C")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m-prune")
        # r1's key range [1,2] provably misses key 30: untouched, stats kept
        assert "r1" in snap.run_ids and "r1" in snap.column_stats
        assert snap.column_stats["r1"]["k"] == {"min": 1, "max": 2, "nulls": 0}
        assert "r2" in snap.retired_run_ids
        assert _rows(spark, t) == {1: "a", 2: "b", 30: "C", 40: "d"}
        # zone-map read over the post-merge table still prunes correctly
        assert sorted(
            r.k for r in t.read(spark, filters=[("k", "<=", 2)]).collect()
        ) == [1, 2]


class TestReadChangelog:
    """Row-level CDC over merge snapshots (round-6 verdict item 3):
    read_changes refuses a merge in range; read_changelog emits the
    Iceberg-changelog delete+insert rows instead."""

    def _changes(self, spark, t, frm, to=None):
        rows = t.read_changelog(spark, frm, to).collect()
        return sorted(
            (r["_change_version"], r["_change_type"], r["k"], r["v"])
            for r in rows
        )

    def test_append_only_range_is_all_inserts(self, spark, tmp_path):
        t = _table(
            spark, tmp_path,
            [("r1", [(1, "a"), (2, "b")]), ("r2", [(3, "c")])],
        )
        assert self._changes(spark, t, 1) == [(2, "insert", 3, "c")]
        # bootstrap from 0 replays every append
        assert self._changes(spark, t, 0) == [
            (1, "insert", 1, "a"),
            (1, "insert", 2, "b"),
            (2, "insert", 3, "c"),
        ]

    def test_merge_emits_delete_insert_pairs(self, spark, tmp_path):
        t = _table(
            spark, tmp_path,
            [("r1", [(1, "a"), (2, "b")]), ("r2", [(3, "c"), (4, "d")])],
        )
        upd = spark.createDataFrame(
            [(2, "B", False), (4, None, True), (9, "new", False)],
            "k long, v string, is_del boolean",
        )
        t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_del")
        # update k=2: delete+insert pair; delete k=4: pure delete;
        # upsert k=9: pure insert; survivors (1,3) cancel exactly
        assert self._changes(spark, t, 2) == [
            (3, "delete", 2, "b"),
            (3, "delete", 4, "d"),
            (3, "insert", 2, "B"),
            (3, "insert", 9, "new"),
        ]

    def test_changelog_replay_reconstructs_the_table(self, spark, tmp_path):
        # inserts minus deletes from v0 == the table at HEAD: the
        # invariant every downstream CDC consumer relies on
        t = _table(
            spark, tmp_path,
            [("r1", [(1, "a"), (2, "b")]), ("r2", [(3, "c"), (4, "d")])],
        )
        upd = spark.createDataFrame(
            [(1, "A", False), (3, None, True)], "k long, v string, is_del boolean"
        )
        t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_del")
        log = self._changes(spark, t, 0)
        state: dict = {}
        for _, kind, k, v in log:  # versions ascend in the sort
            if kind == "insert":
                state[k] = v
            else:
                assert state.pop(k) == v
        assert state == _rows(spark, t)

    def test_compact_in_range_adds_nothing(self, spark, tmp_path):
        t = _table(
            spark, tmp_path,
            [("r1", [(1, "a")]), ("r2", [(2, "b")])],
        )
        t.compact(spark)
        assert self._changes(spark, t, 2) == []
        assert self._changes(spark, t, 0) == [
            (1, "insert", 1, "a"),
            (2, "insert", 2, "b"),
        ]

    def test_rollback_in_range_refuses(self, spark, tmp_path):
        t = _table(
            spark, tmp_path,
            [("r1", [(1, "a")]), ("r2", [(2, "b")])],
        )
        t.rollback(1)
        with pytest.raises(ValueError, match="rollback"):
            t.read_changelog(spark, 1)

    def test_vacuumed_merge_history_refuses_with_remedy(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        upd = spark.createDataFrame([(1, "A")], "k long, v string")
        t.merge(spark, upd, ["k"], merge_id="m1")
        t.stage(spark.createDataFrame([(5, "e")], "k long, v string"), "r3")
        t.commit(spark, "r3")
        removed = t.vacuum(retain_last=1, min_age_seconds=0)
        assert removed  # r1's retired dir is gone
        with pytest.raises(ValueError, match="expired by vacuum"):
            t.read_changelog(spark, 1)

    def test_schema_evolution_reads_under_to_schema(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        upd = spark.createDataFrame(
            [(2, "B", 7)], "k long, v string, extra long"
        )
        t.merge(spark, upd, ["k"], merge_id="m1")
        rows = t.read_changelog(spark, 1).collect()
        got = sorted(
            (r["_change_type"], r["k"], r["v"], r["extra"]) for r in rows
        )
        # the pre-merge delete row backfills NULL in the evolved column
        assert got == [("delete", 2, "b", None), ("insert", 2, "B", 7)]

    def test_empty_range_returns_typed_empty_frame(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        df = t.read_changelog(spark, 1)
        assert df.count() == 0
        assert "_change_type" in df.columns and "k" in df.columns
