"""Snapshot-committed table IO — Iceberg-semantics emulation over parquet.

The north rule requires Iceberg tables with snapshot-based idempotent resume
(BASELINE.json:6,14).  This sandbox has no Iceberg jars and no network
(verified — SURVEY.md §7.6), so this module implements the same protocol on
plain parquet with an atomic JSON snapshot log, behind a thin interface so a
real Iceberg catalog is a drop-in replacement later:

    table_dir/
      data/run_id=<run>/part-*.parquet     (staged by Spark writers)
      _snapshots/v<N>.json                 (atomic commit records)
      _snapshots/LATEST                    (pointer, written last via rename)

A snapshot lists the data directories (by run_id) that are part of the table
plus bookkeeping (row counts, committed conversation-partition ids).  Readers
resolve LATEST and read only committed run dirs — a crashed writer leaves an
orphaned staging dir that no snapshot references, so re-running the same
run_id is idempotent: the orphan is overwritten, and commit happens once.
This is exactly Iceberg's optimistic snapshot protocol with run-directory
granularity instead of per-file manifests (sufficient here because each run
writes its own directory).  Snapshots also carry Iceberg-style column
metrics (zone maps): per-run min/max/null-count collected at commit, so
``read(filters=...)`` and ``merge`` skip whole run dirs whose stats prove
they cannot match — manifest-level file skipping, the scan-side half of
what makes a 100 TB table queryable.

Concurrency (round 3): snapshot files are created with an atomic
link-if-absent (full content written to a temp file first, then os.link —
which fails with FileExistsError when the version already exists).  A commit
or compaction that loses the race re-reads the fresh snapshot and retries
with the next version, exactly Iceberg's CAS commit loop; the loser of a
compact-vs-append race therefore re-folds the appended rows instead of
silently dropping them.  LATEST is a convenience hint; readers resolve the
maximum v<N>.json so a stale pointer can never hide a committed snapshot.
"""

from __future__ import annotations

import json
import math
import os
import tempfile
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass
class Snapshot:
    version: int
    run_ids: list[str]
    committed_keys: list[str] = field(default_factory=list)
    row_counts: dict[str, int] = field(default_factory=dict)
    # Iceberg-style manifest column metrics: per run_id, per column,
    # {"min":…, "max":…, "nulls": n} for prunable atomic types ({"u": true}
    # for types stats cannot cover).  A column absent from a run's dict was
    # not in the run's schema at commit time (schema evolution), so every
    # row of that run reads NULL there.  Collected by an exact Spark agg at
    # commit (parquet footer string min/max may be TRUNCATED by writers,
    # which would make max-based pruning unsound — so footers are not
    # trusted).  Legacy snapshots (no stats) simply never prune.
    column_stats: dict[str, dict] = field(default_factory=dict)
    # Finer grain of the same metrics: per run_id, per FILE basename, the
    # same {col: entry} dict.  read(filters=...) uses these to plan
    # individual surviving files within a kept run — with cluster_by
    # (sorted write) the files carry disjoint ranges and a point/range
    # query plans one file of N (Iceberg file-level manifest pruning).
    file_stats: dict[str, dict] = field(default_factory=dict)
    # run_ids whose DATA was folded into a compaction rewrite: no longer
    # read, but their commit is still a fact — is_committed()/commit()
    # must keep treating them as done or a checkpoint-replayed micro-batch
    # would re-commit (and duplicate) after a compact().
    retired_run_ids: list[str] = field(default_factory=list)
    # Iceberg-style schema evolution: the table schema lives in the
    # snapshot METADATA (StructType JSON), not in parquet footers.  Readers
    # apply it explicitly, so runs committed before a column was added
    # read back with NULLs in the new column and no footer-merge scan ever
    # happens (mergeSchema=true reads every file's footer — wrong at 100 TB).
    schema_json: str | None = None
    # Iceberg-style EQUALITY-DELETE files (merge-on-read): each entry is
    # {"run": <delete-run-id>, "key_cols": [...], "applies_to": [run_ids]}.
    # The delete run dir holds only the key tuples; readers anti-join it
    # against exactly the runs listed in applies_to (the data files that
    # existed when the delete was written — Iceberg's sequence-number
    # scoping, made explicit).  compact() folds deletes into a rewrite and
    # clears this list; a MOR merge is O(update keys), never an
    # O(run-dir) rewrite.
    delete_files: list[dict] = field(default_factory=list)
    # What produced this snapshot: "append" (commit), "compact"
    # (data-identical rewrite), "merge" (logical rewrite).  Drives
    # read_changes(): Iceberg's incremental scan consumes appends, skips
    # data-identical rewrites, and refuses logical rewrites.  None = legacy
    # snapshot written before the field existed (read_changes infers
    # conservatively from retired_run_ids growth).
    operation: str | None = "append"

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "run_ids": self.run_ids,
                "committed_keys": self.committed_keys,
                "row_counts": self.row_counts,
                "retired_run_ids": self.retired_run_ids,
                "schema_json": self.schema_json,
                "column_stats": self.column_stats,
                "file_stats": self.file_stats,
                "operation": self.operation,
                "delete_files": self.delete_files,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        return Snapshot(
            version=d["version"],
            run_ids=d["run_ids"],
            committed_keys=d.get("committed_keys", []),
            row_counts=d.get("row_counts", {}),
            retired_run_ids=d.get("retired_run_ids", []),
            schema_json=d.get("schema_json"),
            column_stats=d.get("column_stats", {}),
            file_stats=d.get("file_stats", {}),
            operation=d.get("operation"),
            delete_files=d.get("delete_files", []),
        )


_CAS_RETRIES = 10


class SnapshotConflictError(RuntimeError):
    """Another writer committed this snapshot version first (CAS lost)."""


def _evolve_schema(prev_json: str | None, staged: "StructType") -> str:
    """Iceberg-style additive schema evolution: fields are matched by name,
    new fields append, and a same-name type change is refused (Iceberg only
    allows safe type promotions; this emulation allows none).  Returns the
    merged schema as StructType JSON for the snapshot record."""
    from pyspark.sql.types import StructType

    if prev_json is None:
        return staged.json()
    prev = StructType.fromJson(json.loads(prev_json))
    by_name = {f.name: f for f in prev.fields}
    merged = list(prev.fields)
    for f in staged.fields:
        old = by_name.get(f.name)
        if old is None:
            merged.append(f)
        elif old.dataType != f.dataType:
            raise ValueError(
                f"schema evolution rejected: column {f.name!r} changes type "
                f"{old.dataType.simpleString()} -> {f.dataType.simpleString()}"
            )
    return StructType(merged).json()


def _stats_kind(dt) -> "str | None":
    """How zone maps cover a type: "plain" for JSON-native totally-ordered
    atomics, "ts" for date/timestamp (serialized as ISO strings, whose
    lexicographic order is chronological), None for everything else
    (decimals, complex types — recorded as present-but-unprunable)."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DecimalType,
        NumericType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    if isinstance(dt, (StringType, BooleanType)) or (
        isinstance(dt, NumericType) and not isinstance(dt, DecimalType)
    ):
        return "plain"
    if isinstance(dt, (DateType, TimestampType, TimestampNTZType)):
        return "ts"
    return None


def _to_iso(v):
    """date/datetime -> ISO string (tz-aware normalized to UTC and stripped,
    so every stored bound lives in one naive-UTC domain — the session
    timezone is pinned UTC by session.py)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _iso_full(v) -> "str | None":
    """Widen an ISO date ("YYYY-MM-DD") to its midnight timestamp — EXACT,
    not conservative: SQL comparisons cast a date to timestamp-at-midnight,
    so both bounds and literals land in one comparable string domain."""
    if v is None:
        return None
    s = _to_iso(v)
    if not isinstance(s, str):
        return v  # non-temporal literal: left for the TypeError keep-path
    return s if "T" in s else s + "T00:00:00"


def _stats_entry(mn, mx, nulls, kind: str = "plain", us=None) -> dict:
    if kind == "ts":
        ent = {"min": _to_iso(mn), "max": _to_iso(mx), "nulls": nulls, "ts": True}
        # epoch-micros twin of the ISO bounds, computed JVM-side via
        # unix_micros under the UTC-pinned session — the z-order probe
        # space.  Storing it at commit time removes every Python-side
        # naive-datetime interpretation (host-tz drift, ADVICE r5).
        if us is not None and us[0] is not None:
            ent["us"] = [us[0], us[1]]
        return ent
    nonfinite = any(
        isinstance(v, float) and not math.isfinite(v) for v in (mn, mx)
    )
    if nonfinite:  # NaN/inf bounds are not JSON-portable ordering proof
        return {"u": True}
    return {"min": mn, "max": mx, "nulls": nulls}


def _collect_stats(df: DataFrame) -> tuple[int, dict, dict]:
    """One grouped agg pass over a staged run: per-FILE min/max/null-count
    for every stats-supported column (the per-file metrics an Iceberg
    writer emits into the manifest), folded driver-side into run-level
    stats.  The collect is bounded by the run's FILE count, never rows.
    Unsupported types record ``{"u": true}`` (present-but-unprunable —
    distinct from ABSENT, which means the column was not in the run's
    schema at all).  Returns ``(rows, run_stats, file_stats)`` with
    file_stats keyed by file basename."""
    from urllib.parse import unquote, urlparse

    aggs = [F.count(F.lit(1)).alias("__n")]
    tracked = [
        (f0.name, _stats_kind(f0.dataType))
        for f0 in df.schema.fields
        if _stats_kind(f0.dataType) is not None
    ]
    for i, (name, kind) in enumerate(tracked):
        aggs.append(F.min(df[name]).alias(f"__mn_{i}"))
        aggs.append(F.max(df[name]).alias(f"__mx_{i}"))
        aggs.append(F.sum(df[name].isNull().cast("long")).alias(f"__nl_{i}"))
        if kind == "ts":
            # epoch-micros bounds in the exact domain the z-order probe
            # uses (unix_micros, session tz pinned UTC) — JVM-computed so
            # no host-local naive-datetime round-trip can shift them
            aggs.append(
                F.unix_micros(F.min(df[name]).cast("timestamp"))
                .alias(f"__us_mn_{i}")
            )
            aggs.append(
                F.unix_micros(F.max(df[name]).cast("timestamp"))
                .alias(f"__us_mx_{i}")
            )
    per_file = df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    rows = 0
    file_stats: dict[str, dict] = {}
    for r in per_file:
        rows += r["__n"]
        ent: dict[str, dict] = {}
        for i, (name, kind) in enumerate(tracked):
            ent[name] = _stats_entry(
                r[f"__mn_{i}"], r[f"__mx_{i}"], r[f"__nl_{i}"] or 0, kind,
                us=(r[f"__us_mn_{i}"], r[f"__us_mx_{i}"]) if kind == "ts"
                else None,
            )
        for f0 in df.schema.fields:
            if f0.name not in ent:
                ent[f0.name] = {"u": True}
        file_stats[os.path.basename(unquote(urlparse(r["__f"]).path))] = ent
    run_stats: dict[str, dict] = {}
    for f0 in df.schema.fields:
        ents = [fs[f0.name] for fs in file_stats.values()]
        if not ents:
            continue  # empty run: no files grouped, no stats to fold
        if any(e.get("u") for e in ents):
            run_stats[f0.name] = {"u": True}
            continue
        mins = [e["min"] for e in ents if e["min"] is not None]
        maxs = [e["max"] for e in ents if e["max"] is not None]
        us_lo = [e["us"][0] for e in ents if e.get("us")]
        us_hi = [e["us"][1] for e in ents if e.get("us")]
        run_stats[f0.name] = {
            "min": min(mins) if mins else None,
            "max": max(maxs) if maxs else None,
            "nulls": sum(e["nulls"] for e in ents),
            **({"ts": True} if ents[0].get("ts") else {}),
            # fold the epoch-micros twin only when EVERY non-null file
            # carries it — a partial fold would understate the range
            **(
                {"us": [min(us_lo), max(us_hi)]}
                if us_lo and len(us_lo) == len(mins)
                else {}
            ),
        }
    return rows, run_stats, file_stats


_Z_BITS = 8  # 256 buckets/dim up to 7 dims; above that bits shrink so the
# interleave never reaches bigint's sign bit (see the cap in _zvalue)


def _zvalue(df: DataFrame, cols: "list[str]", bits: int = _Z_BITS,
            bounds: "dict[str, tuple] | None" = None):
    """Z-curve (Morton) ordering expression over ``cols``: bucket each
    column uniformly into ``2^bits`` cells between its min and max, then
    bit-interleave the bucket ids.  Pure JVM expressions — width_bucket +
    shifts inside codegen.

    Bounds come from ``bounds`` (``{col: (lo, hi)}`` floats in the same
    numeric space as the probe — see ``_zbounds_from_snapshot``) when the
    caller already knows them (compaction has the snapshot's column
    stats); columns without provided bounds fall back to one min/max
    aggregation — an output-tiny but INPUT-full scan, worth skipping on a
    100 TB rewrite.

    Uniform cells, not quantiles: the z value only orders the write, so
    skew costs pruning selectivity on the hot range, never correctness.
    NULLs and degenerate (constant/empty) columns bucket to 0."""
    dtypes = dict(df.dtypes)
    nums = []
    for c in cols:
        t = dtypes[c]
        if t.startswith(("timestamp", "date")):
            nums.append(F.unix_micros(F.col(c).cast("timestamp")).cast("double"))
        elif t in ("string", "binary"):
            # order-preserving 8-byte-prefix ordinal: the leading bytes,
            # ZERO-PADDED to exactly 8, as a big-endian unsigned integer.
            # The padding is what makes it monotone: unpadded, 'aa' (2
            # bytes = 24929) ranks above 'b' (1 byte = 98) even though
            # 'aa' < 'b' lexicographically — equal widths make integer
            # order equal byte-wise order.
            b = F.rpad(
                F.substring(F.col(c).cast("binary"), 1, 8),
                8,
                F.lit(bytes(1)),
            )
            nums.append(
                F.coalesce(
                    F.conv(F.hex(b), 16, 10).cast("double"), F.lit(0.0)
                )
            )
        elif t.startswith(("array", "map", "struct")):
            raise ValueError(f"zorder: column {c!r} ({t}) is not orderable "
                             "numerically; z-order needs scalar keys")
        else:
            nums.append(F.col(c).cast("double"))
    # never interleave into bit 63: a set sign bit makes half the key
    # space sort NEGATIVE under bigint ordering, silently inverting the
    # Z curve — shrink per-dim resolution instead when dims are many
    bits = min(bits, 63 // len(nums))
    have: dict = dict(bounds or {})
    need = [i for i, c in enumerate(cols) if c not in have]
    if need:
        aggs = []
        for i in need:
            aggs += [F.min(nums[i]).alias(f"mn{i}"),
                     F.max(nums[i]).alias(f"mx{i}")]
        r = df.agg(*aggs).collect()[0]
        for i in need:
            have[cols[i]] = (r[f"mn{i}"], r[f"mx{i}"])
    nb = 1 << bits
    z = F.lit(0).cast("bigint")
    for i, e in enumerate(nums):
        mn, mx = have[cols[i]]
        if mn is None or mx is None or mx == mn:
            continue  # constant/empty dim contributes nothing to the order
        b = (
            F.width_bucket(e, F.lit(float(mn)), F.lit(float(mx)), F.lit(nb))
            - 1
        )
        b = F.greatest(F.lit(0), F.least(F.lit(nb - 1), F.coalesce(b, F.lit(0))))
        b = b.cast("bigint")
        for bit in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1).cast("bigint")),
                    bit * len(nums) + i,
                )
            )
    return z


def _zbounds_from_snapshot(
    snap: "Snapshot", cols: "list[str]"
) -> "dict[str, tuple]":
    """Fold a snapshot's per-run column stats into ``{col: (lo, hi)}`` in
    _zvalue's probe space (floats; timestamps as unix micros; strings as
    the 8-byte big-endian prefix ordinal).  Columns any run lacks stats
    for are omitted — _zvalue falls back to aggregating just those."""
    import datetime as _dt

    def to_probe(v, ts: bool):
        if v is None:
            return None
        if ts:
            # fallback for pre-"us" snapshots: interpret the stored naive
            # wall clock as UTC — the same convention the unix_micros
            # probe applies under the UTC-pinned session, so the bound
            # cannot shift with the compacting host's local timezone
            # (ADVICE r5; new snapshots carry exact epoch micros instead)
            naive = _dt.datetime.fromisoformat(_iso_full(v))
            return naive.replace(tzinfo=_dt.timezone.utc).timestamp() * 1e6
        if isinstance(v, str):
            # must match the probe's ZERO-PADDED 8-byte prefix ordinal
            return float(
                int.from_bytes(v.encode("utf-8")[:8].ljust(8, b"\0"), "big")
            )
        return float(v)

    out: dict = {}
    for c in cols:
        lo = hi = None
        ok = True
        for r in snap.run_ids:
            ent = (snap.column_stats.get(r) or {}).get(c)
            if not ent or ent.get("u"):
                ok = False  # unknown bounds somewhere: fall back to a scan
                break
            if ent.get("min") is None:
                continue  # all-NULL run: contributes no non-null values
            if ent.get("us"):
                # exact epoch-micros bounds recorded JVM-side at commit
                a, b = float(ent["us"][0]), float(ent["us"][1])
            else:
                a = to_probe(ent["min"], ent.get("ts", False))
                b = to_probe(ent["max"], ent.get("ts", False))
            lo = a if lo is None else min(lo, a)
            hi = b if hi is None else max(hi, b)
        if ok and lo is not None:
            out[c] = (lo, hi)
    return out


# Filter ops whose predicate can never be satisfied by a NULL value (SQL
# three-valued logic): a run whose column has zero non-null values is
# provably empty under any of these.
_NONNULL_OPS = frozenset(
    {"=", "==", "<", "<=", ">", ">=", "in", "between", "is_not_null"}
)
_VALID_OPS = _NONNULL_OPS | {"is_null"}


def _normalize_filter(flt) -> tuple[str, str, object]:
    col, op = flt[0], flt[1]
    if op not in _VALID_OPS:
        raise ValueError(f"unknown filter op {op!r} (supported: {sorted(_VALID_OPS)})")
    return col, op, (flt[2] if len(flt) > 2 else None)


def _run_provably_empty(run_stats: "dict | None", filters) -> bool:
    """True only when zone-map stats PROVE no row of the run can satisfy the
    conjunctive ``filters``.  Anything unprovable keeps the run — pruning is
    an optimization; the residual filter re-applies exact semantics."""
    if run_stats is None:
        return False  # legacy snapshot committed before stats existed
    for flt in filters:
        col, op, val = _normalize_filter(flt)
        ent = run_stats.get(col)
        if ent is None:
            # Column absent from the run's schema at commit time: schema
            # evolution reads it back all-NULL, which no non-null-matching
            # predicate can satisfy.
            if op in _NONNULL_OPS:
                return True
            continue
        if ent.get("u"):
            continue
        mn, mx, nulls = ent.get("min"), ent.get("max"), ent.get("nulls", 0)
        if op == "is_null":
            if nulls == 0:
                return True
            continue
        if mn is None:  # zero non-null values in this run
            return True  # op is in _NONNULL_OPS here
        if op == "is_not_null":
            continue
        if ent.get("ts"):
            # temporal bounds are ISO strings; widen date-grain values on
            # BOTH sides to midnight timestamps so lexicographic order is
            # chronological across date/timestamp mixes (exact, since SQL
            # casts a date to its midnight timestamp)
            mn, mx = _iso_full(mn), _iso_full(mx)
            if op == "in":
                val = [_iso_full(v) for v in val]
            elif op == "between":
                val = tuple(_iso_full(v) for v in val)
            else:
                val = _iso_full(val)
        try:
            if op in ("=", "=="):
                if val < mn or val > mx:
                    return True
            elif op == "<":
                if mn >= val:
                    return True
            elif op == "<=":
                if mn > val:
                    return True
            elif op == ">":
                if mx <= val:
                    return True
            elif op == ">=":
                if mx < val:
                    return True
            elif op == "in":
                vals = list(val)
                if not vals or all(v < mn or v > mx for v in vals):
                    return True
            elif op == "between":
                lo, hi = val
                if hi < mn or lo > mx:
                    return True
        except TypeError:
            continue  # literal type incomparable with the stats — keep
    return False


def _filters_to_expr(filters):
    """The same conjuncts as a Spark Column (residual filter): pruning only
    removes whole runs, this re-applies exact row-level semantics — and the
    simple comparisons push down into the parquet scan as PushedFilters."""
    expr = None
    for flt in filters:
        col, op, val = _normalize_filter(flt)
        c = F.col(col)
        if op in ("=", "=="):
            e = c == F.lit(val)
        elif op == "<":
            e = c < F.lit(val)
        elif op == "<=":
            e = c <= F.lit(val)
        elif op == ">":
            e = c > F.lit(val)
        elif op == ">=":
            e = c >= F.lit(val)
        elif op == "in":
            vals = list(val)
            e = c.isin(vals) if vals else F.lit(False)
        elif op == "between":
            e = c.between(F.lit(val[0]), F.lit(val[1]))
        elif op == "is_null":
            e = c.isNull()
        else:  # is_not_null
            e = c.isNotNull()
        expr = e if expr is None else (expr & e)
    return expr if expr is not None else F.lit(True)


class SnapshotTable:
    """One snapshot-committed parquet table."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.snap_dir = os.path.join(table_dir, "_snapshots")
        self.data_dir = os.path.join(table_dir, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------------- snapshots
    def latest_snapshot(self) -> Snapshot | None:
        """Highest committed snapshot.  Resolved by scanning v<N>.json names
        (immutable once linked into place), NOT by trusting LATEST: two
        racing writers swing the pointer in commit order only by luck, and
        a stale pointer must never hide a committed snapshot.  LATEST is
        still maintained as a human-readable hint."""
        versions = [
            int(n[1:-5])
            for n in os.listdir(self.snap_dir)
            if n.startswith("v") and n.endswith(".json") and n[1:-5].isdigit()
        ]
        if not versions:
            return None
        return self.snapshot(max(versions))

    def _write_snapshot(self, snap: Snapshot) -> None:
        """Atomically publish a snapshot version, or raise
        SnapshotConflictError if another writer got there first.

        The full content is written and fsynced to a temp file, then
        os.link() makes it visible under its version name — link is atomic
        and fails with FileExistsError when the version exists, so readers
        can never observe a partial snapshot and no two writers can both
        claim the same version (the CAS of Iceberg's commit protocol)."""
        name = f"v{snap.version}.json"
        path = os.path.join(self.snap_dir, name)
        fd, tmp = tempfile.mkstemp(dir=self.snap_dir)
        try:
            with os.fdopen(fd, "w") as f:
                f.write(snap.to_json())
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)  # atomic create-if-absent
            except FileExistsError:
                raise SnapshotConflictError(
                    f"snapshot v{snap.version} already committed by another "
                    "writer"
                ) from None
        finally:
            os.unlink(tmp)
        # best-effort hint; correctness never depends on it
        fd, tmp = tempfile.mkstemp(dir=self.snap_dir)
        with os.fdopen(fd, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.snap_dir, "LATEST"))  # atomic

    # ------------------------------------------------------------ write path
    def staged_dir(self, run_id: str) -> str:
        return os.path.join(self.data_dir, f"run_id={run_id}")

    def is_committed(self, run_id: str) -> bool:
        snap = self.latest_snapshot()
        return snap is not None and (
            run_id in snap.run_ids or run_id in snap.retired_run_ids
        )

    def stage(
        self,
        df: DataFrame,
        run_id: str,
        cluster_by: "list[str] | None" = None,
        cluster_partitions: int | None = None,
        zorder: bool = False,
        zorder_bounds: "dict[str, tuple] | None" = None,
    ) -> str:
        """Write df into the run's staging dir (overwrite = crash-safe
        re-run; an uncommitted dir is invisible to readers).

        ``cluster_by`` range-partitions and sorts the write on the given
        columns (Iceberg's sorted write-distribution): each output file
        then covers a near-disjoint slice of the cluster key, so the
        file-level zone maps collected at commit let a point/range read
        plan one file of N instead of the whole run — the write-side half
        of data skipping (the read-side half is ``read(filters=...)``).

        ``zorder=True`` (with >= 2 cluster columns) sorts on the Z-curve
        interleaving of the columns instead of lexicographically.  A
        lexicographic sort gives perfect pruning on the leading column and
        NONE on the others; the Z-curve trades that for sublinear pruning
        on EVERY clustered column (~N^(1-1/d) of N files for a point
        filter on one of d dims) — Delta/Iceberg's OPTIMIZE ZORDER.  The
        Z value orders the write only; it is never stored."""
        zcol = None
        if zorder:
            # refuse, don't silently no-op: the operator would believe the
            # table is z-clustered while every read scans all files
            if not cluster_by or len(cluster_by) < 2:
                raise ValueError(
                    "zorder=True needs >= 2 cluster_by columns (a single "
                    "column is already optimally clustered by the plain "
                    "sorted write)"
                )
            zcol = "__zorder_tmp"
            if zcol in df.columns:
                raise ValueError(
                    f"zorder: input already has a {zcol!r} column; rename "
                    "it — the write would silently drop it"
                )
            df = df.withColumn(
                zcol, _zvalue(df, cluster_by, bounds=zorder_bounds)
            )
            cluster_by = [zcol]
        if cluster_by:
            if cluster_partitions is not None:
                n = cluster_partitions
            else:
                # may be non-numeric ("auto" under AQE-managed deployments)
                try:
                    n = int(
                        df.sparkSession.conf.get(
                            "spark.sql.shuffle.partitions", "16"
                        )
                    )
                except (ValueError, TypeError):
                    n = 16
            df = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        if zcol is not None:
            df = df.drop(zcol)  # projection only: file layout is kept
        path = self.staged_dir(run_id)
        df.write.mode("overwrite").parquet(path)
        return path

    def commit(
        self,
        spark: SparkSession,
        run_id: str,
        committed_keys: list[str] | None = None,
    ) -> Snapshot:
        """Fold the staged run into a new snapshot (no-op if committed).

        CAS-retries on snapshot conflict: if another writer commits between
        our read and our write, re-read the fresh snapshot (which may
        already contain this run_id — then it is a no-op) and try the next
        version."""
        rows = None
        run_stats = None
        run_fstats = None
        staged_schema = None
        for _ in range(_CAS_RETRIES):
            prev = self.latest_snapshot()
            if prev is not None and (
                run_id in prev.run_ids or run_id in prev.retired_run_ids
            ):
                return prev  # idempotent re-commit (incl. compaction-retired)
            if rows is None:  # staged data is fixed; scan once
                staged = spark.read.parquet(self.staged_dir(run_id))
                rows, run_stats, run_fstats = _collect_stats(staged)
                staged_schema = staged.schema
            snap = Snapshot(
                version=(prev.version + 1) if prev else 1,
                run_ids=(prev.run_ids if prev else []) + [run_id],
                committed_keys=sorted(
                    set(prev.committed_keys if prev else [])
                    | set(committed_keys or [])
                ),
                row_counts={**(prev.row_counts if prev else {}), run_id: rows},
                retired_run_ids=(prev.retired_run_ids if prev else []),
                schema_json=_evolve_schema(
                    prev.schema_json if prev else None, staged_schema
                ),
                column_stats={
                    **(prev.column_stats if prev else {}),
                    run_id: run_stats,
                },
                file_stats={
                    **(prev.file_stats if prev else {}),
                    run_id: run_fstats,
                },
                # outstanding equality deletes apply to PRIOR runs only
                # (applies_to pins them), so an append carries them as-is
                delete_files=list(prev.delete_files) if prev else [],
            )
            try:
                self._write_snapshot(snap)
                return snap
            except SnapshotConflictError:
                continue
        raise SnapshotConflictError(
            f"commit of run {run_id!r} lost {_CAS_RETRIES} CAS races; "
            "a writer is livelocking this table"
        )

    # ---------------------------------------------------------- maintenance
    def compact(
        self,
        spark: SparkSession,
        target_partitions: int = 1,
        cluster_by: "list[str] | None" = None,
        zorder: bool = False,
    ) -> Snapshot:
        """Rewrite every committed run dir into one compacted run and commit
        a snapshot referencing only it (Iceberg rewrite_data_files).

        ``cluster_by`` makes it a SORTED rewrite (Iceberg's sort
        strategy): the compacted files carry near-disjoint ranges of the
        cluster key, so the file-level zone maps collected at commit turn
        an accumulation of unsorted micro-batch runs into a table where a
        point/range read plans one file of ``target_partitions`` — the
        nightly maintenance pass a streaming ingest needs to stay
        queryable.  ``zorder=True`` sorts on the Z-curve interleave of
        the cluster columns instead (Iceberg/Delta's z-order strategy):
        sublinear file pruning on every clustered column, not just the
        leading one — see :meth:`stage`.

        A long-running bucketed/streaming job accumulates one run dir per
        bucket or micro-batch; at 100 TB that means small-file explosion
        and a scan that unions thousands of directories.  Compaction is
        data-identical (row set unchanged; committed_keys preserved AND the
        folded run_ids move to retired_run_ids, so both resume paths —
        job.py's key-based skip and the streaming replay guard's
        is_committed(run_id) — still treat finished work as done); prior
        snapshots still time-travel until vacuum() expires their data.

        CAS-retries on snapshot conflict: a commit landing between the
        snapshot read and the snapshot write (e.g. a live foreachBatch
        micro-batch — the exact workload compaction targets) makes the
        version-file link fail, and the WHOLE rewrite restarts from the
        fresh snapshot so the newly appended rows are folded in rather
        than silently dropped.
        """
        if zorder and (not cluster_by or len(cluster_by) < 2):
            raise ValueError(
                "compact(zorder=True) needs >= 2 cluster_by columns"
            )
        for _ in range(_CAS_RETRIES):
            prev = self.latest_snapshot()
            if prev is None or not prev.run_ids:
                raise ValueError("nothing to compact: no committed snapshot")
            # Per-attempt nonce: two compactors racing from the same base
            # version must stage into DIFFERENT directories — with a shared
            # deterministic name, the loser's mode("overwrite") would delete
            # the data files of the snapshot the winner already committed.
            # The loser's orphaned dir is reclaimed by vacuum() (min-age
            # guarded) like any other uncommitted staging dir.
            run_id = f"compact-v{prev.version + 1}-{os.urandom(4).hex()}"
            # read() applies the snapshot schema AND any outstanding
            # equality-delete files, so a compaction after MOR merges
            # FOLDS the deletes into the rewrite (Iceberg: rewrite_data_
            # files drops the delete files it applies) — the new snapshot
            # carries no delete_files and readers stop paying the
            # anti-joins
            df = self.read(spark, version=prev.version)
            if cluster_by:
                self.stage(
                    df,
                    run_id,
                    cluster_by=cluster_by,
                    cluster_partitions=target_partitions,
                    zorder=zorder,
                    # the snapshot already knows every column's bounds: a
                    # z-ordered rewrite must not pay an extra full scan
                    zorder_bounds=(
                        _zbounds_from_snapshot(prev, cluster_by)
                        if zorder
                        else None
                    ),
                )
            else:
                self.stage(df.repartition(target_partitions), run_id)
            rows, run_stats, run_fstats = _collect_stats(
                spark.read.parquet(self.staged_dir(run_id))
            )
            # with outstanding equality deletes the run row-counts are an
            # overcount (deleted rows still sit in their files), so the
            # identity check recounts the MOR-applied source instead
            expected = (
                df.count()
                if prev.delete_files
                else sum(prev.row_counts.get(r, 0) for r in prev.run_ids)
            )
            if rows != expected:
                raise RuntimeError(
                    f"compaction row mismatch: {rows} != {expected}"
                )
            snap = Snapshot(
                version=prev.version + 1,
                run_ids=[run_id],
                committed_keys=prev.committed_keys,
                row_counts={run_id: rows},
                retired_run_ids=sorted(
                    set(prev.retired_run_ids) | set(prev.run_ids)
                ),
                schema_json=prev.schema_json,
                column_stats={run_id: run_stats},
                file_stats={run_id: run_fstats},
                operation="compact",
            )
            try:
                self._write_snapshot(snap)
                return snap
            except SnapshotConflictError:
                continue  # re-read, re-fold the newly committed rows
        raise SnapshotConflictError(
            f"compaction lost {_CAS_RETRIES} CAS races; "
            "a writer is livelocking this table"
        )

    def merge(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: list[str],
        merge_id: str,
        delete_col: str | None = None,
        mode: str = "cow",
    ) -> Snapshot:
        """Iceberg-style MERGE (copy-on-write with data-file pruning):
        rows of ``updates`` replace committed rows sharing their key,
        unmatched update rows are inserted, and update rows whose
        ``delete_col`` is true delete their match instead.

        ``mode="mor"`` is the merge-on-read path (Iceberg v2 equality
        deletes): instead of rewriting matched run dirs, the merge writes
        ONE delete-keys file (every update key, scoped by ``applies_to``
        to the runs that existed at merge time — Iceberg's
        sequence-number scoping made explicit) plus ONE insert run with
        the upsert rows.  Write cost is O(update keys), never O(run-dir
        rewrite) — the right shape for a small redaction on a high-churn
        100 TB table; readers pay a (typically broadcast) anti-join per
        outstanding delete file until compact() folds them away, which
        stays copy-on-write's job.  A COW merge while equality deletes
        are outstanding is refused (its survivor scan would resurrect
        deleted rows) — compact first, exactly like Iceberg's
        rewrite_data_files before strategy changes.

        The scale property this implements deliberately: only run dirs
        that actually CONTAIN a matched key are rewritten — every other
        committed run dir stays referenced untouched in the new snapshot
        (Iceberg's COW file pruning; at 100 TB a merge touching one day's
        partition must not rewrite the other 364).  Matched-run discovery
        is one semi-join over the committed rows with run provenance; the
        collect is bounded by the number of run DIRS, never rows.

        Idempotent under ``merge_id`` (recorded in committed_keys — a
        crash-and-rerun is a no-op) and CAS-safe like compact: losing the
        snapshot race restarts the whole merge from the fresh snapshot,
        so concurrently appended rows are never silently dropped.
        Replaced run dirs move to retired_run_ids: prior snapshots still
        time-travel until vacuum() expires them, and their run_ids stay
        recognized by is_committed.  Duplicate or NULL keys WITHIN
        updates raise (equality joins cannot match a NULL key, so a
        NULL-key update row would silently insert forever instead of
        erroring — Iceberg raises on multiple matching source rows for
        the same reason).  A NULL ``delete_col`` means "not a delete"
        (SQL MERGE's WHEN MATCHED AND <cond> treats NULL as false).
        Schema evolution: updates may carry new columns — survivors read
        back with NULLs there, per _evolve_schema.
        """
        key = f"merge/{merge_id}"
        # Idempotency short-circuit BEFORE validation: a crash-and-rerun of
        # a committed merge_id is a metadata read, not two update scans.
        prev0 = self.latest_snapshot()
        if prev0 is not None and key in prev0.committed_keys:
            return prev0
        null_key = F.lit(False)
        for c in key_cols:
            null_key = null_key | F.col(c).isNull()
        # zone-map-prunable key columns: collect the updates' key range in
        # the same validation pass, so committed runs whose recorded key
        # range provably misses every update key are never even scanned
        # (Iceberg's manifest-level file skipping applied to MERGE).
        dtypes = {f0.name: f0.dataType for f0 in updates.schema.fields}
        range_keys = [
            c
            for c in key_cols
            if _stats_kind(dtypes.get(c, None) or ()) is not None
        ]
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(c) for c in key_cols]).alias("nk"),
            F.sum(F.when(null_key, 1).otherwise(0)).alias("n_null"),
        ]
        for i, c in enumerate(range_keys):
            aggs.append(F.min(c).alias(f"__kmn_{i}"))
            aggs.append(F.max(c).alias(f"__kmx_{i}"))
        stats = updates.agg(*aggs).collect()[0]
        if (stats["n_null"] or 0) > 0:
            raise ValueError(
                f"{stats['n_null']} update row(s) carry NULL in a merge key "
                "column: an equality MERGE can never match them"
            )
        if stats["nk"] != stats["n"]:
            raise ValueError(
                "duplicate keys within updates: MERGE requires each target "
                "row to match at most one source row"
            )
        key_filters = []
        for i, c in enumerate(range_keys):
            kmn, kmx = stats[f"__kmn_{i}"], stats[f"__kmx_{i}"]
            if kmn is not None and not (
                isinstance(kmn, float)
                and not (math.isfinite(kmn) and math.isfinite(kmx))
            ):
                key_filters.append((c, "between", (kmn, kmx)))
        upd_keys = updates.select(*key_cols).distinct()
        upserts = updates
        if delete_col is not None:
            # NULL delete flag = not a delete; a bare ~col would silently
            # drop NULL-flag rows from the upsert set (data loss)
            upserts = updates.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        if mode == "mor":
            return self._merge_mor(
                spark, key, merge_id, upd_keys, upserts, key_cols, key_filters
            )
        if mode != "cow":
            raise ValueError(f"merge: unknown mode {mode!r} (cow | mor)")
        for _ in range(_CAS_RETRIES):
            prev = self.latest_snapshot()
            if prev is not None and key in prev.committed_keys:
                return prev  # idempotent re-merge
            if prev is not None and prev.delete_files:
                raise ValueError(
                    "copy-on-write MERGE with outstanding equality deletes "
                    "would resurrect deleted rows from its survivor scan; "
                    "compact() first, or keep using mode='mor'"
                )
            # zone-map prune BEFORE any scan: a run whose committed key
            # range provably misses every update key cannot contain a match
            # and stays referenced untouched, unread (at 100 TB a merge
            # keyed to one day's id range must not scan the other 364).
            scan_runs = [
                r
                for r in (prev.run_ids if prev else [])
                if not _run_provably_empty(
                    prev.column_stats.get(r), key_filters
                )
            ]
            if scan_runs:
                schema = (
                    StructType.fromJson(json.loads(prev.schema_json))
                    if prev.schema_json
                    else None
                )

                def _run_frame(r: str) -> DataFrame:
                    reader = spark.read.schema(schema) if schema else spark.read
                    # per-run lit() provenance instead of basePath partition
                    # discovery: partition-type inference would corrupt
                    # digit-only run ids ("01" -> 1 -> "1")
                    return reader.parquet(self.staged_dir(r)).withColumn(
                        "__run", F.lit(r)
                    )

                cur = _run_frame(scan_runs[0])
                for r in scan_runs[1:]:
                    cur = cur.unionByName(_run_frame(r))
                matched_runs = sorted(
                    row["__run"]
                    for row in cur.join(upd_keys, key_cols, "leftsemi")
                    .select("__run")
                    .distinct()
                    .collect()
                )
                untouched = [r for r in prev.run_ids if r not in matched_runs]
                survivors = (
                    cur.filter(F.col("__run").isin(matched_runs))
                    .drop("__run")
                    .join(upd_keys, key_cols, "left_anti")
                )
                result = survivors.unionByName(upserts, allowMissingColumns=True)
            else:
                matched_runs = []
                untouched = list(prev.run_ids) if prev else []
                result = upserts
            version = (prev.version + 1) if prev else 1
            run_id = f"merge-{merge_id}-v{version}-{os.urandom(4).hex()}"
            self.stage(result, run_id)
            staged = spark.read.parquet(self.staged_dir(run_id))
            rows, run_stats, run_fstats = _collect_stats(staged)
            snap = Snapshot(
                version=version,
                run_ids=untouched + [run_id],
                committed_keys=sorted(
                    set(prev.committed_keys if prev else []) | {key}
                ),
                row_counts={
                    **{
                        r: prev.row_counts[r]
                        for r in untouched
                        if prev and r in prev.row_counts
                    },
                    run_id: rows,
                },
                retired_run_ids=sorted(
                    set(prev.retired_run_ids if prev else []) | set(matched_runs)
                ),
                schema_json=_evolve_schema(
                    prev.schema_json if prev else None, staged.schema
                ),
                column_stats={
                    **{
                        r: (prev.column_stats if prev else {})[r]
                        for r in untouched
                        if prev and r in prev.column_stats
                    },
                    run_id: run_stats,
                },
                file_stats={
                    **{
                        r: (prev.file_stats if prev else {})[r]
                        for r in untouched
                        if prev and r in prev.file_stats
                    },
                    run_id: run_fstats,
                },
                operation="merge",
                # empty by the outstanding-deletes guard above; explicit so
                # a future guard relaxation cannot silently drop deletes
                delete_files=list(prev.delete_files) if prev else [],
            )
            try:
                self._write_snapshot(snap)
                return snap
            except SnapshotConflictError:
                continue  # restart from the fresh snapshot
        raise SnapshotConflictError(
            f"merge {merge_id!r} lost {_CAS_RETRIES} CAS races; "
            "a writer is livelocking this table"
        )

    def _merge_mor(
        self,
        spark: SparkSession,
        key: str,
        merge_id: str,
        upd_keys: DataFrame,
        upserts: DataFrame,
        key_cols: list[str],
        key_filters: list,
    ) -> Snapshot:
        """merge(mode="mor") body: one equality-delete keys file + one
        insert run, no data-file rewrite (see merge() docstring).  The
        delete entry's ``applies_to`` is zone-map pruned at write time —
        a run whose committed key range provably misses every update key
        is not even listed, so readers never anti-join against it."""
        for _ in range(_CAS_RETRIES):
            prev = self.latest_snapshot()
            if prev is not None and key in prev.committed_keys:
                return prev  # idempotent re-merge
            version = (prev.version + 1) if prev else 1
            nonce = os.urandom(4).hex()
            ins_run = f"merge-{merge_id}-v{version}-{nonce}"
            applies_to = [
                r
                for r in (prev.run_ids if prev else [])
                if not _run_provably_empty(
                    prev.column_stats.get(r), key_filters
                )
            ]
            del_entry = None
            if applies_to:
                del_run = f"eqdel-{merge_id}-v{version}-{nonce}"
                self.stage(upd_keys, del_run)
                del_entry = {
                    "run": del_run,
                    "key_cols": list(key_cols),
                    "applies_to": applies_to,
                }
            self.stage(upserts, ins_run)
            staged = spark.read.parquet(self.staged_dir(ins_run))
            rows, run_stats, run_fstats = _collect_stats(staged)
            snap = Snapshot(
                version=version,
                run_ids=(prev.run_ids if prev else []) + [ins_run],
                committed_keys=sorted(
                    set(prev.committed_keys if prev else []) | {key}
                ),
                row_counts={
                    **(prev.row_counts if prev else {}),
                    ins_run: rows,
                },
                retired_run_ids=list(prev.retired_run_ids) if prev else [],
                schema_json=_evolve_schema(
                    prev.schema_json if prev else None, staged.schema
                ),
                column_stats={
                    **(prev.column_stats if prev else {}),
                    ins_run: run_stats,
                },
                file_stats={
                    **(prev.file_stats if prev else {}),
                    ins_run: run_fstats,
                },
                operation="merge",
                delete_files=(list(prev.delete_files) if prev else [])
                + ([del_entry] if del_entry else []),
            )
            try:
                self._write_snapshot(snap)
                return snap
            except SnapshotConflictError:
                continue
        raise SnapshotConflictError(
            f"merge {merge_id!r} (mor) lost {_CAS_RETRIES} CAS races; "
            "a writer is livelocking this table"
        )

    def vacuum(
        self, retain_last: int = 1, min_age_seconds: float = 3 * 86400
    ) -> list[str]:
        """Delete data dirs unreferenced by the ``retain_last`` most recent
        snapshots — including orphaned staging dirs no snapshot ever
        committed (Iceberg expire_snapshots + remove_orphan_files).

        ``min_age_seconds`` protects in-flight writers: a dir staged but not
        yet committed looks exactly like an orphan, so only dirs whose
        mtime is older than the threshold are deleted (Iceberg's
        remove_orphan_files defaults to 3 days for the same race).  Time
        travel to expired snapshots stops working, exactly as with Iceberg
        snapshot expiry; the retained window is the operator's rollback
        horizon.  TAGGED versions are always retained (Iceberg ref
        retention) — a published dataset pin survives maintenance until
        the tag is dropped.  Returns the removed directories.
        """
        import shutil
        import time

        latest = self.latest_snapshot()
        if latest is None:
            return []
        keep_versions = set(
            range(max(1, latest.version - retain_last + 1), latest.version + 1)
        ) | set(self.tags().values())
        keep_runs: set[str] = set()
        for v in sorted(keep_versions):
            snap = self.snapshot(v)
            if snap is not None:
                keep_runs.update(snap.run_ids)
                # equality-delete key files are part of a snapshot's read
                # state: expiring one would resurrect deleted rows
                keep_runs.update(d["run"] for d in snap.delete_files)
        now = time.time()
        removed = []
        for entry in sorted(os.listdir(self.data_dir)):
            if not entry.startswith("run_id="):
                continue
            path = os.path.join(self.data_dir, entry)
            if entry[len("run_id="):] in keep_runs:
                continue
            if now - os.path.getmtime(path) < min_age_seconds:
                continue  # possibly an in-flight writer's staging dir
            shutil.rmtree(path)
            removed.append(path)
        return removed

    # ----------------------------------------------------------------- tags
    def _tags_dir(self) -> str:
        d = os.path.join(self.table_dir, "_tags")
        os.makedirs(d, exist_ok=True)
        return d

    def tag(self, name: str, version: int | None = None) -> int:
        """Iceberg-style named ref: pin ``name`` to a snapshot version
        (default: latest).  The publish pointer of write-audit-publish —
        readers address ``read(spark, tag="published")`` while writers
        keep committing; flipping the tag is one atomic file replace, and
        ``vacuum`` retains every tagged version's data beyond
        ``retain_last`` (Iceberg ref retention), so a pinned dataset
        release survives routine maintenance until the tag is dropped."""
        if "/" in name or name.startswith("."):
            raise ValueError(f"invalid tag name {name!r}")
        snap = (
            self.latest_snapshot() if version is None else self.snapshot(version)
        )
        if snap is None:
            raise ValueError(
                f"tag {name!r}: snapshot "
                f"{'latest' if version is None else f'v{version}'} does not exist"
            )
        missing = [
            r for r in snap.run_ids if not os.path.isdir(self.staged_dir(r))
        ]
        if missing:
            raise ValueError(
                f"tag {name!r}: {len(missing)} run dir(s) of v{snap.version} "
                "were expired by vacuum; a tag cannot pin data that no "
                "longer exists"
            )
        path = os.path.join(self._tags_dir(), f"{name}.json")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"version": snap.version}, f)
        os.replace(tmp, path)  # atomic flip (last-write-wins, like a ref)
        return snap.version

    def drop_tag(self, name: str) -> bool:
        try:
            os.remove(os.path.join(self._tags_dir(), f"{name}.json"))
            return True
        except FileNotFoundError:
            return False

    def tags(self) -> dict[str, int]:
        out: dict[str, int] = {}
        d = self._tags_dir()
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    out[fn[:-5]] = json.load(f)["version"]
        return out

    def resolve_tag(self, name: str) -> int:
        v = self.tags().get(name)
        if v is None:
            raise ValueError(f"unknown tag {name!r}")
        return v

    def rollback(self, to_version: int) -> Snapshot:
        """Iceberg's ``rollback_to_snapshot``: commit a NEW snapshot whose
        table state (runs, keys, stats, schema) equals ``to_version``'s.
        The operator's undo button for a bad append/merge — metadata-only,
        O(1) in table size: no data file is read, written, or deleted.

        Semantics (matching Iceberg):
        - History is preserved.  The rolled-back versions stay
          time-travelable until ``vacuum`` expires them; the new snapshot's
          ``operation`` is ``"rollback"``.
        - It is a true UNDO.  Runs that entered after ``to_version`` leave
          ``run_ids`` *and* ``retired_run_ids``, so ``is_committed``
          reports False and a checkpoint-replayed micro-batch (or a
          corrected re-ingest) re-appends — exactly what rolling back bad
          data is for.  Their orphaned dirs become ``vacuum``-collectable
          after the age threshold.
        - ``read_changes`` refuses to cross a rollback (rows were removed;
          that is a logical rewrite, not an append) but consumes normally
          from the rollback version forward.

        Raises if the target version does not exist or if any of its run
        dirs was already vacuumed (the data is gone; like time travel to
        an expired snapshot).  Rolling back to the current version is a
        no-op returning the latest snapshot."""
        target = self.snapshot(to_version)
        if target is None:
            raise ValueError(
                f"rollback: snapshot v{to_version} does not exist "
                "(never committed, or expired by vacuum)"
            )
        missing = [
            r
            for r in (
                list(target.run_ids)
                + [d["run"] for d in target.delete_files]
            )
            if not os.path.isdir(self.staged_dir(r))
        ]
        if missing:
            raise ValueError(
                f"rollback: {len(missing)} run dir(s) of v{to_version} were "
                "expired by vacuum; the data no longer exists at that version"
            )
        for _ in range(_CAS_RETRIES):
            prev = self.latest_snapshot()
            assert prev is not None  # target exists, so a snapshot does
            if prev.version == to_version:
                return prev  # already there
            snap = Snapshot(
                version=prev.version + 1,
                run_ids=list(target.run_ids),
                committed_keys=list(target.committed_keys),
                row_counts=dict(target.row_counts),
                retired_run_ids=list(target.retired_run_ids),
                schema_json=target.schema_json,
                column_stats=dict(target.column_stats),
                file_stats=dict(target.file_stats),
                operation="rollback",
                delete_files=[dict(d) for d in target.delete_files],
            )
            try:
                self._write_snapshot(snap)
                return snap
            except SnapshotConflictError:
                continue
        raise SnapshotConflictError(
            f"rollback to v{to_version} lost {_CAS_RETRIES} CAS races; "
            "a writer is livelocking this table"
        )

    # ------------------------------------------------------------- read path
    def snapshot(self, version: int) -> Snapshot | None:
        """Load a specific snapshot version (time travel)."""
        path = os.path.join(self.snap_dir, f"v{version}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return Snapshot.from_json(f.read())

    def prune(self, snap: Snapshot, filters) -> tuple[list[str], list[str]]:
        """Split a snapshot's run_ids into (kept, skipped) under conjunctive
        ``filters`` — tuples ``(col, op, value)`` with op in =, ==, <, <=,
        >, >=, in, between, is_null, is_not_null (value omitted for the
        null tests).  A run is skipped only when its committed zone-map
        stats PROVE no row can satisfy the conjunction, including runs
        committed before a filtered column existed (schema evolution reads
        them all-NULL).  Legacy snapshots without stats keep everything."""
        kept, skipped = [], []
        for r in snap.run_ids:
            if _run_provably_empty(snap.column_stats.get(r), filters):
                skipped.append(r)
            else:
                kept.append(r)
        return kept, skipped

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        filters=None,
        tag: str | None = None,
    ) -> DataFrame | None:
        """Read the committed table state (union of committed run dirs).

        ``version`` enables Iceberg-style time travel: the table as of that
        snapshot.  ``tag`` reads the version a named ref pins (see
        :meth:`tag`); mutually exclusive with ``version``.  Default:
        latest.

        ``filters`` (see :meth:`prune`) enables manifest-level file
        skipping: run dirs whose zone-map stats prove no row can match are
        never handed to the scan AT PLAN-BUILD TIME — at 100 TB this is the
        difference between listing/reading 3 of 365 daily runs and all of
        them, before Spark's own parquet row-group pruning even starts.
        The same conjuncts are re-applied as a residual row filter (and
        push down into the surviving parquet scans), so the result is
        exactly ``read(...).filter(...)`` regardless of how much pruning
        the stats could prove."""
        if tag is not None:
            if version is not None:
                raise ValueError("read: pass version OR tag, not both")
            version = self.resolve_tag(tag)
        snap = self.latest_snapshot() if version is None else self.snapshot(version)
        if snap is None or not snap.run_ids:
            return None
        run_ids = snap.run_ids
        if filters:
            run_ids, _ = self.prune(snap, filters)
        schema = (
            StructType.fromJson(json.loads(snap.schema_json))
            if snap.schema_json is not None
            else None
        )
        run_paths: dict[str, list[str]] = {}
        for r in run_ids:
            fstats = snap.file_stats.get(r)
            if filters and fstats:
                # file-level manifest pruning within the kept run: plan only
                # the files whose zone maps can match (with cluster_by
                # writes, one file of N for a point/range query)
                run_paths[r] = [
                    os.path.join(self.staged_dir(r), fn)
                    for fn, st in sorted(fstats.items())
                    if not _run_provably_empty(st, filters)
                ]
            else:
                run_paths[r] = [self.staged_dir(r)]
        if not any(run_paths.values()):
            # everything pruned: an empty frame in the snapshot schema
            # (schema_json is recorded by every stats-writing commit)
            if schema is None:
                schema = spark.read.parquet(
                    *[self.staged_dir(r) for r in snap.run_ids]
                ).schema
            return spark.createDataFrame([], schema)

        def _scan(paths: list[str]) -> DataFrame:
            # schema from snapshot metadata, Iceberg-style: runs written
            # before a column existed read back with NULLs there, and no
            # per-file footer merge (mergeSchema) is ever needed
            if schema is not None:
                return spark.read.schema(schema).parquet(*paths)
            return spark.read.parquet(*paths)

        # merge-on-read: group runs by WHICH equality-delete files apply
        # (Iceberg sequence-number scoping via each entry's applies_to),
        # scan each group once, anti-join its delete-key files, union.
        # Delete files are small by MOR design, so the anti-joins plan as
        # broadcasts; a table with no outstanding deletes takes the single
        # one-scan path unchanged.
        groups: dict[tuple, list[str]] = {}
        for r, ps in run_paths.items():
            if not ps:
                continue
            applicable = tuple(
                i
                for i, d in enumerate(snap.delete_files)
                if r in d["applies_to"]
            )
            groups.setdefault(applicable, []).extend(ps)
        df = None
        for applicable, paths in sorted(groups.items()):
            part = _scan(paths)
            for i in applicable:
                d = snap.delete_files[i]
                keys = spark.read.parquet(
                    self.staged_dir(d["run"])
                ).select(*d["key_cols"]).distinct()
                part = part.join(keys, d["key_cols"], "left_anti")
            df = part if df is None else df.unionByName(part)
        if filters:
            df = df.filter(_filters_to_expr(filters))
        return df

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Iceberg-style incremental append scan: the rows ADDED by append
        snapshots in ``(from_version, to_version]`` — the consumption
        primitive for downstream pipelines (incremental dedup, CDC-style
        re-scoring, nightly exports) that must process only new data, not
        re-scan a 100 TB table per run.

        Semantics match Iceberg's incremental read: append snapshots
        contribute their new run dirs; compaction snapshots are skipped
        (data-identical rewrites add nothing); a merge snapshot in the
        range raises (a logical rewrite cannot be expressed as appends —
        Iceberg refuses the same way).  Legacy snapshots without an
        ``operation`` field are classified conservatively: growth of
        ``retired_run_ids`` marks a rewrite and raises.  Rows are read
        under the TO snapshot's schema (columns added later backfill NULL).
        Vacuumed history cannot be incrementally scanned — like expired
        Iceberg snapshots — because the appended dirs are gone.

        ``from_version`` 0 means "from before the first snapshot" (a full
        bootstrap read).  Returns an empty frame when the range adds
        nothing."""
        to_snap = (
            self.latest_snapshot()
            if to_version is None
            else self.snapshot(to_version)
        )
        if to_snap is None:
            raise ValueError("read_changes: no committed snapshot to read to")
        if from_version > to_snap.version:
            raise ValueError(
                f"read_changes: from_version {from_version} is beyond "
                f"snapshot {to_snap.version}"
            )
        new_runs: list[str] = []
        if from_version > 0:
            base = self.snapshot(from_version)
            if base is None:
                raise ValueError(
                    f"read_changes: snapshot v{from_version} does not exist"
                )
            prev_runs = set(base.run_ids) | set(base.retired_run_ids)
            prev_retired = set(base.retired_run_ids)
        else:
            prev_runs = set()
            prev_retired = set()
        for v in range(max(from_version, 0) + 1, to_snap.version + 1):
            s = self.snapshot(v)
            if s is None:
                raise ValueError(f"read_changes: snapshot v{v} is missing")
            op = s.operation
            if op is None:  # legacy record: infer from retire growth
                op = (
                    "rewrite"
                    if set(s.retired_run_ids) > prev_retired
                    else "append"
                )
            if op == "append":
                new_runs.extend(
                    r for r in s.run_ids if r not in prev_runs
                )
            elif op != "compact":
                raise ValueError(
                    f"read_changes: snapshot v{v} is a {op!r} — a logical "
                    "rewrite cannot be consumed as incremental appends; "
                    "use read_changelog() for row-level delete+insert CDC, "
                    "or read the full table at that version"
                )
            prev_runs |= set(s.run_ids) | set(s.retired_run_ids)
            prev_retired = set(s.retired_run_ids)
        schema = (
            StructType.fromJson(json.loads(to_snap.schema_json))
            if to_snap.schema_json is not None
            else None
        )
        if not new_runs:
            if schema is None:
                schema = spark.read.parquet(
                    *[self.staged_dir(r) for r in to_snap.run_ids]
                ).schema
            return spark.createDataFrame([], schema)
        paths = [self.staged_dir(r) for r in new_runs]
        expired = [p for p in paths if not os.path.isdir(p)]
        if expired:
            # vacuumed history cannot be incrementally scanned (Iceberg:
            # expired snapshots) — fail at plan time with the remedy, not
            # mid-job with a FileNotFoundError from the scan
            raise ValueError(
                f"read_changes: {len(expired)} appended run dir(s) in the "
                "range were expired by vacuum; bootstrap from a full "
                "read() at the target version instead"
            )
        if schema is not None:
            return spark.read.schema(schema).parquet(*paths)
        return spark.read.parquet(*paths)

    def read_changelog(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Iceberg-style changelog scan: one row per row-level CHANGE in
        ``(from_version, to_version]``, tagged with ``_change_type``
        ('insert' | 'delete') and ``_change_version`` — the CDC primitive
        ``read_changes`` cannot express (round-6 verdict item 3: the first
        post-redaction incremental export hits a MERGE in range).

        Per snapshot: append -> its new runs' rows as inserts; compact ->
        nothing (data-identical rewrite); MERGE -> the value-level diff of
        the rewritten run dirs against the merge output, as Iceberg's
        changelog emits it — delete+insert pairs for updated rows, pure
        deletes for delete-merges, pure inserts for upserted new keys.
        The diff is two EXCEPT ALLs over ONLY the runs the merge rewrote
        (never the untouched table: at 100 TB a one-day merge diffs one
        day); survivor rows appear identically in old and new files and
        cancel exactly.  Rollback in range is refused like read_changes —
        undone history is not expressible as forward changes.

        All rows are read under the TO snapshot's schema (later-added
        columns backfill NULL on earlier rows, so delete/insert pairs stay
        union-compatible).  Requires the merge's retired run dirs to still
        exist: vacuumed history cannot be diffed (same remedy as
        read_changes — bootstrap from a full read)."""
        to_snap = (
            self.latest_snapshot()
            if to_version is None
            else self.snapshot(to_version)
        )
        if to_snap is None:
            raise ValueError("read_changelog: no committed snapshot to read to")
        if from_version > to_snap.version:
            raise ValueError(
                f"read_changelog: from_version {from_version} is beyond "
                f"snapshot {to_snap.version}"
            )
        if from_version > 0 and self.snapshot(from_version) is None:
            raise ValueError(
                f"read_changelog: snapshot v{from_version} does not exist"
            )
        base = self.snapshot(from_version) if from_version > 0 else None
        prev_runs = (
            set(base.run_ids) | set(base.retired_run_ids) if base else set()
        )
        prev_retired = set(base.retired_run_ids) if base else set()
        prev_n_dels = len(base.delete_files) if base else 0
        schema = (
            StructType.fromJson(json.loads(to_snap.schema_json))
            if to_snap.schema_json is not None
            else None
        )

        def _conform(df: DataFrame) -> DataFrame:
            # rows read under an earlier snapshot's schema: backfill NULL
            # in later-added columns so every piece is union-compatible
            if schema is None:
                return df
            have = set(df.columns)
            return df.select(*[
                F.col(f0.name)
                if f0.name in have
                else F.lit(None).cast(f0.dataType).alias(f0.name)
                for f0 in schema.fields
            ])

        def _read(runs: list[str], what: str, v: int) -> DataFrame:
            paths = [self.staged_dir(r) for r in runs]
            gone = [p for p in paths if not os.path.isdir(p)]
            if gone:
                raise ValueError(
                    f"read_changelog: {len(gone)} {what} run dir(s) at v{v} "
                    "were expired by vacuum; bootstrap from a full read() "
                    "at the target version instead"
                )
            if schema is not None:
                return spark.read.schema(schema).parquet(*paths)
            return spark.read.parquet(*paths)

        pieces: list[DataFrame] = []

        def _tag(df: DataFrame, kind: str, v: int) -> DataFrame:
            return df.select(
                "*",
                F.lit(kind).alias("_change_type"),
                F.lit(v).alias("_change_version"),
            )

        for v in range(max(from_version, 0) + 1, to_snap.version + 1):
            s = self.snapshot(v)
            if s is None:
                raise ValueError(f"read_changelog: snapshot v{v} is missing")
            op = s.operation
            if op is None:  # legacy record: a rewrite of unknown kind
                op = (
                    "rewrite"
                    if set(s.retired_run_ids) > prev_retired
                    else "append"
                )
            if op == "append":
                new = [r for r in s.run_ids if r not in prev_runs]
                if new:
                    pieces.append(_tag(_read(new, "appended", v), "insert", v))
            elif op == "merge":
                old_runs = sorted(set(s.retired_run_ids) - prev_retired)
                new_runs = [r for r in s.run_ids if r not in prev_runs]
                new_dels = s.delete_files[prev_n_dels:]
                if old_runs and new_runs:  # copy-on-write: value-level diff
                    old_df = _read(old_runs, "merge-retired", v)
                    new_df = _read(new_runs, "merge-output", v)
                    pieces.append(_tag(old_df.exceptAll(new_df), "delete", v))
                    pieces.append(_tag(new_df.exceptAll(old_df), "insert", v))
                elif new_dels:
                    # merge-on-read: the pre-image of every deleted key is
                    # the prior version's MOR-applied read semi-joined on
                    # the delete-key file (matched keys only — an update
                    # key that matched nothing emits no delete), inserts
                    # are the merge's insert run verbatim
                    pre = self.read(spark, version=v - 1)
                    for d in new_dels:
                        if not os.path.isdir(self.staged_dir(d["run"])):
                            raise ValueError(
                                f"read_changelog: the equality-delete file "
                                f"at v{v} was expired by vacuum; bootstrap "
                                "from a full read() at the target version "
                                "instead"
                            )
                        keys = spark.read.parquet(
                            self.staged_dir(d["run"])
                        ).select(*d["key_cols"]).distinct()
                        pieces.append(_tag(
                            _conform(pre.join(keys, d["key_cols"],
                                              "left_semi")),
                            "delete", v,
                        ))
                    if new_runs:
                        pieces.append(_tag(
                            _read(new_runs, "merge-output", v), "insert", v
                        ))
                elif new_runs:  # merge into an empty match set: pure insert
                    pieces.append(
                        _tag(_read(new_runs, "merge-output", v), "insert", v)
                    )
            elif op != "compact":
                raise ValueError(
                    f"read_changelog: snapshot v{v} is a {op!r} — not "
                    "expressible as forward row-level changes; read the "
                    "full table at that version instead"
                )
            prev_runs |= set(s.run_ids) | set(s.retired_run_ids)
            prev_retired = set(s.retired_run_ids)
            prev_n_dels = len(s.delete_files)
        if not pieces:
            if schema is None:
                schema = spark.read.parquet(
                    *[self.staged_dir(r) for r in to_snap.run_ids]
                ).schema
            empty = spark.createDataFrame([], schema)
            return _tag(empty, "insert", 0).filter(F.lit(False))
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def history(self, spark: SparkSession) -> "DataFrame | None":
        """Iceberg's snapshots metadata table: one row per committed
        snapshot — version, producing operation, runs/rows referenced, and
        rows added vs the previous snapshot.  Metadata-only (reads the
        snapshot log, never a data file), so it stays O(versions) on a
        100 TB table.  Returns None before the first commit."""
        latest = self.latest_snapshot()
        if latest is None:
            return None
        rows = []
        prev_counts: dict[str, int] = {}
        for v in range(1, latest.version + 1):
            s = self.snapshot(v)
            if s is None:  # a hole is reported, not an error: history is
                continue  # diagnostic surface, not a consistency proof
            total = sum(s.row_counts.get(r, 0) for r in s.run_ids)
            added = sum(
                n
                for r, n in s.row_counts.items()
                if r in s.run_ids and r not in prev_counts
            )
            rows.append(
                {
                    "version": s.version,
                    "operation": s.operation or "unknown",
                    "n_runs": len(s.run_ids),
                    "n_retired": len(s.retired_run_ids),
                    "total_rows": total,
                    "rows_added": added if (s.operation or "append") == "append" else 0,
                }
            )
            prev_counts = dict(s.row_counts)
        return spark.createDataFrame(
            rows,
            schema=(
                "version int, operation string, n_runs int, n_retired int, "
                "total_rows long, rows_added long"
            ),
        )
