"""Distributed FASTQ source/sink — the reference tool's native IO format
(SURVEY.md §2.1 #1 fastq_reader / #17 writers [M]), implemented as a
Spark ingest/export pass rather than a generator.

Reading — the split-boundary problem and its contract:
FASTQ is a 4-line-per-record text format, so records may straddle HDFS
split boundaries and a naive per-partition parse corrupts frames.  The
strategy here: ``sc.textFile`` lists files in input order and keeps a
file's splits contiguous, so ``zipWithIndex`` yields a GLOBAL line number
that is sequential within every file.  Because a *valid* FASTQ file has a
multiple-of-4 line count, file boundaries always fall on record
boundaries in the global numbering too — therefore ``line_no div 4`` is a
correct record id across any mix of files and splits, with no
boundary-stitching code.  Malformed inputs (truncated final record,
header not starting with ``@``, length-mismatched quality string) are
surfaced per record via ``corrupt`` instead of poisoning the whole scan.
The grouping is ONE shuffle keyed by the dense record id; at petabyte
scale this pass runs once at ingest and lands the reads in
parquet/SnapshotTable — every downstream query then gets columnar scans,
predicate pushdown, and stats, none of which a text format can offer.

Writing mirrors moira's ``.qc.good`` FASTQ outputs: each row renders to
its 4-line record inside one JVM ``concat`` (no Python), written via the
text sink; shard count and within-shard ordering are explicit knobs
because a distributed writer otherwise inherits whatever partitioning the
upstream plan ended with.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

_SCHEMA = (
    "rec_no long, read_id string, description string, seq string, "
    "quals string, corrupt boolean"
)


def read_fastq(
    spark: SparkSession, path: str, min_partitions: int | None = None
) -> DataFrame:
    """Parse FASTQ file(s) at ``path`` into
    ``(rec_no, read_id, description, seq, quals, corrupt)``.

    ``rec_no`` is the global 0-based record index (stable ingest order);
    ``read_id`` is the header token up to the first whitespace with the
    leading ``@`` stripped; ``corrupt`` marks records whose frame is
    malformed (bad header/separator sigil, seq/qual length mismatch, or
    a truncated trailing record) — callers filter or fail on it
    explicitly rather than the scan guessing.
    """
    sc = spark.sparkContext
    rdd = (
        sc.textFile(path, min_partitions)
        if min_partitions
        else sc.textFile(path)
    )
    lines = rdd.zipWithIndex().map(
        lambda kv: (kv[1] // 4, int(kv[1] % 4), kv[0])
    )
    raw = spark.createDataFrame(lines, "rec_no long, pos int, line string")
    slot = lambda p: F.max(F.when(F.col("pos") == p, F.col("line")))  # noqa: E731
    rec = raw.groupBy("rec_no").agg(
        slot(0).alias("header"),
        slot(1).alias("seq"),
        slot(2).alias("sep"),
        slot(3).alias("quals"),
    )
    corrupt = (
        F.col("header").isNull()
        | F.col("seq").isNull()
        | F.col("sep").isNull()
        | F.col("quals").isNull()
        | ~F.col("header").startswith("@")
        | ~F.col("sep").startswith("+")
        | (F.length("seq") != F.length("quals"))
    )
    head = F.regexp_replace(F.col("header"), r"^@", "")
    # F.get (not getItem): under ANSI mode an out-of-bounds index throws,
    # and headers without a description split into a 1-element array
    return rec.select(
        "rec_no",
        F.get(F.split(head, r"\s+", 2), 0).alias("read_id"),
        F.nullif(F.get(F.split(head, r"\s+", 2), 1), F.lit("")).alias(
            "description"
        ),
        "seq",
        "quals",
        corrupt.alias("corrupt"),
    )


def phred_error_probs(quals: Column, offset: int = 33) -> Column:
    """Per-base error probabilities from a Phred quality string as a pure
    JVM expression: ``p_i = 10^(-(ascii(q_i) - offset)/10)`` — the input
    moira's Poisson-binomial expected-error bound consumes (kernels/
    bernoulli.py takes these probabilities per read).  Returns
    ``array<double>`` with no Python in the path."""
    chars = F.filter(F.split(quals, ""), lambda c: c != F.lit(""))
    return F.transform(
        chars,
        lambda c: F.pow(
            F.lit(10.0), -(F.ascii(c) - F.lit(offset)).cast("double") / F.lit(10.0)
        ),
    )


def write_fastq(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    sort_within_shards: bool = False,
    mode: str = "error",
) -> None:
    """Render ``(read_id, seq, quals[, description])`` rows to 4-line FASTQ
    records and write them via the text sink.  ``shards`` repartitions to
    a fixed output-file count (round-robin — balanced shards regardless of
    upstream skew); ``sort_within_shards`` orders records by read_id
    inside each shard for reproducible diffs without a global sort."""
    desc = (
        F.concat(F.lit(" "), F.col("description"))
        if "description" in df.columns
        else F.lit("")
    )
    rec = F.concat(
        F.lit("@"),
        F.col("read_id"),
        F.coalesce(desc, F.lit("")),
        F.lit("\n"),
        F.col("seq"),
        F.lit("\n+\n"),
        F.col("quals"),
    )
    out = df.select(rec.alias("value"))
    if shards:
        out = out.repartition(shards)
    if sort_within_shards:
        out = out.sortWithinPartitions("value")
    out.write.mode(mode).text(path)
