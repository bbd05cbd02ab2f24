"""Structured Streaming variant: stream == batch labels, restart-safe."""

from __future__ import annotations

import pyspark.sql.functions as F

from moira_spark.datagen import transcripts as tg
from moira_spark.oracle import ref_pipeline as orc
from moira_spark.sources.tableio import SnapshotTable
from moira_spark.streaming.stream_filter import stream_labels

N_TURNS = 2000


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    # two "arrivals" of conversation-atomic files
    src = tg.gen_spark(spark, N_TURNS)
    first = src.filter(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0)
    second = src.filter(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 1)
    first.write.mode("append").parquet(in_dir)

    q = stream_labels(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination(120)

    second.write.mode("append").parquet(in_dir)
    q = stream_labels(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination(120)

    got = (
        SnapshotTable(out_dir)
        .read(spark)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = (
        orc.run(tg.gen_pandas(N_TURNS))
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    assert got.keep.tolist() == ref.keep.tolist()
    assert got.scrubbed_text.tolist() == ref.scrubbed_text.tolist()
    assert got.conv_keep.tolist() == ref.conv_keep.tolist()

    # restart with no new data: no duplicate commits
    q = stream_labels(spark, in_dir, out_dir, ck_dir)
    q.awaitTermination(120)
    assert SnapshotTable(out_dir).read(spark).count() == len(ref)
