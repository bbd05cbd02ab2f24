"""Cross-micro-batch conversation verdicts via applyInPandasWithState.

The foreachBatch variant (stream_filter.py) judges each conversation within
one micro-batch; this operator handles conversations whose turns ARRIVE
SPLIT ACROSS micro-batches: per-conversation state accumulates the running
bad-turn count, and every batch emits the conversation's updated verdict
(update output mode) — moira's whole-read discard re-expressed as a
continuously-maintained aggregate.

State per conv_id: (bad_turns long, total_turns long).  No timeout — a
production deployment would set an event-time timeout past the watermark to
reap finished conversations; kept minimal here.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from moira_spark import config

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("total_turns", LongType()),
        StructField("bad_turns", LongType()),
        StructField("conv_keep", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("bad_turns", LongType()), StructField("total_turns", LongType())]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    bad, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        bad += int((~pdf["keep"]).sum())
        total += len(pdf)
    state.update((bad, total))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "total_turns": [total],
            "bad_turns": [bad],
            "conv_keep": [bad <= config.CONV_MAX_BAD_TURNS],
        }
    )


def stateful_conv_verdicts(scored_stream: DataFrame) -> DataFrame:
    """scored turns stream (needs conv_id + keep) -> running verdicts."""
    return (
        scored_stream.select("conv_id", "keep")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """File-stream -> per-turn scoring (stateless) -> stateful verdicts ->
    append-only updates log in ``output_dir`` (foreachBatch sink, so the
    update-mode stateful query is checkpoint-recoverable).  The CURRENT
    verdict of a conversation is its row with the highest total_turns."""
    from moira_spark.datagen.transcripts import PIPELINE_SCHEMA
    from moira_spark.pipeline import score_turns_stream

    src = spark.readStream.schema(PIPELINE_SCHEMA).parquet(input_dir)
    scored = score_turns_stream(spark, src)
    verdicts = stateful_conv_verdicts(scored)

    def append_updates(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_dir)

    return (
        verdicts.writeStream.foreachBatch(append_updates)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_verdicts(spark: SparkSession, output_dir: str) -> DataFrame:
    """Latest update per conversation from the updates log."""
    from pyspark.sql import Window

    log = spark.read.parquet(output_dir)
    w = Window.partitionBy("conv_id").orderBy(
        F.col("total_turns").desc(), F.col("batch_id").desc()
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
