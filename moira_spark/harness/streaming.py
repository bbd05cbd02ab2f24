"""Driver-contract query for the Structured Streaming tier (rows-only).

Runs the real ``applyInPandasWithState`` stateful pipeline
(streaming/stateful_verdict.py) end-to-end under ``availableNow`` on a
deterministic split-conversation fixture: even turn_idx rows arrive in the
first micro-batch group, odd in the second (a checkpoint-resumed second run),
so every multi-turn conversation genuinely crosses a batch boundary and the
cross-batch state accumulation is exercised — not just the happy path.

The fixture is seeded (datagen seed=42) and scoring is deterministic, so the
final per-conversation verdicts are value-stable; fresh temp dirs per
invocation keep the query idempotent under repeated driver runs.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from moira_spark.harness import register

_N_TURNS = 1500


@register("streaming_conv_verdicts", None)
def streaming_conv_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from moira_spark.datagen import transcripts as tg
    from moira_spark.streaming.stateful_verdict import (
        current_verdicts,
        run_stateful_stream,
    )

    work = tempfile.mkdtemp(prefix="moira_stream_check_")
    in_dir, out_dir, ck_dir = f"{work}/in", f"{work}/out", f"{work}/ck"

    src = tg.gen_spark(spark, _N_TURNS, seed=42)
    # batch 1: even turns only -> run to completion (availableNow)
    src.filter(F.col("turn_idx") % 2 == 0).write.mode("append").parquet(in_dir)
    run_stateful_stream(spark, in_dir, out_dir, ck_dir).awaitTermination(300)
    # batch 2: odd turns arrive -> checkpoint-resume the same query
    src.filter(F.col("turn_idx") % 2 == 1).write.mode("append").parquet(in_dir)
    run_stateful_stream(spark, in_dir, out_dir, ck_dir).awaitTermination(300)

    # Materialize the final verdicts before deleting the updates log (the
    # returned frame must not depend on the temp dir once we clean it up).
    final = current_verdicts(spark, out_dir).select(
        "conv_id", "total_turns", "bad_turns", "conv_keep"
    )
    pdf = final.toPandas()
    shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, schema="conv_id string, total_turns long, bad_turns long, conv_keep boolean"
    )
