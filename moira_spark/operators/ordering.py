"""Stable turn ordering + duplicate collapse (SURVEY.md §2.2 #2).

moira preserves input order through its ordered multiprocessing map [M];
Spark gives no such guarantee, so determinism is *recovered* via an explicit
window: for duplicate (conv_id, turn_idx) rows keep the lowest ts (ties
broken by text), exactly mirroring ``oracle.ref_pipeline.dedupe_stable``.

Scale note: the window partitions by the fine-grained composite key
(conv_id, turn_idx), so the hot conversation does NOT create a hot shuffle
partition here — skew only matters at the conversation-level aggregation,
which is salted (conv_agg.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def dedupe_stable(df: DataFrame) -> DataFrame:
    # Total order over every column that survives into outputs: without
    # role/tool in the tiebreak, duplicate rows identical in (ts, text) but
    # differing in role/tool would be picked nondeterministically, breaking
    # reproducible resume and oracle parity for the good-sink.  nulls_last
    # mirrors pandas' na_position='last' in oracle.dedupe_stable.
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("text").asc_nulls_last(),
        F.col("role").asc_nulls_last(),
        F.col("tool").asc_nulls_last(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
