"""Streaming dedupe: exactly-once record identity under at-least-once input.

The batch pipeline pins duplicate (conv_id, turn_idx) arrivals with a
global stable-order window (operators/ordering.py) — impossible in a
stream, where a global sort never closes.  The streaming re-expression is
``dropDuplicatesWithinWatermark``: keep the first arrival per key, hold key
state only within the event-time watermark horizon, and reap state for
keys older than the watermark (unlike ``dropDuplicates``, whose state
grows forever — a non-starter at 10^12 turns).

Semantics note, stated precisely: the batch dedupe keeps the MINIMUM
(ts, text, role, tool) row per key; streaming keeps the FIRST ARRIVAL.
These coincide in the case streaming dedupe exists for — upstream
at-least-once delivery (source retries, replayed files) re-sends
byte-identical rows, so any surviving copy is the same row.  Genuinely
conflicting same-key rows are a batch-repair concern (the snapshot job),
not a stream concern; the watermark bound is the trade that makes the
state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedupe_stream(
    src: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate ``keys`` arrivals within ``watermark`` of event time.

    ``src`` must be a streaming DataFrame containing ``ts_col``.  State per
    distinct key lives until the event-time watermark passes the key's
    timestamp; duplicates separated by more than the watermark horizon are
    out of contract (upstream retry storms resolve in seconds-to-minutes;
    size the watermark to the source's redelivery window).
    """
    return src.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
