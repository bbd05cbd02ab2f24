"""The single fused Arrow UDF stack (langid + perplexity + repetition + scrub).

All Python-side scoring is fused into ONE scalar-iterator pandas UDF that
returns a struct, so the physical plan has exactly one ArrowEvalPython node:
one JVM→Python Arrow hop per batch instead of four (SURVEY.md §3.2).

Model-artifact handling per BASELINE.json:6,15: the langid/LM models are
numpy arrays broadcast from the driver; the iterator form means the
``bc.value`` deserialization happens once per executor python worker and is
then reused for every Arrow batch — never per row, never per batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

SCORE_SCHEMA = (
    "rep_fail boolean, lang string, lang_conf double, ppl double, "
    "scrubbed_text string, had_pii boolean, toxic boolean"
)


# One (broadcasts, udf) per SparkContext: the bucketed job calls
# run_pipeline once per bucket and the streaming path once per micro-batch;
# without this cache each call would create two fresh ~1MB broadcast
# variables that are never destroyed for the life of the application.
_UDF_CACHE: dict[str, object] = {}


def make_score_udf(spark: SparkSession):
    """Build (or reuse) the fused scoring UDF; models broadcast once per
    SparkContext, not once per invocation."""
    from moira_spark.kernels import langid, lm

    sc = spark.sparkContext
    app_id = sc.applicationId
    cached = _UDF_CACHE.get(app_id)
    if cached is not None:
        return cached
    _UDF_CACHE.clear()  # drop entries from any previous (stopped) context
    bc_langid = sc.broadcast(langid.default_model())
    bc_lm = sc.broadcast(lm.default_model())

    @F.pandas_udf(SCORE_SCHEMA)
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # One-time per python worker: materialize broadcast models and import
        # kernels; reused across all Arrow batches of this task.
        from moira_spark.kernels.score import score_batch

        langid_model = bc_langid.value
        lm_model = bc_lm.value
        for texts in batches:
            filled = texts.fillna("").tolist()
            s = score_batch(filled, langid_model, lm_model)
            s["lang"] = s["lang"].astype(str)
            # Arrow-payload cut: scrubbed_text is the dominant output
            # column and MOST rows are untouched by the scrubber
            # (re.subn returns the original object on zero matches, so
            # the identity check is free; == covers any copying path).
            # Unchanged rows travel back as NULL and the JVM side
            # restores them via coalesce with the same text expression —
            # byte-identical, pinned by pipeline_f1_vs_reference.
            s["scrubbed_text"] = [
                None if (v is t or v == t) else v
                for v, t in zip(s["scrubbed_text"], filled)
            ]
            yield pd.DataFrame(s)

    _UDF_CACHE[app_id] = score
    return score
