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

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

SCORE_SCHEMA = (
    "rep_fail boolean, lang string, lang_conf double, ppl double, "
    "scrubbed_text string, had_pii boolean, toxic boolean"
)


def make_score_udf(spark: SparkSession):
    """Build the fused scoring UDF with models broadcast once per job."""
    from moira_spark.kernels import langid, lm

    sc = spark.sparkContext
    bc_langid = sc.broadcast(langid.default_model())
    bc_lm = sc.broadcast(lm.default_model())

    @F.pandas_udf(SCORE_SCHEMA)
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # One-time per python worker: materialize broadcast models and import
        # kernels; reused across all Arrow batches of this task.
        from moira_spark.kernels import scrub, text as textk

        langid_model = bc_langid.value
        lm_model = bc_lm.value
        for texts in batches:
            t = texts.fillna("").tolist()
            rep = textk.repetition_flags(t)
            langs, confs = langid_model.predict(t)
            ppl = lm_model.perplexity(t)
            scrubbed, had_pii, toxic = scrub.scrub_batch(t)
            yield pd.DataFrame(
                {
                    "rep_fail": rep,
                    "lang": langs.astype(str),
                    "lang_conf": confs,
                    "ppl": ppl,
                    "scrubbed_text": scrubbed,
                    "had_pii": np.asarray(had_pii, dtype=bool),
                    "toxic": np.asarray(toxic, dtype=bool),
                }
            )

    return score
