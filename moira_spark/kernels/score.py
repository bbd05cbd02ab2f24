"""Fused per-batch scoring kernel — the single shared entry point for all
Python-side per-turn scores (language ID, perplexity, repetition, scrub).

Both the pandas oracle and the Spark Arrow UDF call ``score_batch``, so the
two sides share one code path end-to-end, and the byte buffer is packed
exactly once per batch for both n-gram models.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

from moira_spark.kernels import hashing, scrub, text as textk

if TYPE_CHECKING:
    from moira_spark.kernels.langid import LangIdModel
    from moira_spark.kernels.lm import BigramLM


def score_batch(texts, langid_model: "LangIdModel", lm_model: "BigramLM"):
    """-> dict of numpy arrays/lists, one entry per text in order."""
    buffer, lengths, offsets = hashing.pack_texts(texts)
    langs, confs = langid_model.predict_packed(buffer, lengths, offsets)
    ppl = lm_model.perplexity_packed(buffer, lengths, offsets)
    rep = textk.repetition_flags(texts)
    # PII requires a digit or '@' — cheap vectorized candidate mask lets the
    # scrubber skip the expensive regex scan for the clean majority.
    interesting = ((buffer >= ord("0")) & (buffer <= ord("9"))) | (
        buffer == ord("@")
    )
    per_text = hashing.segment_sums(
        interesting.astype(np.float64), lengths, offsets, 1
    )
    scrubbed, had_pii, toxic = scrub.scrub_batch(texts, per_text > 0)
    return {
        "rep_fail": rep,
        "lang": langs,
        "lang_conf": confs,
        "ppl": ppl,
        "scrubbed_text": scrubbed,
        "had_pii": np.asarray(had_pii, dtype=bool),
        "toxic": np.asarray(toxic, dtype=bool),
    }
