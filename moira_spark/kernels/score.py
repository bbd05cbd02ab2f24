"""Fused per-batch scoring kernel — the single shared entry point for all
Python-side per-turn scores (language ID, perplexity, repetition, scrub).

Both the pandas oracle and the Spark Arrow UDF call ``score_batch``, so the
two sides share one code path end-to-end, and the byte buffer is packed
exactly once per batch for both n-gram models.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

from moira_spark import config
from moira_spark.kernels import hashing, scrub, text as textk

if TYPE_CHECKING:
    from moira_spark.kernels.langid import LangIdModel
    from moira_spark.kernels.lm import BigramLM

# 4-byte case-folded prefixes of the toxic lexicon: a text without any of
# these rolling codes cannot contain a toxic word (false positives are fine
# — they just run the regex).
_TOX_PREFIX_CODES = np.array(
    sorted(
        {
            int.from_bytes(w.lower().encode()[:4], "big")
            for w in config.TOXIC_LEXICON
        }
    ),
    dtype=np.int64,
)


def _candidate_masks(buffer, lengths, offsets):
    """(pii_candidate, tox_candidate) boolean arrays per text."""
    # PII requires a digit or '@'
    interesting = ((buffer >= ord("0")) & (buffer <= ord("9"))) | (
        buffer == ord("@")
    )
    pii = (
        hashing.segment_sums(interesting.astype(np.float64), lengths, offsets, 1)
        > 0
    )
    # toxicity requires a case-folded 4-byte lexicon prefix somewhere
    b = buffer.astype(np.int64)
    lower = np.where((b >= 65) & (b <= 90), b + 32, b)
    if len(lower) >= 4:
        code = np.zeros(len(lower), dtype=np.int64)
        code[:-3] = (
            (lower[:-3] << 24) | (lower[1:-2] << 16) | (lower[2:-1] << 8) | lower[3:]
        )
        hit = np.isin(code, _TOX_PREFIX_CODES)
    else:
        hit = np.zeros(len(lower), dtype=bool)
    tox = (
        hashing.segment_sums(hit.astype(np.float64), lengths, offsets, 1) > 0
    )
    return pii, tox


def score_batch(texts, langid_model: "LangIdModel", lm_model: "BigramLM"):
    """-> dict of numpy arrays/lists, one entry per text in order."""
    buffer, lengths, offsets = hashing.pack_texts(texts)
    langs, confs = langid_model.predict_packed(buffer, lengths, offsets)
    ppl = lm_model.perplexity_packed(buffer, lengths, offsets)
    rep = textk.repetition_flags(texts)
    pii_cand, tox_cand = _candidate_masks(buffer, lengths, offsets)
    scrubbed, had_pii, toxic = scrub.scrub_batch(texts, pii_cand, tox_cand)
    return {
        "rep_fail": rep,
        "lang": langs,
        "lang_conf": confs,
        "ppl": ppl,
        "scrubbed_text": scrubbed,
        "had_pii": np.asarray(had_pii, dtype=bool),
        "toxic": np.asarray(toxic, dtype=bool),
    }
