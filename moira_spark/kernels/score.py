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

# 256-entry lookup marking bytes that can START a lexicon prefix (both
# cases for letters): the window code is only worth computing at these
# positions, which cuts the rolling-code work from every buffer byte to the
# ~2-5% of bytes that match a first letter.
_TOX_FIRST_BYTE = np.zeros(256, dtype=bool)
for _c in _TOX_PREFIX_CODES:
    _b0 = int(_c) >> 24
    _TOX_FIRST_BYTE[_b0] = True
    if ord("a") <= _b0 <= ord("z"):
        _TOX_FIRST_BYTE[_b0 - 32] = True


def _any_per_segment(pos: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-text 'any hit position inside the segment' from SORTED hit
    positions — no per-byte float conversion, just one searchsorted."""
    idx = np.searchsorted(pos, offsets)
    return idx[1:] > idx[:-1]


def _fold(x: np.ndarray) -> np.ndarray:
    return np.where((x >= 65) & (x <= 90), x + 32, x)


def _candidate_masks(buffer, lengths, offsets):
    """(pii_candidate, tox_candidate) boolean arrays per text."""
    # PII requires a digit or '@'
    interesting = ((buffer >= ord("0")) & (buffer <= ord("9"))) | (
        buffer == ord("@")
    )
    pii = _any_per_segment(np.flatnonzero(interesting), offsets)
    # toxicity requires a case-folded 4-byte lexicon prefix somewhere;
    # compute the code only where the first byte can match the lexicon
    cand = np.flatnonzero(_TOX_FIRST_BYTE[buffer])
    cand = cand[cand <= len(buffer) - 4]
    if cand.size:
        code = (
            (_fold(buffer[cand].astype(np.int64)) << 24)
            | (_fold(buffer[cand + 1].astype(np.int64)) << 16)
            | (_fold(buffer[cand + 2].astype(np.int64)) << 8)
            | _fold(buffer[cand + 3].astype(np.int64))
        )
        hit_pos = cand[np.isin(code, _TOX_PREFIX_CODES)]
    else:
        hit_pos = np.empty(0, dtype=np.int64)
    tox = _any_per_segment(hit_pos, offsets)
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
