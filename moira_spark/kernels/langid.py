"""From-scratch fastText-style language identifier.

Multinomial Naive Bayes over hashed byte-trigram features — the same model
family as fastText's linear classifier over char-n-gram hash buckets, rebuilt
from scratch in numpy (the fasttext package is absent and the north rule
demands from-scratch models; BASELINE.json:14).

The model is trained once on the driver from seeded corpora
(``datagen.corpora``), broadcast to executors, and applied per Arrow batch by
fully vectorized numpy — no per-row Python (BASELINE.json:15).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from moira_spark import config
from moira_spark.kernels import hashing

# Temperature applied to mean per-trigram log-likelihood gaps before softmax;
# chosen so in-distribution text saturates conf -> 1 while short/ambiguous
# text lands mid-range.  Part of the spec of record (shared oracle/pipeline).
_CONF_TEMPERATURE = 25.0


@dataclass(frozen=True)
class LangIdModel:
    langs: tuple[str, ...]
    # shape (n_langs, dim + 1), float64; bucket ``dim`` is the sentinel with
    # log-likelihood exactly 0.0 (masked boundary positions land there).
    log_likelihood: np.ndarray
    dim: int

    def predict(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized batch prediction -> (lang labels, confidences)."""
        buffer, lengths, offsets = hashing.pack_texts(texts)
        return self.predict_packed(buffer, lengths, offsets)

    def predict_packed(
        self, buffer: np.ndarray, lengths: np.ndarray, offsets: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Prediction over a pre-packed byte buffer (shared with the LM so a
        fused scoring pass encodes each batch exactly once)."""
        n = len(lengths)
        if n == 0:
            return np.empty(0, dtype=object), np.empty(0, dtype=np.float64)
        h = hashing.trigram_hashes(buffer, self.dim)
        hashing.mask_tails(h, lengths, offsets, 3, sentinel=self.dim)
        counts = hashing.segment_counts(lengths, 3).astype(np.float64)
        scores = np.empty((len(self.langs), n), dtype=np.float64)
        for li in range(len(self.langs)):
            vals = self.log_likelihood[li][h]
            scores[li] = hashing.segment_sums(vals, lengths, offsets, 3)
        safe_counts = np.maximum(counts, 1.0)
        mean_scores = scores / safe_counts
        best = np.argmax(mean_scores, axis=0)
        shifted = (mean_scores - mean_scores.max(axis=0)) * _CONF_TEMPERATURE
        expv = np.exp(shifted)
        conf = expv[best, np.arange(n)] / expv.sum(axis=0)
        labels = np.array(self.langs, dtype=object)[best]
        # Texts with no trigram at all: undetermined.
        empty = counts == 0
        labels[empty] = "und"
        conf[empty] = 0.0
        return labels, conf


def train(corpora: dict[str, list[str]], dim: int = config.LANGID_DIM) -> LangIdModel:
    """Fit NB log-likelihoods with add-one smoothing, vectorized."""
    langs = tuple(sorted(corpora))
    loglik = np.zeros((len(langs), dim + 1), dtype=np.float64)
    for li, lang in enumerate(langs):
        buffer, lengths, offsets = hashing.pack_texts(corpora[lang])
        valid = hashing.valid_mask(lengths, offsets, 3)
        h = hashing.trigram_hashes(buffer, dim)
        bucket_counts = np.bincount(h[valid], minlength=dim).astype(np.float64)
        total = bucket_counts.sum()
        loglik[li, :dim] = np.log((bucket_counts + 1.0) / (total + dim))
        # loglik[li, dim] stays exactly 0.0 — the sentinel bucket.
    return LangIdModel(langs=langs, log_likelihood=loglik, dim=dim)


_DEFAULT_MODEL: LangIdModel | None = None


def default_model() -> LangIdModel:
    """The seeded en-vs-xx model used by the transcript pipeline."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        from moira_spark.datagen.corpora import training_corpora

        _DEFAULT_MODEL = train(training_corpora(seed=config.LANGID_SEED))
    return _DEFAULT_MODEL
