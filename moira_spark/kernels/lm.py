"""From-scratch KenLM-style character language model -> perplexity.

This is the transposition of moira's core: the Poisson-binomial
expected-error bound over per-base error probabilities (bernoullimodule.c
``calculate_errors_PB`` [M], reconstructed — /root/reference is empty, see
SURVEY.md §0) becomes a per-turn expected-"error" (surprisal) bound: a byte
bigram LM with add-one smoothing assigns each character a log-probability
(the analog of the per-base Phred-derived p_i), and the turn-level perplexity
``exp(-mean log2...e P(c_i|c_{i-1}))`` is thresholded exactly like moira's
``expected_errors <= uncert * length`` gate.

The full 256x256 conditional table is exact (no hashing), trained once on the
driver from the seeded clean corpus and broadcast; scoring is pure vectorized
numpy over Arrow batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from moira_spark import config
from moira_spark.kernels import hashing


@dataclass(frozen=True)
class BigramLM:
    log_prob: np.ndarray  # shape (65536,), float64: log P(b1 | b0) flattened

    def perplexity(self, texts) -> np.ndarray:
        """Vectorized per-text perplexity; texts with <2 bytes get ppl=1.0."""
        n = len(texts)
        if n == 0:
            return np.empty(0, dtype=np.float64)
        buffer, lengths = hashing.pack_texts(texts)
        seg_ids, valid = hashing.ngram_positions(lengths, 2)
        codes = hashing.bigram_codes(buffer)
        counts = hashing.segment_counts(lengths, 2).astype(np.float64)
        sums = hashing.segment_sums(self.log_prob[codes], seg_ids, valid, n)
        mean_lp = sums / np.maximum(counts, 1.0)
        ppl = np.exp(-mean_lp)
        ppl[counts == 0] = 1.0
        return ppl


def train(corpus: list[str]) -> BigramLM:
    """Fit the byte-bigram table with add-one smoothing."""
    buffer, lengths = hashing.pack_texts(corpus)
    seg_ids, valid = hashing.ngram_positions(lengths, 2)
    codes = hashing.bigram_codes(buffer)
    counts = np.bincount(codes[valid], minlength=65536).astype(np.float64)
    counts = counts.reshape(256, 256)
    row_totals = counts.sum(axis=1, keepdims=True)
    log_prob = np.log((counts + 1.0) / (row_totals + 256.0))
    return BigramLM(log_prob=log_prob.reshape(-1))


_DEFAULT_MODEL: BigramLM | None = None


def default_model() -> BigramLM:
    """Seeded clean-English LM used by the transcript pipeline."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        from moira_spark.datagen.corpora import training_corpora

        _DEFAULT_MODEL = train(training_corpora(seed=config.LM_SEED)["en"])
    return _DEFAULT_MODEL
