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
    # shape (65537,): log P(b1|b0) flattened, plus a sentinel bucket at index
    # 65536 holding exactly 0.0 (masked boundary positions land there).
    log_prob: np.ndarray

    def perplexity(self, texts) -> np.ndarray:
        """Vectorized per-text perplexity; texts with <2 bytes get ppl=1.0."""
        buffer, lengths, offsets = hashing.pack_texts(texts)
        return self.perplexity_packed(buffer, lengths, offsets)

    def perplexity_packed(
        self, buffer: np.ndarray, lengths: np.ndarray, offsets: np.ndarray
    ) -> np.ndarray:
        n = len(lengths)
        if n == 0:
            return np.empty(0, dtype=np.float64)
        codes = hashing.bigram_codes(buffer)
        hashing.mask_tails(codes, lengths, offsets, 2, sentinel=65536)
        counts = hashing.segment_counts(lengths, 2).astype(np.float64)
        sums = hashing.segment_sums(self.log_prob[codes], lengths, offsets, 2)
        mean_lp = sums / np.maximum(counts, 1.0)
        ppl = np.exp(-mean_lp)
        ppl[counts == 0] = 1.0
        return ppl


def train(corpus: list[str]) -> BigramLM:
    """Fit the byte-bigram table with add-one smoothing."""
    buffer, lengths, offsets = hashing.pack_texts(corpus)
    valid = hashing.valid_mask(lengths, offsets, 2)
    codes = hashing.bigram_codes(buffer)
    counts = np.bincount(codes[valid], minlength=65536).astype(np.float64)
    counts = counts.reshape(256, 256)
    row_totals = counts.sum(axis=1, keepdims=True)
    log_prob = np.log((counts + 1.0) / (row_totals + 256.0))
    # sentinel bucket (index 65536) = exactly 0.0 for masked positions
    return BigramLM(log_prob=np.append(log_prob.reshape(-1), 0.0))


_DEFAULT_MODEL: BigramLM | None = None


def default_model() -> BigramLM:
    """Seeded clean-English LM used by the transcript pipeline."""
    global _DEFAULT_MODEL
    if _DEFAULT_MODEL is None:
        from moira_spark.datagen.corpora import training_corpora

        _DEFAULT_MODEL = train(training_corpora(seed=config.LM_SEED)["en"])
    return _DEFAULT_MODEL
