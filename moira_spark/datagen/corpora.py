"""Deterministic seeded corpora for model training and transcript synthesis.

fastText-the-package and kenlm are absent from this sandbox (verified; see
SURVEY.md §7.8) and the north rule demands from-scratch models anyway, so the
language-ID classifier and the perplexity LM are trained at build time on
these seeded corpora.  Everything is a pure function of the seed — no
wall-clock, no network — so reference labels are stable across runs, hosts,
and cluster sizes (FIXTURES.md requirement).
"""

from __future__ import annotations

import numpy as np

# Clean "language A" (English-like) vocabulary: function words + a domain
# vocabulary with ordinary English character statistics.
EN_VOCAB = (
    "the of and to in is that it was for on are as with his they at be this "
    "have from or had by word but not what all were when your can said there "
    "use each which she how will other about out many then them these some "
    "would make like him into time has look two more write see number way "
    "could people than first water been call who oil now find long down day "
    "did get come made may part over new sound take only little work know "
    "place year live back give most very after thing our just name good "
    "sentence man think say great where help through much before line right "
    "too mean old any same tell boy follow came want show also around form "
    "three small set put end does another well large must big even such "
    "because turn here why ask went men read need land different home us "
    "move try kind hand picture again change off play spell air away animal "
    "house point page letter mother answer found study still learn should "
    "america world"
).split()

# Synthetic "language B": pseudo-words built from digraphs rare in English so
# a char-trigram classifier separates it sharply.  Fixed literal list —
# deterministic by construction.
XX_SYLLABLES = (
    "zvar", "kqet", "vzol", "gzhu", "txen", "qvir", "zhak", "xvod",
    "kzam", "vqul", "zgor", "qxit", "wzur", "jvek", "xqan", "zvyl",
)


def xx_vocab() -> list[str]:
    """~256 deterministic language-B pseudo-words (syllable pairs)."""
    return [a + b for a in XX_SYLLABLES for b in XX_SYLLABLES]


GIBBERISH_ALPHABET = np.frombuffer(
    b"abcdefghijklmnopqrstuvwxyz0123456789@#$%^&*()_+-=[]{}|;:,.<>?/", dtype=np.uint8
)

_PUNCT = [".", ".", ".", "!", "?", ","]

# Shifted power-law over vocabulary ranks: P(r) ∝ 1/(r+5).  Top-word mass
# ≈5.5% — matches natural English ("the" ≈ 7%) far better than np.zipf's
# ≥32% head, which made clean text trip the repetition rule.
_EN_RANK_P = 1.0 / (np.arange(len(EN_VOCAB)) + 5.0)
_EN_RANK_P /= _EN_RANK_P.sum()


def en_sentence(rng: np.random.RandomState, n_words: int) -> str:
    """One clean English-like sentence with natural word frequencies.

    Adjacent duplicate draws are collapsed — natural text does not stutter,
    and without this the repetition rule would misfire on clean turns.
    """
    ranks = rng.choice(len(EN_VOCAB), size=n_words, p=_EN_RANK_P)
    keep = np.concatenate(([True], ranks[1:] != ranks[:-1]))
    toks = [EN_VOCAB[r] for r in ranks[keep]]
    return " ".join(toks) + _PUNCT[rng.randint(len(_PUNCT))]


def xx_sentence(rng: np.random.RandomState, n_words: int) -> str:
    vocab = xx_vocab()
    idx = rng.randint(0, len(vocab), size=n_words)
    return " ".join(vocab[i] for i in idx) + "."


def gibberish(rng: np.random.RandomState, n_chars: int) -> str:
    """High-perplexity character soup (uniform bytes over a wide alphabet)."""
    idx = rng.randint(0, len(GIBBERISH_ALPHABET), size=n_chars)
    return GIBBERISH_ALPHABET[idx].tobytes().decode("ascii")


def training_corpora(
    seed: int = 42, docs_per_lang: int = 400, words_per_doc: int = 60
) -> dict[str, list[str]]:
    """Seeded training corpora for the langid classifier and the LM."""
    rng = np.random.RandomState(seed)
    en = [en_sentence(rng, words_per_doc) for _ in range(docs_per_lang)]
    xx = [xx_sentence(rng, words_per_doc) for _ in range(docs_per_lang)]
    return {"en": en, "xx": xx}
