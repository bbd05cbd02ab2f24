"""Learned document-quality classifier (fineweb-edu / DCLM-style pass).

Production training-data pipelines layer a LEARNED quality model on top of
the heuristic rules: heuristics catch mechanical junk, the model ranks the
long tail.  fastText (the usual choice) is absent from this sandbox and the
north rule demands from-scratch models anyway, so this is a seeded numpy
logistic regression over cheap surface features — the same build-time
training + broadcast + single-Arrow-hop serving shape as kernels/langid.py
and kernels/lm.py.

Weak supervision, like the real pipelines: positives are clean seeded
English documents, negatives are the three corruption modes the heuristic
tier fires on (uniform character soup, repetition bombs, symbol spam) —
the model learns to score a CONTINUUM from the binary weak labels, which
is what lets it rank documents the hard thresholds cannot separate.

Everything is a pure function of the seed: training corpus, init, and the
fixed-iteration full-batch gradient descent, so scores are bit-stable
across runs, hosts, and cluster sizes.
"""

from __future__ import annotations

import numpy as np

from moira_spark.datagen import corpora

_STOPWORDS = frozenset(
    "the of and to in is that it was for on are as with his they at be "
    "this have from or had by but not what all were when your can said".split()
)

FEATURE_NAMES = (
    "log_len",
    "mean_word_len",
    "stopword_ratio",
    "symbol_ratio",
    "digit_ratio",
    "distinct_word_ratio",
    "max_word_freq",
    "space_ratio",
)


def features(texts) -> np.ndarray:
    """(n, 8) float64 surface features; pure function of the text."""
    out = np.empty((len(texts), len(FEATURE_NAMES)), dtype=np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        n = len(t)
        words = t.split()
        nw = max(len(words), 1)
        alnum_sp = sum(c.isalnum() or c == " " for c in t)
        digits = sum(c.isdigit() for c in t)
        spaces = t.count(" ")
        uniq = len(set(words))
        freqs = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
        out[i] = (
            np.log1p(n),
            sum(len(w) for w in words) / nw,
            sum(w.lower() in _STOPWORDS for w in words) / nw,
            (n - alnum_sp) / max(n, 1),
            digits / max(n, 1),
            uniq / nw,
            (max(freqs.values()) if freqs else 0) / nw,
            spaces / max(n, 1),
        )
    return out


def _corrupt_repeat(rng: np.random.RandomState, n_words: int) -> str:
    """Repetition bomb: one short phrase stuttered to document length."""
    phrase = corpora.en_sentence(rng, rng.randint(2, 5)).rstrip(".!?,")
    reps = max(n_words // max(len(phrase.split()), 1), 2)
    return " ".join([phrase] * reps) + "."


def _corrupt_symbols(rng: np.random.RandomState, n_words: int) -> str:
    """Symbol spam: clean text interleaved with heavy punctuation noise."""
    base = corpora.en_sentence(rng, n_words).split()
    syms = ["#$%", "@@!", "^&*", "[]{}", "<<>>", "~~|~~"]
    out = []
    for w in base:
        out.append(w)
        if rng.rand() < 0.6:
            out.append(syms[rng.randint(len(syms))])
    return " ".join(out)


def training_set(
    seed: int = 42, n_per_class: int = 300, words_per_doc: int = 60
) -> tuple[list[str], np.ndarray]:
    """(texts, labels): label 1 = clean, 0 = corrupted (3 modes evenly)."""
    rng = np.random.RandomState(seed)
    pos = [corpora.en_sentence(rng, words_per_doc) for _ in range(n_per_class)]
    third = n_per_class // 3
    neg = (
        [corpora.gibberish(rng, words_per_doc * 6) for _ in range(third)]
        + [_corrupt_repeat(rng, words_per_doc) for _ in range(third)]
        + [
            _corrupt_symbols(rng, words_per_doc)
            for _ in range(n_per_class - 2 * third)
        ]
    )
    texts = pos + neg
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    return texts, y


class QualityModel:
    """Standardized-feature logistic regression; plain numpy arrays so the
    whole model broadcasts as one small object."""

    __slots__ = ("w", "b", "mu", "sigma")

    def __init__(self, w, b, mu, sigma):
        self.w, self.b, self.mu, self.sigma = w, b, mu, sigma

    def score(self, texts) -> np.ndarray:
        """P(clean) per text, float64 in [0, 1]."""
        X = (features(texts) - self.mu) / self.sigma
        z = X @ self.w + self.b
        return 1.0 / (1.0 + np.exp(-z))


def train(
    seed: int = 42,
    n_per_class: int = 300,
    iters: int = 400,
    lr: float = 0.5,
) -> QualityModel:
    """Deterministic full-batch logistic regression (fixed iterations, zero
    init — no randomness beyond the seeded corpus)."""
    texts, y = training_set(seed, n_per_class)
    X = features(texts)
    mu = X.mean(axis=0)
    sigma = np.where(X.std(axis=0) == 0.0, 1.0, X.std(axis=0))
    Xs = (X - mu) / sigma
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        g = p - y
        w -= lr * (Xs.T @ g / n + 1e-4 * w)
        b -= lr * g.mean()
    return QualityModel(w, b, mu, sigma)
