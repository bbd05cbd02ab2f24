"""Byte-pair-encoding tokenizer: trained merge table + lossless encode.

The classic algorithm of Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016), reimplemented from
the paper: words are split into symbol sequences (characters, with an
end-of-word marker on the final character), and training greedily merges the
most frequent adjacent symbol pair until the merge budget is exhausted.
Ties break lexicographically so training is fully deterministic — the merge
table is a pure function of the corpus sample.

Scale shape (mirrors the learned-quality-classifier pattern in
harness/text.py): TRAIN on a bounded driver-side sample (training reads a
frequency dict, not the corpus — thousands of docs saturate the merge
statistics), BROADCAST the merge table, APPLY executor-side in Arrow
batches.  Encoding is cached per distinct word within a batch — natural
text repeats words heavily, so the per-word merge loop runs once per
distinct word, not once per token.  At production scale the apply step
would swap in a compiled tokenizer with the same merge table; the Spark
plumbing (broadcast artifact, one mapInPandas hop, no per-row Python) is
identical either way.

BPE is LOSSLESS by construction: concatenating the emitted subwords and
replacing each end-of-word marker with a space reproduces the exact input
word sequence.  harness/text.py turns that into an in-query hard-fail
(decode(encode(text)) must equal the normalized text for EVERY row), which
is what makes the rows-only driver check meaningful.
"""

from __future__ import annotations

from collections import Counter

# End-of-word marker appended to a word's final symbol (Sennrich et al. use
# "</w>"); chosen outside any plausible document alphabet.
EOW = "\x01"


def _words(text: str) -> list[str]:
    return [w for w in text.split(" ") if w]


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def train_bpe(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn a merge table from a corpus sample.

    Greedy most-frequent-pair merging over the word frequency dict; ties
    break on the lexicographically smallest pair so the table is
    deterministic.  Stops early when no pair occurs twice (merging
    singletons would just memorize the sample)."""
    vocab: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in _words(t):
            vocab[_word_symbols(w)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], _inv(kv[0])))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Counter[tuple[str, ...]] = Counter()
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


class _Inv:
    """Reverse-lexicographic wrapper: max() over (freq, _Inv(pair)) picks the
    highest frequency, breaking ties on the SMALLEST pair."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return self.v > other.v

    def __eq__(self, other):
        return self.v == other.v


def _inv(pair):
    return _Inv(pair)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (lowest trained rank first) —
    the standard BPE inference loop."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_batch(
    texts: list[str], merges: list[tuple[str, str]]
) -> list[list[str]]:
    """Encode a batch of documents; per-distinct-word cache amortizes the
    merge loop across repeated words (the common case in natural text)."""
    ranks = {p: i for i, p in enumerate(merges)}
    cache: dict[str, list[str]] = {}
    out = []
    for t in texts:
        toks: list[str] = []
        for w in _words(t):
            enc = cache.get(w)
            if enc is None:
                enc = encode_word(w, ranks)
                cache[w] = enc
            toks.extend(enc)
        out.append(toks)
    return out


def decode(tokens: list[str]) -> str:
    """Inverse of encode: concatenate subwords, end-of-word marker -> space.
    Lossless up to word-separator normalization (multiple spaces collapse,
    which the harness normalizes on the reference side too)."""
    return "".join(tokens).replace(EOW, " ").rstrip(" ")
