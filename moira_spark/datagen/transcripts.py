"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Schema (authoritative, BASELINE.json:15): conv_id string, turn_idx int32,
role string, text string, tool string, ts timestamp — plus a hidden
``defect`` column used only for generator sanity checks, never read by the
pipeline.

Determinism & distribution: the global conversation layout (which global
turn belongs to which conv) is a cheap pure function of (n_turns, seed); turn
CONTENT is generated block-by-block (fixed BLOCK_SIZE) with a per-block RNG,
so the identical table can be produced either single-process in pandas (for
the oracle/pytest path) or distributed via ``mapInPandas`` over block ids
(for bench scale) — same rows either way, independent of parallelism.

Skew by design: one hot conversation holds ~5% of all turns to exercise the
salted conversation-level aggregation (SURVEY.md §2.2 #10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from moira_spark.datagen import corpora

BLOCK_SIZE = 4096
HOT_CONV_ID = "conv_hot!"
BASE_TS_US = pd.Timestamp("2026-01-01").value // 1000  # microseconds

_DEFECTS = (
    ("too_short", 0.03),
    ("too_long", 0.01),
    ("high_symbol_ratio", 0.03),
    ("repetitive", 0.04),
    ("wrong_lang", 0.05),
    ("gibberish", 0.04),
    ("pii_email", 0.03),
    ("pii_phone", 0.02),
    ("pii_ssn", 0.01),
    ("pii_ip", 0.01),
    ("toxic_lexicon", 0.02),
    ("pii_overlap", 0.02),
)
_DEFECT_NAMES = ["clean"] + [d for d, _ in _DEFECTS]
_DEFECT_PROBS = np.array(
    [1.0 - sum(p for _, p in _DEFECTS)] + [p for _, p in _DEFECTS]
)

_SHORTS = ["ok", "k", "yes!", "no", "hm", "...", "?!", "np"]
_TOOLS = ["search", "calculator", "code_exec", "browser"]

_ALNUM_SOUP = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz0123456789", dtype=np.uint8)


def _mix(seed: int, block_id: int) -> int:
    return (seed * 1_000_003 + block_id * 7919 + 17) % (2**31 - 1)


def layout(n_turns: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Global conversation layout -> (conv lengths, conv start offsets).

    Conv 0 is the hot conversation (~5% of turns, uncapped); the rest draw
    lengths from Zipf(1.3) capped at 200 (FIXTURES.md §1 generator spec).
    """
    rng = np.random.RandomState(seed)
    hot = max(1, int(0.05 * n_turns))
    lengths = [hot]
    remaining = n_turns - hot
    while remaining > 0:
        draw = np.minimum(rng.zipf(1.3, size=4096), 200)
        cum = np.cumsum(draw)
        k = int(np.searchsorted(cum, remaining))
        if k < len(draw):
            take = draw[: k + 1].copy()
            take[-1] = remaining - (cum[k - 1] if k > 0 else 0)
            lengths.append(take)
            remaining = 0
        else:
            lengths.append(draw)
            remaining -= int(cum[-1])
    lens = np.concatenate([np.atleast_1d(np.asarray(x)) for x in lengths])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return lens.astype(np.int64), starts.astype(np.int64)


def n_blocks(n_turns: int) -> int:
    return (n_turns + BLOCK_SIZE - 1) // BLOCK_SIZE


def _conv_id(conv_no: int) -> str:
    return HOT_CONV_ID if conv_no == 0 else f"conv{conv_no:08d}"


def _gibberish_alnum(rng: np.random.RandomState, n_chars: int) -> str:
    """Letters/digit soup with spaces — high perplexity, low symbol ratio."""
    idx = rng.randint(0, len(_ALNUM_SOUP), size=n_chars)
    raw = _ALNUM_SOUP[idx].tobytes().decode("ascii")
    return " ".join(raw[i : i + 6] for i in range(0, len(raw), 6))


def _defect_text(defect: str, rng: np.random.RandomState) -> str:
    if defect == "clean":
        return corpora.en_sentence(rng, int(rng.randint(8, 60)))
    if defect == "too_short":
        return _SHORTS[rng.randint(len(_SHORTS))]
    if defect == "too_long":
        sents = [corpora.en_sentence(rng, 60) for _ in range(95)]
        return " ".join(sents)  # comfortably > MAX_CHARS chars
    if defect == "high_symbol_ratio":
        base = corpora.en_sentence(rng, 8)
        return base + " " + " ".join("$%^&*" for _ in range(12))
    if defect == "repetitive":
        line = corpora.en_sentence(rng, 10)
        return "\n".join([line] * 6)
    if defect == "wrong_lang":
        return corpora.xx_sentence(rng, int(rng.randint(15, 40)))
    if defect == "gibberish":
        return _gibberish_alnum(rng, int(rng.randint(90, 220)))
    base = corpora.en_sentence(rng, int(rng.randint(10, 30)))
    if defect == "pii_email":
        return base + f" contact me at user{rng.randint(1000)}@example.com please"
    if defect == "pii_phone":
        return base + f" call (555) {rng.randint(100, 999)}-{rng.randint(1000, 9999)} now"
    if defect == "pii_ssn":
        return base + f" ssn is {rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"
    if defect == "pii_ip":
        return base + f" host 192.168.{rng.randint(256)}.{rng.randint(256)} is up"
    if defect == "toxic_lexicon":
        from moira_spark import config

        word = config.TOXIC_LEXICON[rng.randint(len(config.TOXIC_LEXICON))]
        toks = base.split()
        toks.insert(len(toks) // 2, word)
        return " ".join(toks)
    if defect == "pii_overlap":
        # email inside a URL + phone adjacent to SSN (pins scrub ordering);
        # long base so the URL symbols don't trip the symbol-ratio rule.
        long_base = corpora.en_sentence(rng, int(rng.randint(50, 90)))
        return (
            long_base
            + f" see https://ex.org/u?email=bob{rng.randint(100)}@ex.org"
            + f" or 555-123-4567 123-45-6789"
        )
    raise ValueError(defect)


def gen_block(
    block_id: int,
    n_turns: int,
    lens: np.ndarray,
    starts: np.ndarray,
    seed: int = 42,
) -> pd.DataFrame:
    """Generate rows for global turn indices [block*B, min((block+1)*B, n))."""
    lo = block_id * BLOCK_SIZE
    hi = min(lo + BLOCK_SIZE, n_turns)
    if lo >= hi:
        return _empty()
    rng = np.random.RandomState(_mix(seed, block_id))
    g = np.arange(lo, hi)
    conv_no = np.searchsorted(starts, g, side="right") - 1
    turn_idx = (g - starts[conv_no]).astype(np.int32)

    defect_idx = rng.choice(len(_DEFECT_NAMES), size=len(g), p=_DEFECT_PROBS)
    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    is_tool = rng.random_sample(len(g)) < 0.08
    roles[is_tool] = "tool"
    roles[turn_idx == 0] = np.where(
        rng.random_sample((turn_idx == 0).sum()) < 0.3, "system", "user"
    )

    texts, defects, tools = [], [], []
    for i in range(len(g)):
        d = _DEFECT_NAMES[defect_idx[i]]
        defects.append(d)
        texts.append(_defect_text(d, rng))
        tools.append(_TOOLS[rng.randint(len(_TOOLS))] if roles[i] == "tool" else None)

    # ts: monotone within conversation, deterministic per (conv, turn).
    conv_offset = (conv_no * 977) % 86_400
    ts_us = BASE_TS_US + (conv_offset * 1_000_000) + turn_idx.astype(np.int64) * 7_000_000
    df = pd.DataFrame(
        {
            "conv_id": np.array([_conv_id(c) for c in conv_no], dtype=object),
            "turn_idx": turn_idx,
            "role": roles,
            "text": np.array(texts, dtype=object),
            "tool": np.array(tools, dtype=object),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "defect": np.array(defects, dtype=object),
        }
    )
    # ~0.5% duplicated (conv_id, turn_idx) rows with later ts — exercises the
    # stable-ordering dedupe (keep lowest ts).
    dup_mask = rng.random_sample(len(df)) < 0.005
    if dup_mask.any():
        dups = df[dup_mask].copy()
        dups["ts"] = dups["ts"] + pd.Timedelta(hours=1)
        dups["text"] = dups["text"] + " (retry)"
        df = pd.concat([df, dups], ignore_index=True)
    return df


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype=np.int32),
            "role": pd.Series(dtype=object),
            "text": pd.Series(dtype=object),
            "tool": pd.Series(dtype=object),
            "ts": pd.Series(dtype="datetime64[us]"),
            "defect": pd.Series(dtype=object),
        }
    )


def gen_pandas(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Whole table in one process (oracle / pytest scale)."""
    lens, starts = layout(n_turns, seed)
    blocks = [
        gen_block(b, n_turns, lens, starts, seed) for b in range(n_blocks(n_turns))
    ]
    return pd.concat(blocks, ignore_index=True)


# The pipeline-facing input schema (BASELINE.json:15).  The generator's
# TRANSCRIPT_SCHEMA appends a hidden `defect` column for sanity checks only;
# streaming readers must use PIPELINE_SCHEMA (never a textual edit of the
# generator schema, which would silently drift on reorder/rename).
PIPELINE_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
TRANSCRIPT_SCHEMA = PIPELINE_SCHEMA + ", defect string"


def gen_spark(spark, n_turns: int, seed: int = 42, drop_defect: bool = True):
    """Distributed generation: one task per block via mapInPandas.

    The layout arrays are small (n_convs ~ n_turns/20) and shipped via
    closure capture (broadcast by Spark's task serializer once per stage).
    """
    import pyspark.sql.functions as F

    lens, starts = layout(n_turns, seed)
    nb = n_blocks(n_turns)

    def gen(iterator):
        for pdf in iterator:
            for b in pdf["id"].tolist():
                yield gen_block(int(b), n_turns, lens, starts, seed)

    base = spark.range(0, nb, 1, numPartitions=min(nb, 256))
    df = base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    if drop_defect:
        df = df.drop("defect")
    return df.withColumn("turn_idx", F.col("turn_idx").cast("int"))
