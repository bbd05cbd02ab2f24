"""Pure-pandas reference pipeline — the spec of record for labels.

Single-node, deterministic implementation of the exact per-turn semantics
(rules -> scores -> scrub -> verdicts).  It generates the "reference labels"
against which the Spark pipeline is gated (F1 >= 0.99 keep/drop, byte-exact
scrubbed text; BASELINE.json:2,14).  The Spark pipeline and this oracle call
the SAME kernels (moira_spark.kernels), so agreement is by construction;
this file additionally re-states the decision logic in plain pandas so a
reviewer can read the whole contract in one place (SURVEY.md §5.2.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from moira_spark import config
from moira_spark.kernels import langid, lm, text as textk
from moira_spark.kernels.score import score_batch


def dedupe_stable(df: pd.DataFrame) -> pd.DataFrame:
    """Stable turn ordering: for duplicate (conv_id, turn_idx) keep lowest ts
    (ties -> lexicographically smallest text, then role, then tool — a total
    order over every surviving column, mirroring operators/ordering.py;
    pandas na_position='last' matches Spark asc_nulls_last)."""
    df = df.sort_values(
        ["conv_id", "turn_idx", "ts", "text", "role", "tool"],
        kind="mergesort",
        na_position="last",
    ).reset_index(drop=True)
    return df.drop_duplicates(["conv_id", "turn_idx"], keep="first").reset_index(
        drop=True
    )


def label_turns(df: pd.DataFrame) -> pd.DataFrame:
    """Per-turn labels for a deduped transcripts frame (FIXTURES.md §2)."""
    texts = df["text"].fillna("").tolist()
    n = len(texts)

    length_fail = np.fromiter(
        (textk.length_rule_fails(t) for t in texts), dtype=bool, count=n
    )
    symbol_fail = np.fromiter(
        (textk.symbol_rule_fails(t) for t in texts), dtype=bool, count=n
    )

    s = score_batch(texts, langid.default_model(), lm.default_model())
    rep_fail = s["rep_fail"]
    langs, confs, ppl = s["lang"], s["lang_conf"], s["ppl"]
    scrubbed = s["scrubbed_text"]
    lang_fail = ~(
        np.isin(langs.astype(str), config.LANG_ALLOWLIST)
        & (confs >= config.LANG_MIN_CONF)
    )
    text_lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    ppl_fail = (ppl > config.PPL_MAX) & (text_lens >= config.PPL_MIN_CHARS)
    toxic_fail = s["toxic"]

    reason_flags = {
        config.REASON_LANGUAGE: lang_fail,
        config.REASON_LENGTH: length_fail,
        config.REASON_PERPLEXITY: ppl_fail,
        config.REASON_REPETITION: rep_fail,
        config.REASON_SYMBOL: symbol_fail,
        config.REASON_TOXICITY: toxic_fail,
    }
    keep = ~np.logical_or.reduce(list(reason_flags.values()))
    reasons = [
        [r for r in config.ALL_REASONS if reason_flags[r][i]] for i in range(n)
    ]

    out = pd.DataFrame(
        {
            "conv_id": df["conv_id"].to_numpy(),
            "turn_idx": df["turn_idx"].to_numpy().astype(np.int32),
            "keep": keep,
            "reasons": reasons,
            "scrubbed_text": scrubbed,
            "lang": langs.astype(str),
            "lang_conf": confs,
            "ppl": ppl,
        }
    )
    return out


def label_conversations(turn_labels: pd.DataFrame) -> pd.DataFrame:
    """Conversation verdict: drop conv when > CONV_MAX_BAD_TURNS bad turns
    (moira's whole-read discard lifted to the conversation level)."""
    bad = (
        (~turn_labels["keep"])
        .groupby(turn_labels["conv_id"])
        .sum()
        .rename("bad_turns")
        .reset_index()
    )
    bad["conv_keep"] = bad["bad_turns"] <= config.CONV_MAX_BAD_TURNS
    return bad[["conv_id", "conv_keep", "bad_turns"]]


def run(df: pd.DataFrame) -> pd.DataFrame:
    """Full oracle: dedupe -> per-turn labels -> conv verdict (joined)."""
    deduped = dedupe_stable(df)
    labels = label_turns(deduped)
    conv = label_conversations(labels)
    return labels.merge(conv[["conv_id", "conv_keep"]], on="conv_id", how="left")
