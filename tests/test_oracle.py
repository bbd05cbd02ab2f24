"""Generator + pure-pandas oracle tests (no Spark — fast)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from moira_spark import config
from moira_spark.datagen import transcripts as tg
from moira_spark.oracle import ref_pipeline as orc


def test_generator_deterministic():
    a = tg.gen_pandas(2000, seed=42)
    b = tg.gen_pandas(2000, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_generator_block_independence():
    """Content of a block doesn't depend on which process makes it."""
    lens, starts = tg.layout(5000, 42)
    one = tg.gen_block(1, 5000, lens, starts, 42)
    again = tg.gen_block(1, 5000, lens, starts, 42)
    pd.testing.assert_frame_equal(one, again)


def test_hot_conversation_share():
    df = tg.gen_pandas(20_000, seed=42)
    share = (df.conv_id == tg.HOT_CONV_ID).mean()
    assert 0.04 < share < 0.07


def test_ts_monotone_within_conv():
    df = tg.gen_pandas(3000, seed=42)
    df = df[~df.text.str.endswith("(retry)")]
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert (g.diff().dropna() > pd.Timedelta(0)).all()


def test_dedupe_keeps_lowest_ts():
    df = tg.gen_pandas(5000, seed=42)
    dd = orc.dedupe_stable(df)
    assert not dd.duplicated(["conv_id", "turn_idx"]).any()
    # retries (later ts) must be gone
    assert not dd.text.str.endswith("(retry)").any()


def test_defects_map_to_expected_rules():
    df = tg.gen_pandas(4000, seed=42)
    labels = orc.run(df)
    dd = orc.dedupe_stable(df)
    j = labels.merge(dd[["conv_id", "turn_idx", "defect"]], on=["conv_id", "turn_idx"])

    def keep_rate(d):
        return j[j.defect == d].keep.mean()

    assert keep_rate("clean") > 0.98
    for d in ("too_short", "too_long", "wrong_lang", "gibberish",
              "repetitive", "high_symbol_ratio", "toxic_lexicon"):
        assert keep_rate(d) == 0.0, d
    for d in ("pii_email", "pii_phone", "pii_ssn", "pii_ip", "pii_overlap"):
        assert keep_rate(d) > 0.9, d

    # scrubbed text differs exactly on PII/toxic turns
    pii = j[j.defect.str.startswith("pii")]
    orig = dd.merge(pii[["conv_id", "turn_idx"]], on=["conv_id", "turn_idx"])
    assert (pii.sort_values(["conv_id", "turn_idx"]).scrubbed_text.to_numpy()
            != orig.sort_values(["conv_id", "turn_idx"]).text.to_numpy()).all()


def test_reasons_sorted_and_valid():
    labels = orc.run(tg.gen_pandas(2000, seed=42))
    for rr in labels.reasons:
        assert rr == sorted(rr)
        assert all(r in config.ALL_REASONS for r in rr)


def test_conv_verdict_threshold():
    labels = orc.run(tg.gen_pandas(4000, seed=42))
    bad = (~labels.keep).groupby(labels.conv_id).sum()
    conv_keep = labels.groupby("conv_id").conv_keep.first()
    expect = bad <= config.CONV_MAX_BAD_TURNS
    assert (conv_keep.sort_index() == expect.sort_index()).all()


def test_oracle_deterministic():
    l1 = orc.run(tg.gen_pandas(2000, seed=42))
    l2 = orc.run(tg.gen_pandas(2000, seed=42))
    assert l1.drop(columns="reasons").equals(l2.drop(columns="reasons"))
    assert list(l1.reasons) == list(l2.reasons)
