"""Spark pipeline vs pandas oracle — the core correctness gates.

Gates (BASELINE.json:2): keep/drop F1 >= 0.99 (we assert 1.0), byte-exact
scrubbed text, identical conversation verdicts; plus partitioning-invariance
(repartition(1) vs repartition(N) identical output).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from moira_spark.datagen import transcripts as tg
from moira_spark.oracle import ref_pipeline as orc
from moira_spark.pipeline import filtered_output, run_pipeline

N_TURNS = 6000


def _merged(spark, n_turns=N_TURNS, partitions=None):
    sdf = tg.gen_spark(spark, n_turns)
    if partitions:
        sdf = sdf.repartition(partitions)
    out = run_pipeline(spark, sdf).toPandas()
    ref = orc.run(tg.gen_pandas(n_turns))
    m = out.merge(ref, on=["conv_id", "turn_idx"], suffixes=("_s", "_o"))
    assert len(m) == len(out) == len(ref)
    return m


class TestParity:
    def test_full_parity(self, spark):
        m = _merged(spark)
        # keep/drop F1 gate — exact agreement, so F1 = 1.0 >= 0.99
        assert (m.keep_s == m.keep_o).all()
        # byte-exact scrubbed text
        assert (m.scrubbed_text_s == m.scrubbed_text_o).all()
        # conversation verdicts
        assert (m.conv_keep_s == m.conv_keep_o).all()
        # scores float-exact (same kernels, same float64 path)
        assert (m.ppl_s == m.ppl_o).all()
        assert (m.lang_conf_s == m.lang_conf_o).all()
        assert (m.lang_s == m.lang_o).all()
        # reasons lists identical
        assert all(list(a) == list(b) for a, b in zip(m.reasons_s, m.reasons_o))

    def test_partitioning_invariance(self, spark):
        one = _merged(spark, n_turns=3000, partitions=1)
        many = _merged(spark, n_turns=3000, partitions=16)
        key = ["conv_id", "turn_idx"]
        a = one.sort_values(key).reset_index(drop=True)
        b = many.sort_values(key).reset_index(drop=True)
        assert (a.keep_s == b.keep_s).all()
        assert (a.scrubbed_text_s == b.scrubbed_text_s).all()
        assert (a.conv_keep_s == b.conv_keep_s).all()


class TestFilteredOutput:
    def test_good_sink(self, spark):
        sdf = tg.gen_spark(spark, 3000)
        labels = run_pipeline(spark, sdf)
        good = filtered_output(labels, sdf).toPandas()
        ref = orc.run(tg.gen_pandas(3000))
        ref_good = ref[ref.keep & ref.conv_keep]
        assert len(good) == len(ref_good)
        # output schema matches the input transcript schema
        assert list(good.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        # and the text column is the scrubbed text
        m = good.merge(
            ref_good[["conv_id", "turn_idx", "scrubbed_text"]],
            on=["conv_id", "turn_idx"],
        )
        assert (m.text == m.scrubbed_text).all()


class TestNativeRuleEquivalence:
    """Pin the ASCII contract: Spark Column exprs == pandas kernels."""

    def test_rules_match_kernels(self, spark):
        from moira_spark.kernels import text as textk
        from moira_spark.operators import rules

        texts = [
            "",
            "ok",
            "a b",
            "plain words only in this sentence",
            "$% ^& *( )! @# $% ^&",
            "tabs\tand\nnewlines\x0bhere are fine words",
            "emoji 🙂🙂 and accents naïve café",
            "x" * 25000,
            "# # # #…",
            "trailing spaces   ",
        ]
        pdf = pd.DataFrame({"text": texts})
        sdf = spark.createDataFrame(pdf)
        out = sdf.select(
            "text",
            rules.length_rule_fails().alias("lf"),
            rules.symbol_rule_fails().alias("sf"),
            rules.n_words().alias("nw"),
            rules.symbol_count().alias("sc"),
        ).toPandas()
        for _, row in out.iterrows():
            t = row.text
            assert row.lf == textk.length_rule_fails(t), repr(t)
            assert row.sf == textk.symbol_rule_fails(t), repr(t)
            assert row.nw == textk.word_count(t), repr(t)
            assert row.sc == textk.symbol_count(t), repr(t)


class TestDistributedGeneration:
    def test_gen_spark_equals_gen_pandas(self, spark):
        sdf = tg.gen_spark(spark, 3000, drop_defect=False).toPandas()
        pdf = tg.gen_pandas(3000)
        key = ["conv_id", "turn_idx", "ts"]
        a = sdf.sort_values(key).reset_index(drop=True)
        b = pdf.sort_values(key).reset_index(drop=True)
        for col in ["conv_id", "turn_idx", "role", "text", "tool", "defect"]:
            assert a[col].fillna("").tolist() == b[col].fillna("").tolist(), col


class TestCacheLifecycle:
    def test_release_cache_unpersists(self, spark):
        from moira_spark.datagen import transcripts as tg
        from moira_spark.pipeline import release_cache, run_pipeline

        labels = run_pipeline(spark, tg.gen_spark(spark, 500))
        labels.count()
        scored = labels._moira_scored
        assert scored is not None and scored.is_cached
        release_cache(labels)
        assert not scored.is_cached
        # idempotent / safe on frames without the attribute
        release_cache(labels)
        release_cache(labels.select("conv_id"))

    def test_score_udf_cached_per_context(self, spark):
        from moira_spark.operators.udfs import make_score_udf

        assert make_score_udf(spark) is make_score_udf(spark)


class TestUnicodeAndExtremes:
    """Hand-crafted adversarial rows through the FULL Spark pipeline vs the
    pandas oracle: multi-byte unicode (where Java code-point vs Python len
    semantics could diverge), emoji-only, an enormous turn, embedded PII
    with overlapping spans, NBSP/CJK whitespace, nulls."""

    def _rows(self):
        import pandas as pd

        base = pd.Timestamp("2026-01-01")
        texts = [
            "café naïve résumé — totally normal sentence with accents and here are more plain words to pass length",
            "\U0001f600\U0001f680\U0001f4a9" * 30,  # emoji-only (astral plane)
            "z" * 50_000,  # enormous single-word turn
            ("the quick brown fox jumps over the lazy dog and keeps going " * 4)
            + " mail bob@ex.org call 555-123-4567 or 123-45-6789 at 10.0.0.1 card 4111 1111 1111 1111 thanks",
            "  words separated by nbsp are one token plus more regular words to make it long enough for the length rule to pass here",
            "你好世界 " * 40,  # CJK repeated
            None,  # null text
            "",  # empty text
            "short",
        ]
        return pd.DataFrame(
            {
                "conv_id": [f"edge{i:02d}" for i in range(len(texts))],
                "turn_idx": [0] * len(texts),
                "role": ["user"] * len(texts),
                "text": texts,
                "tool": [None] * len(texts),
                "ts": [base + pd.Timedelta(seconds=i) for i in range(len(texts))],
            }
        )

    def test_spark_matches_oracle_on_adversarial_rows(self, spark):
        from moira_spark.oracle import ref_pipeline as orc
        from moira_spark.pipeline import run_pipeline

        pdf = self._rows()
        sdf = spark.createDataFrame(
            pdf,
            schema="conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        got = (
            run_pipeline(spark, sdf)
            .toPandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        ref = orc.run(pdf).sort_values("conv_id").reset_index(drop=True)
        assert got.conv_id.tolist() == ref.conv_id.tolist()
        assert got.keep.tolist() == ref.keep.tolist()
        assert got.scrubbed_text.tolist() == ref.scrubbed_text.tolist()
        assert got.conv_keep.tolist() == ref.conv_keep.tolist()
        assert [tuple(r) for r in got.reasons] == [tuple(r) for r in ref.reasons]
        # PII row: every class actually scrubbed
        pii = got[got.conv_id == "edge03"].scrubbed_text.iloc[0]
        for token in ("<EMAIL>", "<PHONE>", "<SSN>", "<IP>", "<CC>"):
            assert token in pii, token


class TestNorthRuleGateQuery:
    def test_gate_row_is_perfect(self, spark):
        """pipeline_f1_vs_reference must report exact agreement: both sides
        share the kernels, so anything below 1.0 is a real regression."""
        from moira_spark.harness.transcripts import pipeline_f1_vs_reference

        row = pipeline_f1_vs_reference(spark, "").collect()[0].asDict()
        assert row["n_spark_turns"] == row["n_reference_turns"] == row["n_joined"]
        assert row["keep_f1"] == 1.0
        assert row["keep_agreement"] == 1.0
        assert row["scrub_exact_frac"] == 1.0
        assert row["conv_verdict_agreement"] == 1.0
        assert row["gate_f1_ge_099"] and row["gate_scrub_byte_exact"]


def test_config_overrides_change_verdicts(spark):
    """The moira-style CLI threshold surface (driver.py -> config.apply_
    overrides): overrides must actually steer the pipeline AND keep the
    Spark/oracle sides agreeing, because both read the same module."""
    from moira_spark import config
    from moira_spark.datagen import transcripts as tg
    from moira_spark.oracle import ref_pipeline as orc
    from moira_spark.pipeline import release_cache, run_pipeline

    saved = {k: getattr(config, k) for k in ("PPL_MAX", "CONV_MAX_BAD_TURNS")}
    try:
        import pytest

        with pytest.raises(ValueError):
            config.apply_overrides(NOT_A_KNOB=1)
        assert config.apply_overrides(PPL_MAX=None) == {}  # unset flag: no-op
        # range/type validation: silently-degrading values must raise
        with pytest.raises(ValueError):
            config.apply_overrides(LANG_ALLOWLIST="en")  # str would shred
        with pytest.raises(ValueError):
            config.apply_overrides(LANG_ALLOWLIST=())  # drops everything
        with pytest.raises(ValueError):
            config.apply_overrides(CONV_AGG_SALT_BUCKETS=0)  # pmod-by-zero
        with pytest.raises(ValueError):
            config.apply_overrides(PPL_MAX=0)
        with pytest.raises(ValueError):
            config.apply_overrides(LANG_MIN_CONF=1.5)

        src = tg.gen_spark(spark, 2000, seed=7)
        base = run_pipeline(spark, src)
        base_kept = base.filter("keep AND conv_keep").count()
        release_cache(base)

        # a brutally low perplexity ceiling must drop more turns, and the
        # pandas oracle must agree row-for-row under the same override
        changed = config.apply_overrides(PPL_MAX=5.0, CONV_MAX_BAD_TURNS=1)
        assert changed == {"PPL_MAX": 5.0, "CONV_MAX_BAD_TURNS": 1}
        strict = run_pipeline(spark, src)
        sdf = strict.select("conv_id", "turn_idx", "keep", "conv_keep").toPandas()
        strict_kept = int((sdf["keep"] & sdf["conv_keep"]).sum())
        release_cache(strict)
        assert strict_kept < base_kept

        ref = orc.run(tg.gen_pandas(2000, seed=7))
        merged = sdf.merge(
            ref[["conv_id", "turn_idx", "keep", "conv_keep"]],
            on=["conv_id", "turn_idx"],
            suffixes=("_s", "_r"),
        )
        assert len(merged) == len(sdf)
        assert (merged["keep_s"] == merged["keep_r"]).all()
        assert (merged["conv_keep_s"] == merged["conv_keep_r"]).all()
    finally:
        config.apply_overrides(**saved)


class TestArrowNullPassthrough:
    def test_udf_emits_null_for_scrubber_untouched_rows(self, spark):
        """The fused UDF's Arrow-payload contract: rows the scrubber left
        byte-identical come back as NULL scrubbed_text (the pipeline
        restores them via coalesce with the same text expression).  If a
        kernel refactor stops returning the original object AND breaks the
        equality fallback, this catches it before the payload silently
        re-inflates — and the inverse (NULL for a CHANGED row) would break
        byte-exactness, caught here too."""
        from moira_spark.operators.udfs import make_score_udf

        score = make_score_udf(spark)
        df = spark.createDataFrame(
            [
                ("clean prose with no private data at all",),
                ("mail me at someone@example.com today",),
                (None,),
            ],
            "text string",
        ).withColumn("_s", score(F.coalesce(F.col("text"), F.lit(""))))
        rows = df.select(
            "text", F.col("_s.scrubbed_text").alias("sc")
        ).collect()
        got = {r["text"]: r["sc"] for r in rows}
        assert got["clean prose with no private data at all"] is None
        assert got["mail me at someone@example.com today"] is not None
        assert "@" not in got["mail me at someone@example.com today"]
        assert got[None] is None  # '' scrub of '' is unchanged -> NULL
