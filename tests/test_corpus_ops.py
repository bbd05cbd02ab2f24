"""Edge-case semantics of the round-5 corpus operators, on hand-built
frames — the planted harness fixtures exercise the happy path against
DuckDB; these pin the boundary behaviors a fixture refresh would never
reach (sub-shingle docs, exact twins, containment chains, 7-vs-8-word
overlaps, singleton strata)."""

from __future__ import annotations

import pyspark.sql.functions as F

from moira_spark.harness.dedup import containment_flags, decontaminate_flags
from moira_spark.harness.text import percentile_gate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContainment:
    def test_wrapped_doc_contains_source(self, spark):
        rows = {
            r["doc_id"]: r
            for r in containment_flags(
                _docs(
                    spark,
                    [
                        (1, "alpha bravo charlie delta echo foxtrot golf"),
                        (
                            2,
                            "header one two "
                            "alpha bravo charlie delta echo foxtrot golf"
                            " footer three four",
                        ),
                        (3, "completely unrelated words about nothing here"),
                    ],
                )
            ).collect()
        }
        # every shingle of 1 appears in 2; 2 is strictly larger -> 1 dropped
        assert rows[1]["is_contained"] and rows[1]["n_containers"] == 1
        assert not rows[2]["is_contained"]  # the superset survives
        assert not rows[3]["is_contained"]

    def test_exact_twins_resolve_min_id(self, spark):
        rows = {
            r["doc_id"]: r
            for r in containment_flags(
                _docs(
                    spark,
                    [
                        (5, "same exact text in both documents here"),
                        (9, "same exact text in both documents here"),
                    ],
                )
            ).collect()
        }
        # equal shingle sets: containment 1.0 both ways; the SMALLER id wins
        assert not rows[5]["is_contained"]
        assert rows[9]["is_contained"]

    def test_sub_shingle_docs_never_participate(self, spark):
        rows = {
            r["doc_id"]: r
            for r in containment_flags(
                _docs(
                    spark,
                    [
                        (1, "two words"),
                        (2, "two words"),  # exact twin but NO shingles
                        (3, "two words padded into a real document"),
                    ],
                )
            ).collect()
        }
        # < 3 words -> empty shingle set -> never contained, never container
        assert not rows[1]["is_contained"] and not rows[2]["is_contained"]
        assert not rows[3]["is_contained"]

    def test_chain_keeps_only_the_largest(self, spark):
        inner = "alpha bravo charlie delta echo"
        mid = f"pre one {inner} post two"
        outer = f"wrap three four {mid} wrap five six"
        rows = {
            r["doc_id"]: r
            for r in containment_flags(
                _docs(spark, [(1, inner), (2, mid), (3, outer)])
            ).collect()
        }
        # A ⊂ B ⊂ C: A contained by both, B by C, C survives
        assert rows[1]["is_contained"] and rows[1]["n_containers"] == 2
        assert rows[2]["is_contained"] and rows[2]["n_containers"] == 1
        assert not rows[3]["is_contained"]


class TestDecontaminate:
    EVAL = "the quick brown fox jumps over the lazy dog tonight"

    def _flags(self, spark, corpus_rows):
        return {
            r["doc_id"]: r
            for r in decontaminate_flags(
                _docs(spark, corpus_rows),
                spark.createDataFrame([(self.EVAL,)], "text string"),
            ).collect()
        }

    def test_eight_shared_words_contaminate(self, spark):
        rows = self._flags(
            spark,
            [
                # contains the eval 8-gram "quick brown fox jumps over the
                # lazy dog" verbatim inside other text
                (
                    1,
                    "story begins quick brown fox jumps over the lazy dog"
                    " and then ends",
                ),
                (2, "a clean document with entirely different content words"),
            ],
        )
        assert rows[1]["contaminated"] and rows[1]["n_hit_ngrams"] >= 1
        assert not rows[2]["contaminated"] and rows[2]["n_hit_ngrams"] == 0

    def test_seven_shared_words_are_clean(self, spark):
        rows = self._flags(
            spark,
            [
                # shares only the 7 consecutive words "quick brown fox jumps
                # over the lazy" (then diverges) — no 8-gram overlap
                (1, "quick brown fox jumps over the lazy CAT today instead"),
            ],
        )
        assert not rows[1]["contaminated"]

    def test_eval_member_is_a_planted_positive(self, spark):
        rows = self._flags(spark, [(1, self.EVAL)])
        # the doc IS an eval item: every one of its 8-grams hits
        assert rows[1]["contaminated"] and rows[1]["n_hit_ngrams"] == 3

    def test_short_docs_cannot_be_flagged(self, spark):
        rows = self._flags(
            spark, [(1, "the quick brown fox jumps over the")]  # 7 words
        )
        assert not rows[1]["contaminated"]


class TestPercentileGate:
    def _gate(self, spark, rows, min_pr=0.75):
        df = spark.createDataFrame(
            rows, "doc_id long, source string, score long"
        )
        return {
            r["doc_id"]: r for r in percentile_gate(df, min_pr).collect()
        }

    def test_top_quarter_kept_per_source(self, spark):
        rows = self._gate(
            spark,
            [(i, "a", i * 10) for i in range(1, 5)]
            + [(10 + i, "b", 100 - i) for i in range(1, 5)],
        )
        # 4 docs/source, pr = (rank-1)/3 -> only the top-scoring doc
        # clears 0.75 in each source
        assert sorted(d for d, r in rows.items() if r["kept"]) == [4, 11]

    def test_ties_break_by_doc_id(self, spark):
        rows = self._gate(
            spark, [(1, "a", 7), (2, "a", 7), (3, "a", 7), (4, "a", 7)]
        )
        # all scores equal: rank is by doc_id, so the LARGEST id is kept
        assert sorted(d for d, r in rows.items() if r["kept"]) == [4]
        assert rows[1]["pr"] == 0.0 and rows[4]["pr"] == 1.0

    def test_singleton_source_keeps_nothing(self, spark):
        # documented edge: percent_rank of a single row is 0.0, so a
        # singleton stratum keeps nothing under min_pr > 0 — callers
        # pre-filter tiny strata (see percentile_gate docstring)
        rows = self._gate(spark, [(1, "only", 999)])
        assert rows[1]["pr"] == 0.0 and not rows[1]["kept"]
