"""Pins for the third-session round-6 operators: exact-substring dedup,
integer-exact PageRank, and the leakage-safe group-aware split.

The harness mirror checks these against DuckDB on the driver fixtures;
these tests pin hand-computed boundary semantics the fixtures never
isolate — interval-merge arithmetic at window boundaries, keep-first
selection, the exact-rational PageRank values (via an independent
Fraction-arithmetic reimplementation), and the no-straddle guarantee on
a corpus where a naive doc-id split WOULD leak."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F

from moira_spark.harness.dedup import (
    corpus_split_leakage,
    doc_substring_dedup,
    interval_union_fold,
)
from moira_spark.harness.graph import _PR_ITERS, _PR_OUT, graph_pagerank


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


class TestSubstringDedup:
    def test_interval_merge_and_keep_first(self, spark, tmp_path):
        """Hand-built corpus, k=8 (doc_ids avoid the %5 boilerplate plant):
        doc1 owns every window (first occurrence, nothing removed); doc2
        repeats a 16-token run of doc1 (9 overlapping windows -> ONE
        16-token span); doc3 repeats two doc1 runs separated by 10 novel
        tokens (2+3 windows -> TWO spans, 9+10 tokens); doc4 is shorter
        than k (no windows at all)."""
        t = [f"t{i}" for i in range(1, 31)]
        doc1 = " ".join(t)
        doc2 = " ".join(
            [f"b{i}" for i in range(1, 6)] + t[4:20] + [f"b{i}" for i in range(6, 10)]
        )
        doc3 = " ".join(t[0:9] + [f"c{i}" for i in range(1, 11)] + t[12:22])
        doc4 = "d1 d2 d3 d4 d5"
        sf = _write_docs(
            spark, tmp_path, [(1, doc1), (2, doc2), (3, doc3), (4, doc4)]
        )
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_dup_windows"],
                r["n_removed_tokens"],
                r["n_dup_spans"],
            )
            for r in doc_substring_dedup(spark, sf).collect()
        }
        assert got[1] == (30, 0, 0, 0)
        assert got[2] == (25, 9, 16, 1)
        assert got[3] == (29, 5, 19, 2)
        assert got[4] == (5, 0, 0, 0)

    def test_interval_fold_matches_brute_force_union(self, spark):
        """200 random sorted start lists (fixed seed), k in {3, 8}: the
        one-pass fold must equal the brute-force set union — size AND
        number of maximal runs — including adjacency edge cases (gap == k
        merges, gap == k+1 splits)."""
        import random

        rng = random.Random(42)
        cases = []
        for i in range(200):
            k = 3 if i % 2 else 8
            n = rng.randint(1, 12)
            starts = sorted(rng.sample(range(1, 40), n))
            cover = set()
            for s in starts:
                cover.update(range(s, s + k))
            spans = sum(
                1
                for j, s in enumerate(starts)
                if j == 0 or s - starts[j - 1] > k
            )
            cases.append((i, k, starts, len(cover), spans))
        df = spark.createDataFrame(
            [(i, k, ss) for i, k, ss, _, _ in cases],
            "i long, k int, ss array<int>",
        )
        got = {
            r["i"]: (r["cov"], r["spans"])
            for k_val in (3, 8)
            for r in df.filter(F.col("k") == k_val)
            .select("i", interval_union_fold("ss", k_val).alias("a"))
            .select("i", F.col("a.cov").alias("cov"), F.col("a.spans").alias("spans"))
            .collect()
        }
        for i, _, _, cov, spans in cases:
            assert got[i] == (cov, spans), f"case {i}"

    def test_boilerplate_plant_kept_once(self, spark):
        """On the driver fixture the 13-token footer is planted on every
        fifth doc; exactly one of them (doc 0, the global first) keeps its
        footer windows, and every other %5 doc loses at least the 13-token
        tail span."""
        out = doc_substring_dedup(spark, "/root/testdata/sf0.001")
        planted = out.filter(F.col("doc_id") % 5 == 0)
        clean = planted.filter(F.col("n_removed_tokens") < 13).collect()
        assert [r["doc_id"] for r in clean] == [0]


class TestGraphPagerank:
    def test_matches_exact_rational_pagerank(self, spark, tmp_path):
        """Independent reimplementation: iterate r' = 0.15/n + 0.85 *
        sum(r[u]/3) in EXACT Fraction arithmetic over the same synthesized
        multigraph, then check num == r * n * 60^t for every node — the
        integer recurrence really is PageRank, not merely self-consistent."""
        n = 10
        sf = _write_docs(
            spark, tmp_path, [(i, f"w{i} x{i} y{i}") for i in range(n)]
        )
        out = {
            r["doc_id"]: r["rank_fp"]
            for r in graph_pagerank(spark, sf).collect()
        }
        edges = [
            (src, (src * src * 31 + src * 48271 + j * 9973) % n)
            for src in range(n)
            for j in _PR_OUT
        ]
        r = {v: Fraction(1, n) for v in range(n)}
        for _ in range(_PR_ITERS):
            nxt = {v: Fraction(15, 100) / n for v in range(n)}
            for src, dst in edges:
                nxt[dst] += Fraction(85, 100) * r[src] / 3
            r = nxt
        scale = n * 60**_PR_ITERS
        expect = {v: r[v] * scale for v in range(n)}
        assert all(e.denominator == 1 for e in expect.values())
        # the quadratic edge map must spread in-degrees, or this check
        # degenerates to "uniform in, uniform out" and proves nothing
        assert len(set(expect.values())) > 1
        assert out == {v: int(e) for v, e in expect.items()}


class TestSplitLeakage:
    def test_groups_never_straddle_even_when_naive_split_would(
        self, spark, tmp_path
    ):
        """docs 3 and 17 are near-dups (one extra token, J=38/39) whose
        doc-level buckets differ (3 vs 7): a naive doc_id%10 split puts
        them in different training shards; the group-aware split must keep
        both on the representative's side.  Hand-checked per-split totals
        pin the whole output."""
        base1 = " ".join(f"g{i}" for i in range(1, 41))
        base2 = " ".join(f"h{i}" for i in range(1, 41))
        rows = [
            (3, base1),
            (17, base1 + " zz"),
            (24, base2),
            (38, base2 + " qq"),
            (5, " ".join(f"s{i}" for i in range(1, 21))),
            (6, " ".join(f"u{i}" for i in range(1, 21))),
            (18, " ".join(f"v{i}" for i in range(1, 21))),
            (9, " ".join(f"z{i}" for i in range(1, 21))),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {
            r["split"]: (r["n_docs"], r["n_groups"], r["id_checksum"])
            for r in corpus_split_leakage(spark, sf).collect()
        }
        # groups: {3,17} rep 3 -> train, {24,38} rep 24 -> train,
        # singletons 5, 6 -> train, 18 -> val, 9 -> test
        assert got == {
            "train": (6, 4, 3 + 17 + 24 + 38 + 5 + 6),
            "val": (1, 1, 18),
            "test": (1, 1, 9),
        }
