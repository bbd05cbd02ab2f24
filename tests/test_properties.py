"""Deterministic property-based tests (hypothesis, derandomize=True).

SURVEY.md §5.2 forbids randomized testing in the gate path; hypothesis in
derandomized mode is seed-free and reproducible, so these are enumerated
cases in disguise — broad input coverage without nondeterminism.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from moira_spark.kernels import bernoulli, scrub, sketch, text as textk

DET = settings(derandomize=True, max_examples=150, deadline=None)

any_text = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x10FFFF,
                           blacklist_categories=("Cs",)),
    max_size=400,
)


class TestScrubProperties:
    @DET
    @given(any_text)
    def test_idempotent(self, t):
        once, _, _ = scrub.scrub_text(t)
        twice, _, _ = scrub.scrub_text(once)
        assert once == twice

    @DET
    @given(any_text)
    def test_no_pii_patterns_survive(self, t):
        out, _, _ = scrub.scrub_text(t)
        assert scrub._PII_PATTERN.search(out) is None

    @DET
    @given(st.lists(any_text, max_size=20))
    def test_batch_equals_scalar(self, texts):
        b_text, b_pii, b_tox = scrub.scrub_batch(texts)
        for i, t in enumerate(texts):
            s_text, s_pii, s_tox = scrub.scrub_text(t)
            assert b_text[i] == s_text
            assert bool(b_pii[i]) == s_pii and bool(b_tox[i]) == s_tox


class TestBernoulliProperties:
    quals = st.lists(
        st.floats(min_value=0.5, max_value=45.0, allow_nan=False), max_size=80
    )

    @DET
    @given(st.lists(quals, max_size=12))
    def test_batch_equals_scalar(self, reads):
        batch = bernoulli.expected_errors_pb_batch(reads)
        scalar = [bernoulli.expected_errors_pb(q) for q in reads]
        assert batch.tolist() == scalar

    @DET
    @given(quals)
    def test_bound_within_read_length(self, q):
        ee = bernoulli.expected_errors_pb(q)
        assert 0.0 <= ee <= len(q)

    @DET
    @given(quals)
    def test_monotone_in_alpha(self, q):
        # smaller alpha -> higher-confidence (never smaller) bound
        loose = bernoulli.expected_errors_pb(q, alpha=0.2)
        tight = bernoulli.expected_errors_pb(q, alpha=0.001)
        assert tight >= loose


class TestTextProperties:
    @DET
    @given(any_text)
    def test_words_never_empty_tokens(self, t):
        assert all(w != "" for w in textk.words(t))

    @DET
    @given(any_text)
    def test_length_rule_consistent_with_len(self, t):
        from moira_spark import config

        if len(t) > config.MAX_CHARS:
            assert textk.length_rule_fails(t)


class TestSketchProperties:
    hashes = st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=40
    )

    @DET
    @given(st.lists(hashes, min_size=1, max_size=10))
    def test_simhash_permutation_invariant(self, lists):
        # simhash is a sum over tokens -> order must not matter
        a = sketch.simhash_batch([np.array(h, dtype=np.int64) for h in lists])
        b = sketch.simhash_batch(
            [np.array(list(reversed(h)), dtype=np.int64) for h in lists]
        )
        assert a.tolist() == b.tolist()

    @DET
    @given(hashes)
    def test_minhash_subset_dominates(self, hs):
        # adding elements can only lower (or keep) each minhash
        a, b = sketch.minhash_params(16)
        hs_mod = [h % sketch.MERSENNE31 for h in hs]
        full = sketch.minhash_batch([np.array(hs_mod, dtype=np.int64)], a, b)[0]
        half = sketch.minhash_batch(
            [np.array(hs_mod[: max(1, len(hs_mod) // 2)], dtype=np.int64)], a, b
        )[0]
        assert all(f <= h for f, h in zip(full, half))


class TestQualityFeatureProperties:
    @DET
    @given(st.lists(any_text, max_size=16))
    def test_feature_ranges_and_determinism(self, texts):
        from moira_spark.kernels import quality

        X = quality.features(texts)
        assert X.shape == (len(texts), len(quality.FEATURE_NAMES))
        assert np.array_equal(X, quality.features(texts))
        if len(texts):
            # ratio features live in [0, 1]
            for j in (2, 3, 4, 5, 6, 7):
                assert (X[:, j] >= 0.0).all() and (X[:, j] <= 1.0).all(), j
            assert (X[:, 0] >= 0.0).all()  # log1p(len)

    @DET
    @given(st.lists(any_text, min_size=1, max_size=8))
    def test_scores_are_probabilities(self, texts):
        from moira_spark.kernels import quality

        m = quality.train(seed=42, n_per_class=60, iters=50)
        s = m.score(texts)
        assert ((s >= 0.0) & (s <= 1.0)).all()


class TestPgmWavProperties:
    @DET
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_pgm_roundtrip_any_plane(self, w, h, seed):
        from moira_spark.operators import multimodal as mm

        plane = np.random.RandomState(seed).randint(
            0, 256, (h, w)
        ).astype(np.uint8)
        got = mm._decode_pgm(mm.encode_pgm(plane))
        assert got is not None and (got == plane).all()

    @DET
    @given(
        st.integers(min_value=1, max_value=4000),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_wav_roundtrip_any_pcm(self, n, seed):
        from moira_spark.operators import multimodal as mm

        pcm = (
            np.random.RandomState(seed).randint(-32768, 32767, n)
        ).astype(np.int16)
        got = mm._decode_wav(mm.encode_wav(pcm, 16000))
        assert got is not None
        dec, rate = got
        assert rate == 16000 and (dec == pcm).all()


class TestLshProbeProperties:
    @DET
    @given(
        st.integers(min_value=0, max_value=2**31 - 1),
        st.integers(min_value=0, max_value=4),
    )
    def test_probes_are_base_plus_single_flips(self, seed, nflip):
        from moira_spark.kernels import ann

        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((3, 6, 8))
        q = rng.standard_normal(8)
        probes = ann.lsh_probe_sigs(q, planes, nflip)
        assert len(probes) == 3
        for sigs in probes:
            assert len(sigs) == 1 + nflip
            assert len(set(sigs)) == len(sigs)  # distinct buckets
            base = sigs[0]
            for s in sigs[1:]:
                x = base ^ s
                assert x and (x & (x - 1)) == 0  # exactly one bit flipped


def _trunc_div(x: int, w: int) -> int:
    # Spark's `div` truncates toward zero (python // floors) — mirror it
    q = abs(x) // w
    return q if x >= 0 else -q


class TestProximityBucketProperties:
    @DET
    @given(
        st.integers(min_value=-(10**15), max_value=10**15),
        st.integers(min_value=-(10**15), max_value=10**15),
        st.integers(min_value=1, max_value=10**9),
    )
    def test_pairs_within_window_meet_exactly_once(self, x, y, w):
        """The events_proximity_join cover invariant: under truncating
        bucket division with bucket width == window width, any pair
        within the window lands in adjacent-or-equal buckets, and the
        3-replica scheme matches it on exactly one key — even around
        zero, where truncation makes bucket 0 twice as wide."""
        bx, by = _trunc_div(x, w), _trunc_div(y, w)
        replicas = {by - 1, by, by + 1}
        assert len(replicas) == 3  # distinct keys -> no double match
        if abs(x - y) <= w:
            assert bx in replicas, (x, y, w, bx, by)

    @DET
    @given(
        st.integers(min_value=-(10**15), max_value=10**15),
        st.integers(min_value=1, max_value=10**9),
    )
    def test_bucket_is_monotone_step(self, x, w):
        assert _trunc_div(x, w) <= _trunc_div(x + 1, w)


class TestAnomalyAlgebraProperties:
    @DET
    @given(
        st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
        st.integers(min_value=1, max_value=25),
    )
    def test_integer_rewrite_equals_exact_rational_ztest(self, counts, z2):
        """(c*n - S)^2 > z2*(n*SS - S^2) must agree with the exact
        rational z^2 > z2 (Fraction arithmetic — float z-scores misjudge
        boundary cases by construction, e.g. the Samuelson equality)."""
        from fractions import Fraction

        n = len(counts)
        S = sum(counts)
        SS = sum(c * c for c in counts)
        mean = Fraction(S, n)
        var = Fraction(SS, n) - mean * mean
        for c in counts:
            integer_form = (c * n - S) ** 2 > z2 * (n * SS - S * S)
            if var == 0:
                rational_form = False
            else:
                rational_form = (c - mean) ** 2 > z2 * var
            assert integer_form == rational_form, (c, counts, z2)
