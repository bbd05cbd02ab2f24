"""Unit tests for the shared kernels (no Spark needed — fast)."""

from __future__ import annotations

import numpy as np
import pytest

from moira_spark import config
from moira_spark.kernels import bernoulli, hashing, langid, lm, scrub, text as textk


class TestTextHeuristics:
    def test_words_ascii_whitespace(self):
        assert textk.words("a  b\tc\nd") == ["a", "b", "c", "d"]
        assert textk.words("") == []
        assert textk.words("   ") == []

    def test_length_rule(self):
        assert textk.length_rule_fails("ok")  # too short
        assert textk.length_rule_fails("x" * 30000)  # too long
        assert not textk.length_rule_fails("this is a perfectly fine sentence")

    def test_symbol_rule(self):
        assert textk.symbol_rule_fails("$% ^& *( )! @# $% ^&")
        assert not textk.symbol_rule_fails("plain words only here")
        # hash/ellipsis specific trigger
        assert textk.symbol_rule_fails("a b c # # # #…")

    def test_repetition_dup_lines(self):
        line = "the same line of words here"
        text = "\n".join([line] * 6)
        assert textk.repetition_rule_fails(text)

    def test_repetition_clean(self):
        text = (
            "every word in this rather long sentence is used exactly once "
            "so there cannot be any duplicated content to find anywhere"
        )
        assert not textk.repetition_rule_fails(text)

    def test_repetition_short_text_skipped(self):
        assert not textk.repetition_rule_fails("ha ha ha ha ha")


class TestHashing:
    def test_pack_and_masks(self):
        buf, lens, offs = hashing.pack_texts(["abc", "", "de"])
        assert bytes(buf) == b"abcde"
        assert lens.tolist() == [3, 0, 2]
        assert offs.tolist() == [0, 3, 3, 5]
        # position 2 (c) and 4 (e) cannot start an in-text bigram
        assert hashing.valid_mask(lens, offs, 2).tolist() == [
            True, True, False, True, False,
        ]

    def test_empty_segment_counts(self):
        lens = np.array([0, 1, 5])
        assert hashing.segment_counts(lens, 3).tolist() == [0, 0, 3]

    def test_segment_sums_boundaries(self):
        # contract: caller zeroes tail positions (mask_tails + sentinel
        # table); emulate by zeroing directly, then sum per segment.
        buf, lens, offs = hashing.pack_texts(["abcd", "", "x", "yz"])
        vals = np.arange(len(buf), dtype=np.float64)
        vals[hashing.invalid_tail_indices(lens, offs, 2)] = 0.0
        # n=2: text0 valid starts 0,1,2 -> 0+1+2; text2 ("x") none;
        # text3 ("yz") start 5 -> 5.0
        sums = hashing.segment_sums(vals, lens, offs, 2)
        assert sums.tolist() == [3.0, 0.0, 0.0, 5.0]

    def test_segment_sums_match_bruteforce(self):
        rng = np.random.RandomState(0)
        texts = ["".join(chr(97 + c) for c in rng.randint(0, 26, size=rng.randint(0, 12))) for _ in range(200)]
        buf, lens, offs = hashing.pack_texts(texts)
        base = rng.standard_normal(len(buf))
        for n in (2, 3):
            vals = base.copy()
            vals[hashing.invalid_tail_indices(lens, offs, n)] = 0.0
            sums = hashing.segment_sums(vals, lens, offs, n)
            for i, t in enumerate(texts):
                lo, hi = offs[i], offs[i] + max(len(t) - (n - 1), 0)
                expect = base[lo:hi].sum()
                assert abs(sums[i] - expect) < 1e-9, (i, n)

    def test_mask_tails_sentinel(self):
        buf, lens, offs = hashing.pack_texts(["abc", "de"])
        codes = hashing.bigram_codes(buf)
        hashing.mask_tails(codes, lens, offs, 2, sentinel=65536)
        # last position of each text is masked
        assert codes[2] == 65536 and codes[4] == 65536
        assert codes[0] != 65536 and codes[1] != 65536 and codes[3] != 65536


class TestLangId:
    def test_separates_en_from_xx(self):
        model = langid.default_model()
        from moira_spark.datagen import corpora

        rng = np.random.RandomState(7)
        en = [corpora.en_sentence(rng, 30) for _ in range(50)]
        xx = [corpora.xx_sentence(rng, 30) for _ in range(50)]
        langs, confs = model.predict(en + xx)
        assert (langs[:50] == "en").all()
        assert (langs[50:] == "xx").all()
        assert (confs > config.LANG_MIN_CONF).all()

    def test_empty_text_undetermined(self):
        langs, confs = langid.default_model().predict(["", "ab"])
        assert langs[0] == "und" and confs[0] == 0.0
        assert langs[1] == "und"  # 2 bytes -> no trigram

    def test_deterministic_across_calls(self):
        m1 = langid.train({"a": ["hello world"], "b": ["zvar kqet"]})
        m2 = langid.train({"a": ["hello world"], "b": ["zvar kqet"]})
        assert np.array_equal(m1.log_likelihood, m2.log_likelihood)


class TestLM:
    def test_clean_vs_gibberish_separation(self):
        from moira_spark.datagen import corpora

        model = lm.default_model()
        rng = np.random.RandomState(11)
        clean = [corpora.en_sentence(rng, 40) for _ in range(30)]
        soup = [corpora.gibberish(rng, 150) for _ in range(30)]
        ppl = model.perplexity(clean + soup)
        assert ppl[:30].max() < config.PPL_MAX < ppl[30:].min()

    def test_short_text(self):
        ppl = lm.default_model().perplexity(["", "a"])
        assert ppl.tolist() == [1.0, 1.0]


class TestScrub:
    def test_email(self):
        s, pii, tox = scrub.scrub_text("mail bob.smith+x@example.co.uk now")
        assert s == "mail <EMAIL> now" and pii and not tox

    def test_phone_and_ssn_adjacent(self):
        s, pii, _ = scrub.scrub_text("call 555-123-4567 123-45-6789 ok")
        assert s == "call <PHONE> <SSN> ok" and pii

    def test_email_inside_url(self):
        s, pii, _ = scrub.scrub_text("see https://ex.org/u?email=bob@ex.org end")
        assert "<EMAIL>" in s and "bob@ex.org" not in s

    def test_credit_card_beats_phone(self):
        s, _, _ = scrub.scrub_text("card 4111 1111 1111 1111 done")
        assert s == "card <CC> done"

    def test_ip(self):
        s, _, _ = scrub.scrub_text("ping 192.168.0.1 ok")
        assert s == "ping <IP> ok"

    def test_toxicity_masked_and_flagged(self):
        s, _, tox = scrub.scrub_text("you total Smeghead stop")
        assert s == "you total [REDACTED] stop" and tox

    def test_idempotent(self):
        raw = "x bob@ex.org 555-123-4567 123-45-6789 192.168.0.1 frell y"
        once = scrub.scrub_text(raw)[0]
        twice = scrub.scrub_text(once)[0]
        assert once == twice

    def test_clean_text_unchanged(self):
        raw = "nothing sensitive in this sentence at all"
        assert scrub.scrub_text(raw) == (raw, False, False)


class TestBernoulli:
    """FIXTURES.md §5 — semantic anchor to moira's expected-error bound."""

    def test_all_q40(self):
        # p = 1e-4 per base over 100 bases: bound stays tiny
        assert bernoulli.expected_errors_pb([40] * 100, alpha=0.005) <= 1

    def test_all_q2(self):
        # p ≈ 0.63 per base: nearly every base is an error
        ee = bernoulli.expected_errors_pb([2] * 100, alpha=0.005)
        assert 55 <= ee <= 85

    def test_empty_and_single(self):
        assert bernoulli.expected_errors_pb([]) == 0.0
        assert bernoulli.expected_errors_pb([40]) in (0.0, 1.0)

    def test_matches_hand_computation(self):
        # two bases with p=0.5: P(0)=0.25, P(<=1)=0.75, P(<=2)=1
        # q=3.0103 gives p=0.5
        quals = [3.0103, 3.0103]
        assert bernoulli.expected_errors_pb(quals, alpha=0.05) == 2.0
        assert bernoulli.expected_errors_pb(quals, alpha=0.30) == 1.0

    def test_poisson_upper_bounds_pb_roughly(self):
        quals = [20, 25, 30, 35, 20, 15] * 10
        pb = bernoulli.expected_errors_pb(quals, alpha=0.005)
        po = bernoulli.expected_errors_poisson(quals, alpha=0.005)
        assert abs(pb - po) <= 2  # Poisson is a close over-approximation

    def test_sum_expected_errors(self):
        assert bernoulli.sum_expected_errors([10]) == pytest.approx(0.1)

    def test_batch_matches_scalar_exactly(self):
        # the padded-matrix batch DP must be bit-identical to the scalar
        # path: padding positions are p=0 exact no-ops in the recurrence
        import numpy as np

        rng = np.random.RandomState(7)
        reads = [
            rng.randint(2, 41, size=rng.randint(0, 200)).tolist()
            for _ in range(64)
        ]
        reads += [[], [40], [2] * 100, [3.0103, 3.0103]]
        batch = bernoulli.expected_errors_pb_batch(reads, alpha=0.005)
        scalar = [bernoulli.expected_errors_pb(q, alpha=0.005) for q in reads]
        assert batch.tolist() == scalar

    def test_batch_alpha_sweep(self):
        for alpha in (0.30, 0.05, 0.005, 0.0005):
            reads = [[3.0103, 3.0103], [20] * 50, [10, 15, 20]]
            batch = bernoulli.expected_errors_pb_batch(reads, alpha=alpha)
            scalar = [bernoulli.expected_errors_pb(q, alpha=alpha) for q in reads]
            assert batch.tolist() == scalar

    def test_batch_empty(self):
        assert bernoulli.expected_errors_pb_batch([]).tolist() == []
        assert bernoulli.expected_errors_pb_batch([[], []]).tolist() == [0.0, 0.0]


class TestSketch:
    """kernels/sketch.py — per-row SimHash/MinHash must match the previous
    JVM-aggregation formulation bit for bit."""

    def _naive_simhash(self, hashes):
        # the old groupBy formulation: bit i set iff sum of (+1/-1) > 0,
        # bits taken from the signed-64 two's-complement pattern
        import numpy as np

        out = 0
        for i in range(64):
            s = sum(
                1 if (int(np.uint64(np.int64(h))) >> i) & 1 else -1
                for h in hashes
            )
            if s > 0:
                out |= 1 << i
        return int(np.int64(np.uint64(out)))

    def test_simhash_matches_naive(self):
        import numpy as np

        from moira_spark.kernels import sketch

        rng = np.random.RandomState(3)
        lists = [
            rng.randint(-(2**63), 2**63 - 1, size=rng.randint(1, 40)).astype(
                np.int64
            )
            for _ in range(50)
        ]
        got = sketch.simhash_batch(lists)
        want = [self._naive_simhash(h.tolist()) for h in lists]
        assert got.tolist() == want

    def test_minhash_matches_naive(self):
        import numpy as np

        from moira_spark.kernels import sketch

        a, b = sketch.minhash_params(64)
        rng = np.random.RandomState(4)
        lists = [
            rng.randint(0, sketch.MERSENNE31, size=rng.randint(1, 30)).astype(
                np.int64
            )
            for _ in range(30)
        ]
        got = sketch.minhash_batch(lists, a, b)
        for row, hs in zip(got, lists):
            for i in range(64):
                want = min((int(h) * int(a[i]) + int(b[i])) % sketch.MERSENNE31 for h in hs)
                assert row[i] == want

    def test_minhash_params_pinned(self):
        # seed contract with the previous harness formulation
        from moira_spark.kernels import sketch

        a, b = sketch.minhash_params(64)
        assert (int(a[0]), int(b[0])) == (911214222, 13972748)

    def test_empty_list_rejected(self):
        import pytest as _pytest

        from moira_spark.kernels import sketch

        with _pytest.raises(ValueError):
            sketch.simhash_batch([[1], []])


class TestAnnKernels:
    def test_kmeans_deterministic_and_normalized(self):
        import numpy as np

        from moira_spark.kernels import ann

        rng = np.random.RandomState(5)
        X = rng.standard_normal((300, 16))
        c1 = ann.kmeans_fit(X, k=8, iters=5, seed=7)
        c2 = ann.kmeans_fit(X, k=8, iters=5, seed=7)
        assert np.array_equal(c1, c2)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    def test_assign_matches_bruteforce(self):
        import numpy as np

        from moira_spark.kernels import ann

        rng = np.random.RandomState(6)
        X = rng.standard_normal((100, 16))
        C = ann.kmeans_fit(X, k=4, iters=5, seed=7)
        got = ann.assign_cells(list(X), C)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        assert np.array_equal(got, (Xn @ C.T).argmax(axis=1).astype(np.int32))

    def test_probe_cells_returns_nearest(self):
        import numpy as np

        from moira_spark.kernels import ann

        C = np.eye(4)
        q = np.array([0.9, 0.1, 0.0, 0.0])
        probes = ann.probe_cells(q, C, nprobe=2)
        assert set(probes.tolist()) == {0, 1}


class TestBootstrapMode:
    def test_deterministic_given_seed(self):
        q = [20, 25, 30] * 30
        a = bernoulli.expected_errors_bootstrap(q, seed=1234)
        b = bernoulli.expected_errors_bootstrap(q, seed=1234)
        assert a == b
        assert bernoulli.expected_errors_bootstrap(q, seed=99) != a or True

    def test_tracks_exact_bound(self):
        import numpy as np

        rng = np.random.RandomState(8)
        diffs = []
        for i in range(40):
            q = rng.randint(5, 41, size=120).tolist()
            exact = bernoulli.expected_errors_pb(q, alpha=0.005)
            boot = bernoulli.expected_errors_bootstrap(
                q, alpha=0.005, n_boot=400, seed=i
            )
            diffs.append(abs(exact - boot))
        assert sum(diffs) / len(diffs) <= 1.5  # MC noise, not bias

    def test_empty(self):
        assert bernoulli.expected_errors_bootstrap([]) == 0.0


class TestScrubMaskSoundness:
    """The vectorized candidate masks must never skip a text the regexes
    would match (mask contract: false positives only).  With re.ASCII on
    the patterns this holds by construction; these inputs are the exact
    counterexamples that broke it before the flag."""

    UNICODE_CASES = [
        "my ssn is ١٢٣-٤٥-٧٨٩",  # arabic digits
        "ſmeghead says hi",  # long-s case-fold of a toxic word
        "fraKking nonsense",  # Kelvin-sign K case-fold
        "normal clean text",
        "real pii 123-45-6789 here",
        "real Smeghead here",
    ]

    def test_batch_with_masks_equals_scalar(self):
        from moira_spark.kernels.hashing import pack_texts
        from moira_spark.kernels.score import _candidate_masks

        buf, lens, offs = pack_texts(self.UNICODE_CASES)
        pii_c, tox_c = _candidate_masks(buf, lens, offs)
        b_text, b_pii, b_tox = scrub.scrub_batch(self.UNICODE_CASES, pii_c, tox_c)
        for i, t in enumerate(self.UNICODE_CASES):
            s_text, s_pii, s_tox = scrub.scrub_text(t)
            assert b_text[i] == s_text, t
            assert bool(b_pii[i]) == s_pii and bool(b_tox[i]) == s_tox, t

    def test_ascii_semantics(self):
        # unicode digits are NOT PII digits; ascii ones are
        s, pii, _ = scrub.scrub_text("ssn ١٢٣-٤٥-٧٨٩")
        assert not pii and "١" in s
        s, pii, _ = scrub.scrub_text("ssn 123-45-6789")
        assert pii and "<SSN>" in s
        # unicode case-folds are not the lexicon word; ascii case still is
        _, _, tox = scrub.scrub_text("ſmeghead")
        assert not tox
        _, _, tox = scrub.scrub_text("SMEGHEAD")
        assert tox


class TestQualityModel:
    """Learned quality classifier (kernels/quality.py)."""

    def test_separates_held_out_corruption_modes(self):
        import numpy as np

        from moira_spark.kernels import quality

        m = quality.train(seed=42)
        texts, y = quality.training_set(seed=999, n_per_class=120)
        s = m.score(texts)
        acc = ((s > 0.5) == (y == 1)).mean()
        assert acc >= 0.98, acc
        assert s[y == 1].mean() > 0.9 and s[y == 0].mean() < 0.1

    def test_deterministic_across_trainings(self):
        import numpy as np

        from moira_spark.kernels import quality

        a, b = quality.train(seed=42), quality.train(seed=42)
        assert np.array_equal(a.w, b.w) and a.b == b.b
        assert np.array_equal(a.mu, b.mu) and np.array_equal(a.sigma, b.sigma)

    def test_features_shape_and_edges(self):
        from moira_spark.kernels import quality

        X = quality.features(["", "a", "the the the the", "normal clean text here"])
        assert X.shape == (4, len(quality.FEATURE_NAMES))
        assert X[0, 0] == 0.0  # log1p(0)
        # repetition bomb has max_word_freq 1.0; clean text lower
        assert X[2, 6] == 1.0 and X[3, 6] < 0.5


# ---------------------------------------------------------------- BPE kernel
def test_bpe_train_learns_frequent_pairs():
    from moira_spark.kernels import bpe

    merges = bpe.train_bpe(["low low low lower lowest"], n_merges=10)
    # 'lo' must be an early merge: 'l','o' is the most frequent pair
    assert ("l", "o") == merges[0]
    enc = bpe.encode_batch(["low"], merges)[0]
    assert bpe.decode(enc) == "low"


def test_bpe_training_deterministic_under_tie():
    from moira_spark.kernels import bpe

    # 'ab' and 'cd' tie on frequency; lexicographically smallest pair wins
    corpus = ["ab ab cd cd"]
    m1 = bpe.train_bpe(corpus, n_merges=2)
    m2 = bpe.train_bpe(corpus, n_merges=2)
    assert m1 == m2
    assert m1[0][0] == "a"  # ('a','b\x01') sorts before ('c','d\x01')


def test_bpe_roundtrip_lossless():
    from moira_spark.kernels import bpe

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
    ]
    merges = bpe.train_bpe(corpus, n_merges=100)
    probes = corpus + [
        "unseen words survive roundtrip too",
        "punctuation, digits 123 and symbols #$% also",
        "  leading and   multiple spaces normalize  ",
        "",
    ]
    enc = bpe.encode_batch(probes, merges)
    for text, toks in zip(probes, enc):
        norm = " ".join(w for w in text.split(" ") if w)
        assert bpe.decode(toks) == norm
        assert len(toks) <= len(text) or not text.strip()


def test_bpe_compression_improves_with_merges():
    from moira_spark.kernels import bpe

    corpus = ["the cat sat on the mat and the cat ran " * 5]
    none = sum(len(t) for t in bpe.encode_batch(corpus, []))
    trained = sum(
        len(t) for t in bpe.encode_batch(corpus, bpe.train_bpe(corpus, 50))
    )
    assert trained < none  # merges must actually compress the training text
