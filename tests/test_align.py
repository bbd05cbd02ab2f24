"""NW alignment + consensus kernel tests (moira paired-end path, §2.1 #4-6)."""

from __future__ import annotations

from moira_spark.kernels import align


class TestRevcomp:
    def test_basic(self):
        assert align.revcomp("ACGT") == "ACGT"  # palindrome
        assert align.revcomp("AACG") == "CGTT"
        assert align.revcomp("N") == "N"
        assert align.revcomp("") == ""


class TestNW:
    def test_identical(self):
        a, b, s = align.nw_align("ACGT", "ACGT")
        assert a == b == "ACGT"
        assert s == 4 * align.MATCH

    def test_single_gap(self):
        a, b, _ = align.nw_align("ACGT", "AGT")
        assert a == "ACGT"
        assert b in ("A-GT", "AG-T")  # either gap placement is optimal
        assert len(a) == len(b)

    def test_mismatch(self):
        a, b, s = align.nw_align("ACGT", "AGGT")
        assert a == "ACGT" and b == "AGGT"
        assert s == 3 * align.MATCH + align.MISMATCH

    def test_empty(self):
        a, b, s = align.nw_align("", "AC")
        assert a == "--" and b == "AC" and s == 2 * align.GAP


class TestContig:
    def test_perfect_overlap(self):
        # ref = AACCGGTT; fwd covers [0:6], rev covers [2:8] (given 5'->3')
        ref = "AACCGGTT"
        fwd = ref[:6]
        rev = align.revcomp(ref[2:])
        seq, quals = align.make_contig(fwd, [30] * 6, rev, [30] * 6)
        assert seq == ref
        assert len(quals) == len(seq)
        # overlap positions got boosted (capped), flanks keep read quality
        assert max(quals) == align.QSCORE_CAP
        assert quals[0] == 30 and quals[-1] == 30

    def test_disagreement_high_quality_wins(self):
        seq, quals = align.make_contig("AAAA", [40, 40, 40, 40], align.revcomp("AATA"), [10, 10, 10, 10])
        assert seq == "AAAA"  # forward (q40) beats reverse (q10) at the SNP
        assert quals[2] == 30  # 40 - 10

    def test_hopeless_disagreement_floors_to_q2(self):
        seq, quals = align.make_contig("AAAA", [20, 20, 20, 20], align.revcomp("AATA"), [18, 18, 18, 18])
        assert quals[2] == 2  # |20-18| < DELTAQ


class TestBatchAlign:
    def test_batch_matches_scalar_random_lengths(self):
        import numpy as np

        from moira_spark.kernels import align

        rng = np.random.RandomState(13)
        bases = np.array(list("ACGTN"))
        a_list = ["".join(rng.choice(bases, size=rng.randint(1, 60))) for _ in range(40)]
        b_list = ["".join(rng.choice(bases, size=rng.randint(1, 60))) for _ in range(40)]
        batch = align.nw_align_batch(a_list, b_list)
        for a, b, got in zip(a_list, b_list, batch):
            assert got == align.nw_align(a, b)

    def test_contig_batch_matches_scalar(self):
        import numpy as np

        from moira_spark.kernels import align

        rng = np.random.RandomState(14)
        bases = np.array(list("ACGT"))
        sf, qf, sr, qr = [], [], [], []
        for _ in range(25):
            ref = "".join(rng.choice(bases, size=rng.randint(30, 70)))
            cut = rng.randint(10, len(ref) - 5)
            sf.append(ref[: cut + 5])
            sr.append(align.revcomp(ref[cut:]))
            qf.append(rng.randint(5, 41, size=len(sf[-1])).tolist())
            qr.append(rng.randint(5, 41, size=len(sr[-1])).tolist())
        batch = align.make_contig_batch(sf, qf, sr, qr)
        for i in range(len(sf)):
            assert batch[i] == align.make_contig(sf[i], qf[i], sr[i], qr[i])
