"""Banded Smith-Waterman oracle tests (hand-computable properties)."""

import numpy as np
import pytest

from gam_ngs_tpu.io.fasta import seq_to_codes
from gam_ngs_tpu.ops.bsw_ref import bsw_align
from gam_ngs_tpu.ops.editops import GAP_A, GAP_B, MATCH, MISMATCH
from gam_ngs_tpu.ops import ablast

RNG = np.random.default_rng(42)


def rand_codes(n, rng=RNG):
    return rng.integers(0, 4, size=n).astype(np.uint8)


class TestBswBasics:
    def test_identical(self):
        a = rand_codes(200)
        aln = bsw_align(a, 0, 199, a, 0, 199)
        assert aln.homology == 100.0
        assert aln.length == 200
        assert (aln.edits == MATCH).all()
        assert aln.score == 1000
        assert (aln.begin_a, aln.begin_b) == (0, 0)

    def test_single_mismatch(self):
        a = rand_codes(200)
        b = a.copy()
        b[100] = (b[100] + 1) % 4
        aln = bsw_align(a, 0, 199, b, 0, 199)
        assert aln.length == 200
        assert (aln.edits == MISMATCH).sum() == 1
        assert aln.score == 199 * 5 - 4
        assert aln.homology == pytest.approx(99.5)

    def test_insertion_in_b(self):
        a = rand_codes(200)
        b = np.concatenate([a[:100], np.array([(a[100] + 2) % 4], np.uint8), a[100:]])
        aln = bsw_align(a, 0, 199, b, 0, 200)
        assert (aln.edits == GAP_A).sum() == 1
        assert aln.score == 200 * 5 - 8

    def test_deletion_in_b(self):
        a = rand_codes(200)
        b = np.concatenate([a[:100], a[101:]])
        aln = bsw_align(a, 0, 199, b, 0, 198)
        assert (aln.edits == GAP_B).sum() == 1
        assert aln.score == 199 * 5 - 8

    def test_n_matches_anything(self):
        a = rand_codes(100)
        b = a.copy()
        a[50] = 4  # N
        aln = bsw_align(a, 0, 99, b, 0, 99)
        assert aln.homology == 100.0
        assert aln.score == 99 * 5  # N-vs-base scores 0

    def test_offset_windows(self):
        g = rand_codes(500)
        a = g
        b = g[100:400].copy()
        aln = bsw_align(a, 100, 399, b, 0, 299)
        assert aln.homology == 100.0
        assert aln.begin_a == 100
        assert aln.begin_b == 0
        assert aln.length == 300

    def test_b_window_clipped_to_len(self):
        a = rand_codes(100)
        aln = bsw_align(a, 0, 99, a, 0, 1000)
        assert aln.length == 100

    def test_empty_on_bad_window(self):
        a = rand_codes(100)
        aln = bsw_align(a, 0, 99, a, 50, 10)
        assert aln.length == 0 and aln.score == 0

    def test_semiglobal_prefix_suffix(self):
        # b matches a suffix of a: semi-global should align b at the end
        g = rand_codes(300)
        a = g
        b = g[200:].copy()
        aln = bsw_align(a, 150, 299, b, 0, 99, band=60)
        assert aln.homology == 100.0
        assert aln.begin_a == 200
        assert aln.begin_b == 0

    def test_small_band_still_aligns_diagonal(self):
        a = rand_codes(100)
        aln = bsw_align(a, 0, 99, a, 0, 99, band=2)
        assert aln.homology == 100.0
        assert aln.length == 100

    def test_force_end_restricts_max(self):
        # a's window ends early; force_end picks a max near the end rows
        g = rand_codes(200)
        a = g[:150].copy()
        b = g.copy()
        aln_free = bsw_align(a, 0, 149, b, 0, 199, False, False, band=30)
        aln_forced = bsw_align(a, 0, 149, b, 0, 199, False, True, band=30)
        # forced max must sit in the last rows of the pos==end_a diagonal
        assert aln_forced.score <= aln_free.score or aln_forced.length > 0


class TestAblast:
    def test_planted_hit(self):
        a = rand_codes(300, np.random.default_rng(1))
        b = a[37:97].copy()  # 60-mer at offset 37
        hits = ablast.find_hits(a, 0, 299, b, 0, 59)
        assert hits == [37]

    def test_hit_with_window_offsets(self):
        a = rand_codes(300, np.random.default_rng(2))
        b = a[100:180].copy()
        hits = ablast.find_hits(a, 50, 299, b, 0, 79)
        # idx_a = 100-50 = 50 relative, hit = a_start + 50 = 100
        assert hits == [100]

    def test_no_hits(self):
        rng = np.random.default_rng(3)
        a = rand_codes(100, rng)
        b = (a[:50] + 1) % 4  # guaranteed mismatch at every position
        hits = ablast.find_hits(a, 0, 99, b.astype(np.uint8), 0, 49)
        assert hits == []

    def test_short_sequences(self):
        a = rand_codes(10)
        assert ablast.find_hits(a, 0, 9, a, 0, 9) == []


class TestFullSW:
    """FullSmithWaterman parity extra (full_smith_waterman.cc:52)."""

    def test_identical(self):
        import numpy as np
        from gam_ngs_tpu.ops.fsw_ref import full_sw_align

        a = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
        r = full_sw_align(a, 0, 7, a, 0, 7)
        assert r.score == 40
        assert r.homology == 100.0
        assert len(r.edits) == 8

    def test_substitution_and_gap(self):
        import numpy as np
        from gam_ngs_tpu.ops.editops import GAP_A, GAP_B, MATCH, MISMATCH
        from gam_ngs_tpu.ops.fsw_ref import full_sw_align

        rng = np.random.default_rng(4)
        a = rng.integers(0, 4, size=40).astype(np.uint8)
        b = np.concatenate([a[:20], a[21:]])  # one deletion in b
        r = full_sw_align(a, 0, 39, b, 0, 38)
        assert (r.edits == GAP_A).sum() + (r.edits == GAP_B).sum() == 1
        assert r.homology > 95

    def test_no_n_wildcard(self):
        """Unlike the banded kernel, N != N scores as a match ONLY via
        equality (N==N) and N-vs-base is a plain mismatch."""
        import numpy as np
        from gam_ngs_tpu.ops.fsw_ref import full_sw_align

        a = np.full(10, 4, np.uint8)  # NNNN...
        b = np.zeros(10, np.uint8)    # AAAA...
        r = full_sw_align(a, 0, 9, b, 0, 9)
        assert r.score <= 0  # pure mismatches, clamped by empty prefix
