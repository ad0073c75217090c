"""Device (batched JAX) banded-SW vs the exact oracle — must match exactly."""

import numpy as np
import pytest

from gam_ngs_tpu.ops.bsw_ref import bsw_align
from gam_ngs_tpu.ops.bsw_batch import BswEngine


def rand_codes(rng, n, with_n=False):
    hi = 5 if with_n else 4
    return rng.integers(0, hi, size=n).astype(np.uint8)


def mutate(rng, seq, sub=0.02, ins=0.01, dele=0.01):
    out = []
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(rng.integers(0, 4))
        if rng.random() < sub:
            out.append((c + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(c)
    return np.array(out, np.uint8)


def assert_same(aln1, aln2, label=""):
    assert aln1.begin_a == aln2.begin_a, label
    assert aln1.begin_b == aln2.begin_b, label
    assert aln1.score == aln2.score, label
    assert aln1.homology == pytest.approx(aln2.homology, abs=1e-12), label
    assert aln1.edits.tolist() == aln2.edits.tolist(), label


ENGINE = BswEngine(band=30)  # small band keeps oracle fast


class TestBatchMatchesOracle:
    def test_random_mutated_pairs(self):
        rng = np.random.default_rng(0)
        problems = []
        for k in range(12):
            n = int(rng.integers(80, 400))
            a = rand_codes(rng, n, with_n=(k % 3 == 0))
            b = mutate(rng, a)
            problems.append((a, 0, len(a) - 1, b, 0, len(b) - 1, False, False))
        got = ENGINE.align_many(problems)
        for k, pr in enumerate(problems):
            want = bsw_align(*pr, band=30)
            assert_same(got[k], want, f"case {k}")

    def test_offset_windows(self):
        rng = np.random.default_rng(1)
        g = rand_codes(rng, 1200)
        a = g
        problems = []
        for k in range(8):
            s = int(rng.integers(0, 600))
            ln = int(rng.integers(100, 500))
            b = mutate(rng, g[s:s + ln])
            problems.append((a, s, s + ln - 1, b, 0, len(b) - 1, False, False))
        got = ENGINE.align_many(problems)
        for k, pr in enumerate(problems):
            assert_same(got[k], bsw_align(*pr, band=30), f"case {k}")

    @pytest.mark.parametrize("fs,fe", [(True, False), (False, True),
                                       (True, True)])
    def test_force_flags(self, fs, fe):
        rng = np.random.default_rng(2)
        g = rand_codes(rng, 600)
        a = g[:400].copy()
        b = mutate(rng, g[:420])
        pr = (a, 0, len(a) - 1, b, 0, len(b) - 1, fs, fe)
        assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))

    def test_semiglobal_windows(self):
        rng = np.random.default_rng(3)
        g = rand_codes(rng, 900)
        a = g
        b = g[500:800].copy()
        pr = (a, 450, 850, b, 0, 299, False, False)
        assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))

    def test_degenerate_windows(self):
        a = rand_codes(np.random.default_rng(4), 100)
        # end_b < begin_b
        assert ENGINE.align_one(a, 0, 99, a, 50, 10).length == 0
        # end_b beyond b clipped
        pr = (a, 0, 99, a, 0, 100000, False, False)
        assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))

    def test_band_clipping_divergent(self):
        # sequences diverge beyond the band: exercises band edges
        rng = np.random.default_rng(5)
        a = rand_codes(rng, 300)
        b = np.concatenate([rand_codes(rng, 50), a[:220]])
        pr = (a, 0, 299, b, 0, len(b) - 1, False, False)
        assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))

    def test_begin_a_near_end(self):
        rng = np.random.default_rng(6)
        a = rand_codes(rng, 300)
        b = a[250:].copy()
        pr = (a, 250, 299, b, 0, 49, False, False)
        assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))

    def test_default_band_window(self):
        rng = np.random.default_rng(7)
        eng = BswEngine(band=150)
        g = rand_codes(rng, 700)
        b = mutate(rng, g[:650])
        pr = (g, 0, 699, b, 0, len(b) - 1, False, False)
        assert_same(eng.align_one(*pr), bsw_align(*pr, band=150))


def test_python_traceback_fallback(monkeypatch):
    """GAM_NO_NATIVE forces the Python traceback walk — same result."""
    rng = np.random.default_rng(8)
    a = rand_codes(rng, 300)
    b = mutate(rng, a)
    pr = (a, 0, len(a) - 1, b, 0, len(b) - 1, False, False)
    native = ENGINE.align_one(*pr)
    monkeypatch.setenv("GAM_NO_NATIVE", "1")
    fallback = ENGINE.align_one(*pr)
    assert_same(native, fallback)
    assert_same(fallback, bsw_align(*pr, band=30))
