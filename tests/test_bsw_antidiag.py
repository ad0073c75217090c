"""Anti-diagonal (skewed-band) kernel vs the exact oracle.

The fused device path selects the anti-diagonal kernel by default
(ops/bsw_pallas.py pallas_forward_antidiag_raw); these tests pin that
selection and exercise the edge semantics the row kernel handled with
its full/lean split — force_start/force_end quirk lanes
(banded_smith_waterman.cc:116,201), begin_a < 0 tail windows
(PctgBuilder.cc:1549), x_size <= FORCE_MAXGAP_LEN underflow windows —
at both band=30 and the production band=150, in interpret mode on CPU.
"""

import numpy as np
import pytest

from gam_ngs_tpu.ops.bsw_batch import BswEngine
from gam_ngs_tpu.ops.bsw_ref import bsw_align


def assert_same(aln1, aln2, label=""):
    assert aln1.begin_a == aln2.begin_a, label
    assert aln1.begin_b == aln2.begin_b, label
    assert aln1.score == aln2.score, label
    assert aln1.homology == pytest.approx(aln2.homology, abs=1e-12), label
    if aln1.edits is not None and aln2.edits is not None:
        assert aln1.edits.tolist() == aln2.edits.tolist(), label


ENG30 = BswEngine(band=30, backend="pallas", traceback="device")
ENG150 = BswEngine(band=150, backend="pallas", traceback="device")


def test_antidiag_selected():
    assert ENG30._use_antidiag()
    assert ENG150._use_antidiag()
    assert not BswEngine(band=30, backend="pallas",
                         kernel="row")._use_antidiag()
    assert not BswEngine(band=30, backend="xla")._use_antidiag()


def mutate(rng, seq, sub=0.03, ins=0.012, dele=0.012):
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


def test_fuzz_band30_mixed_flags():
    rng = np.random.default_rng(71)
    problems = []
    for k in range(10):
        n = int(rng.integers(40, 320))
        hi = 5 if k % 3 == 0 else 4
        a = rng.integers(0, hi, size=n).astype(np.uint8)
        b = mutate(rng, a)
        fs = k % 2 == 0
        fe = k % 3 == 1
        problems.append((a, 0, len(a) - 1, b, 0, len(b) - 1, fs, fe))
    got = ENG30.align_many(problems)
    for k, pr in enumerate(problems):
        assert_same(got[k], bsw_align(*pr, band=30), f"case {k}")


def test_band150_production_shapes():
    rng = np.random.default_rng(72)
    problems = []
    for k in range(4):
        n = int(rng.integers(200, 900))
        a = rng.integers(0, 4, size=n).astype(np.uint8)
        b = mutate(rng, a)
        problems.append((a, 0, len(a) - 1, b, 0, len(b) - 1,
                         k % 2 == 0, k == 3))
    got = ENG150.align_many(problems)
    for k, pr in enumerate(problems):
        assert_same(got[k], bsw_align(*pr, band=150), f"case {k}")


def test_force_end_underflow_windows():
    """x_size <= FORCE_MAXGAP_LEN + force_end: the reference's unsigned
    window bound wraps and every diagonal candidate is excluded.  The
    engine routes xw=128 buckets to the row kernel (ANTI_MIN_XW);
    overriding the threshold pins the ANTI-DIAGONAL kernel on these
    tiny windows too."""
    rng = np.random.default_rng(73)
    a = rng.integers(0, 4, size=120).astype(np.uint8)
    problems = []
    for xs in (2, 5, 10, 11, 12):
        problems.append((a, 0, len(a) - 1, a[:60].copy(), 0, xs - 1,
                         False, True))
    for eng in (ENG30,
                _anti_small := BswEngine(band=30, backend="pallas",
                                         traceback="device")):
        eng_label = "row-bucket" if eng is ENG30 else "anti-forced"
        if eng is not ENG30:
            eng.ANTI_MIN_XW = 128
        got = eng.align_many(problems)
        for k, pr in enumerate(problems):
            assert_same(got[k], bsw_align(*pr, band=30),
                        f"{eng_label} x_size case {k}")


def test_negative_begin_a_no_fallback():
    """begin_a < 0 batches run the SAME anti-diagonal shape (the row
    form needed an all-full fallback kernel)."""
    rng = np.random.default_rng(74)
    g = rng.integers(0, 4, size=500).astype(np.uint8)
    a = g[:280].copy()
    b = np.concatenate([rng.integers(0, 4, size=50).astype(np.uint8),
                        g[:240]])
    problems = [
        (a, -35, 200, b, 0, len(b) - 1, False, True),
        (a, -100, 170, b, 0, len(b) - 1, False, False),
        (a, 0, len(a) - 1, mutate(rng, a), 0, 270, False, False),
    ]
    got = ENG30.align_many(problems)
    for k, pr in enumerate(problems):
        assert_same(got[k], bsw_align(*pr, band=30), f"case {k}")


def test_force_start_deep_pos0():
    """force_start with the pos==0 column crossing FORCE_MAXGAP_LEN
    rows (the fresh/forced transition at i == 10)."""
    rng = np.random.default_rng(75)
    a = rng.integers(0, 4, size=80).astype(np.uint8)
    b = np.concatenate([a[:40], rng.integers(0, 4, 25).astype(np.uint8)])
    # begin_a = 0 puts pos==0 in-band for the first `band` rows
    pr = (a, 0, 79, b, 0, len(b) - 1, True, False)
    assert_same(ENG30.align_one(*pr), bsw_align(*pr, band=30))


def test_edits_fetch_matches_lean():
    eng_e = BswEngine(band=30, backend="pallas", traceback="device",
                      fetch="edits")
    eng_l = BswEngine(band=30, backend="pallas", traceback="device",
                      fetch="lean")
    rng = np.random.default_rng(76)
    a = rng.integers(0, 4, size=260).astype(np.uint8)
    b = mutate(rng, a)
    pr = (a, 0, len(a) - 1, b, 0, len(b) - 1, False, False)
    ref = bsw_align(*pr, band=30)
    got_e = eng_e.align_one(*pr)
    got_l = eng_l.align_one(*pr)
    assert_same(got_e, ref)
    assert got_l.begin_a == ref.begin_a and got_l.score == ref.score
    assert got_l.length == ref.length
    assert got_l.homology == pytest.approx(ref.homology, abs=1e-12)
