"""Pallas banded-SW kernel vs the exact oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from gam_ngs_tpu.ops.bsw_batch import BswEngine
from gam_ngs_tpu.ops.bsw_ref import bsw_align


def assert_same(aln1, aln2, label=""):
    assert aln1.begin_a == aln2.begin_a, label
    assert aln1.begin_b == aln2.begin_b, label
    assert aln1.score == aln2.score, label
    assert aln1.homology == pytest.approx(aln2.homology, abs=1e-12), label
    assert aln1.edits.tolist() == aln2.edits.tolist(), label


ENGINE = BswEngine(band=30, backend="pallas")


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


def test_random_pairs_with_n():
    rng = np.random.default_rng(10)
    problems = []
    for k in range(6):
        n = int(rng.integers(80, 350))
        hi = 5 if k % 2 == 0 else 4
        a = rng.integers(0, hi, size=n).astype(np.uint8)
        b = mutate(rng, a)
        problems.append((a, 0, len(a) - 1, b, 0, len(b) - 1, False, False))
    got = ENGINE.align_many(problems)
    for k, pr in enumerate(problems):
        assert_same(got[k], bsw_align(*pr, band=30), f"case {k}")


@pytest.mark.parametrize("fs,fe", [(True, False), (False, True),
                                   (True, True)])
def test_force_flags(fs, fe):
    rng = np.random.default_rng(11)
    g = rng.integers(0, 4, size=500).astype(np.uint8)
    a = g[:330].copy()
    b = mutate(rng, g[:350])
    pr = (a, 0, len(a) - 1, b, 0, len(b) - 1, fs, fe)
    assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))


def test_offset_semiglobal_window():
    rng = np.random.default_rng(12)
    g = rng.integers(0, 4, size=800).astype(np.uint8)
    b = g[400:650].copy()
    pr = (g, 380, 700, b, 0, 249, False, False)
    assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))


def test_offset_prefix_divergent_tail():
    """Regression: lane-varying scan slopes (fresh-start boundaries) —
    the doubling-scan combine must use the current element's slope."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 5, size=300).astype(np.uint8)
    b = np.concatenate([a[40:200],
                        rng.integers(0, 4, size=30).astype(np.uint8)])
    pr = (a, 0, 299, b, 0, len(b) - 1, False, False)
    assert_same(ENGINE.align_one(*pr), bsw_align(*pr, band=30))


DEVICE_TB = BswEngine(band=30, backend="pallas", traceback="device")


def test_device_traceback_matches_oracle():
    """Lockstep on-device traceback walk == oracle edits exactly."""
    rng = np.random.default_rng(14)
    problems = []
    for k in range(5):
        n = int(rng.integers(80, 300))
        a = rng.integers(0, 5, size=n).astype(np.uint8)
        b = mutate(rng, a)
        problems.append((a, 0, len(a) - 1, b, 0, len(b) - 1,
                         k % 2 == 0, False))
    got = DEVICE_TB.align_many(problems)
    for k, pr in enumerate(problems):
        assert_same(got[k], bsw_align(*pr, band=30), f"case {k}")


def test_device_traceback_not_found_and_empty():
    a = np.zeros(40, np.uint8)
    # empty window mixes with real problems in one chunk
    probs = [(a, 0, 39, a, 30, 5, False, False),
             (a, 0, 39, a[:30], 0, 29, False, False)]
    got = DEVICE_TB.align_many(probs)
    assert got[0].length == 0
    assert_same(got[1], bsw_align(*probs[1], band=30))


def test_negative_begin_a_forces_full_rows():
    """Reference tail alignments may pass begin_a < 0
    (PctgBuilder.cc:1549): pos==0 lanes then appear at arbitrary row
    depth, so the engine must select the all-full kernel variant; the
    result must stay cell-exact vs the oracle."""
    rng = np.random.default_rng(33)
    g = rng.integers(0, 4, size=400).astype(np.uint8)
    a = g[:250].copy()
    b = np.concatenate([rng.integers(0, 4, size=60).astype(np.uint8),
                        g[:200]])
    probs = [
        (a, -40, 190, b, 0, len(b) - 1, False, True),
        (a, -120, 150, b, 0, len(b) - 1, False, False),
        # mixed batch: one non-negative problem shares the chunk
        (a, 0, len(a) - 1, b, 0, len(b) - 1, False, False),
    ]
    got = ENGINE.align_many(probs)
    for k, pr in enumerate(probs):
        assert_same(got[k], bsw_align(*pr, band=30), f"case {k}")


def test_deep_rows_lean_tiles_exact():
    """Problems far longer than the band: most tiles take the LEAN
    body (constant-slope scan, no pos==0 branches) — must be
    cell-exact, including per-problem x_size variation in one batch
    and matches landing in deep rows."""
    rng = np.random.default_rng(34)
    probs = []
    for k, n in enumerate((700, 1000, 430)):
        a = rng.integers(0, 5, size=n).astype(np.uint8)
        b = mutate(rng, a)
        probs.append((a, 0, n - 1, b, 0, len(b) - 1, k == 1, False))
    got = ENGINE.align_many(probs)
    for k, pr in enumerate(probs):
        assert_same(got[k], bsw_align(*pr, band=30), f"case {k}")
