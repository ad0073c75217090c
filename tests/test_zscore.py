"""Vectorized compute_zscore vs the per-row scalar oracle.

The production z-score (merge/zscore.py) evaluates the reference's
per-record filters (PartitionFunctions.cc:173) as numpy column masks;
this differential drives both paths over a randomized record soup —
duplicates, secondary/QC-fail flags, cross-contig mates, multi-mapped
reads, out-of-band inserts — across many query windows.
"""

import numpy as np
import pytest

import testutil
from gam_ngs_tpu.core.multibam import MultiBam
from gam_ngs_tpu.merge.zscore import compute_zscore, compute_zscore_scalar


@pytest.fixture(scope="module")
def noisy_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("zscore")
    rng = np.random.default_rng(7)
    genome = testutil.random_genome(rng, 6000)
    recs = []
    for i in range(800):
        p = int(rng.integers(0, 5000))
        ins = int(rng.integers(120, 420))
        q = min(p + ins - 50, 5950)
        k = int(rng.integers(0, 10))
        r1, r2 = testutil.make_pe_records(
            f"r{i}", genome[p:p + 50], 0, p, False,
            genome[q:q + 50], 0, q, True,
            nh=3 if k == 4 else 1, xt="R" if k == 4 else "U")
        # corrupt a fraction of records to exercise every filter branch
        if k == 0:
            r1["flag"] |= 0x400      # duplicate
        elif k == 1:
            r1["flag"] |= 0x100      # secondary
        elif k == 2:
            r1["flag"] |= 0x200      # QC fail
        elif k == 3:
            r1["flag"] |= 0x8        # mate unmapped
        recs += [r1, r2]
    bam = str(tmp / "z.bam")
    testutil.write_sorted_bam(bam, ["C0"], [6000], recs)
    lst = str(tmp / "z.list")
    testutil.write_bam_list(lst, [bam], [(100, 1000)])
    mb = MultiBam.open(lst)
    mb.compute_statistics(require_paired_flag=False)
    return mb


@pytest.mark.parametrize("no_mult", [False, True])
def test_vectorized_matches_scalar(noisy_bam, no_mult):
    rng = np.random.default_rng(11)
    checked = nonzero = 0
    for _ in range(60):
        a = int(rng.integers(0, 5500))
        b = a + int(rng.integers(50, 2000))
        v = compute_zscore(noisy_bam, 0, a, b, no_mult)
        s = compute_zscore_scalar(noisy_bam, 0, a, b, no_mult)
        assert v == pytest.approx(s, abs=1e-12), (a, b)
        checked += 1
        nonzero += any(x != 0.0 for x in s)
    assert checked == 60 and nonzero > 10  # the windows actually score


def test_empty_window(noisy_bam):
    assert compute_zscore(noisy_bam, 0, 5990, 5995) == \
        compute_zscore_scalar(noisy_bam, 0, 5990, 5995) == [0.0]
