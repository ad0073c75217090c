"""Streaming BAM decode: bounded windows, ranged decode, .gidx index.

The native decoder (gamio_read_bam_range) never holds the whole file:
a rolling compressed buffer feeds windowed parallel inflates feeding a
resumable record parser.  These tests force tiny windows so records and
the header span window boundaries, and exercise the per-reference
offset index used by multi-host create to decode only a contig shard.
"""

import numpy as np
import pytest

import testutil
from gam_ngs_tpu.native.loader import native_available, read_bam_native


@pytest.fixture(scope="module")
def multi_ref_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    rng = np.random.default_rng(21)
    n_ref = 7
    ctg_len = 4000
    recs = []
    for c in range(n_ref):
        genome = testutil.random_genome(rng, ctg_len)
        for i in range(150):
            p = int(rng.integers(0, ctg_len - 400))
            q = p + 300
            recs += testutil.make_pe_records(
                f"c{c}r{i}" + "x" * int(rng.integers(0, 40)),
                genome[p:p + 50], c, p, False,
                genome[q:q + 50], c, q, True)
    bam = str(tmp / "multi.bam")
    testutil.write_sorted_bam(bam, [f"C{c}" for c in range(n_ref)],
                              [ctg_len] * n_ref, recs)
    return bam, n_ref


def _full(bam, **kw):
    res = read_bam_native(bam, **kw)
    assert res is not None
    return res


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_tiny_window_matches_default(multi_ref_bam):
    bam, _ = multi_ref_bam
    text0, names0, lens0, cols0 = _full(bam)
    # 1-byte window budget -> one member per window; records and the
    # header must survive window-boundary resume
    text1, names1, lens1, cols1 = _full(bam, window_bytes=1)
    assert (text0, names0, lens0) == (text1, names1, lens1)
    for k in cols0:
        np.testing.assert_array_equal(cols0[k], cols1[k], err_msg=k)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_ranged_decode_no_index(multi_ref_bam):
    bam, n_ref = multi_ref_bam
    _, _, _, cols0 = _full(bam)
    for lo, hi in [(0, 2), (2, 5), (5, n_ref), (3, 4), (0, n_ref)]:
        _, _, _, cols = _full(bam, ref_lo=lo, ref_hi=hi)
        sel = (cols0["ref_id"] >= lo) & (cols0["ref_id"] < hi)
        for k in cols0:
            np.testing.assert_array_equal(cols[k], cols0[k][sel],
                                          err_msg=f"{k} [{lo},{hi})")


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_gidx_index_roundtrip(multi_ref_bam, tmp_path):
    bam, n_ref = multi_ref_bam
    idx = str(tmp_path / "multi.bam.gidx")
    import os
    assert not os.path.exists(idx)
    # full scan writes the index
    _, _, _, cols0 = _full(bam, index_path=idx)
    assert os.path.exists(idx)
    # ranged decodes through the index seek must equal filtered full
    for lo, hi in [(0, 3), (4, 6), (6, n_ref), (2, 2)]:
        _, _, _, cols = _full(bam, ref_lo=lo, ref_hi=hi, index_path=idx)
        sel = (cols0["ref_id"] >= lo) & (cols0["ref_id"] < hi)
        for k in cols0:
            np.testing.assert_array_equal(cols[k], cols0[k][sel],
                                          err_msg=f"{k} [{lo},{hi})")
    # seek + tiny windows together
    _, _, _, cols = _full(bam, ref_lo=4, ref_hi=6, index_path=idx,
                          window_bytes=1)
    sel = (cols0["ref_id"] >= 4) & (cols0["ref_id"] < 6)
    for k in cols0:
        np.testing.assert_array_equal(cols[k], cols0[k][sel])


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_empty_range(multi_ref_bam, tmp_path):
    bam, n_ref = multi_ref_bam
    idx = str(tmp_path / "e.gidx")
    _full(bam, index_path=idx)
    _, names, _, cols = _full(bam, ref_lo=n_ref, ref_hi=n_ref + 3,
                              index_path=idx)
    assert len(names) == n_ref
    assert all(len(v) == 0 for v in cols.values())


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_bounded_memory_large_file(tmp_path):
    """Decode of a file much larger than the window stays bounded.

    Peak RSS growth must stay far below the inflated stream size
    (~36 MB inflated here vs an 8 MB window + ~2 MB columns)."""
    import resource

    rng = np.random.default_rng(5)
    genome = testutil.random_genome(rng, 5000)
    recs = []
    for i in range(120_000):
        p = int(rng.integers(0, 4500))
        recs += testutil.make_pe_records(
            f"verylongreadname_padding_{i:08d}", genome[p:p + 50], 0, p,
            False, genome[p + 300:p + 350], 0, p + 300, True)
    bam = str(tmp_path / "big.bam")
    n_recs = len(recs)
    testutil.write_sorted_bam(bam, ["C0"], [5000], recs)
    del recs

    # inflated stream is ~150 B/record (name + cigar + seq + qual + tags)
    inflated_mb = n_recs * 150 / (1 << 20)
    assert inflated_mb > 30  # far larger than the 4 MB window below

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    _, _, _, cols = read_bam_native(bam, window_bytes=4 << 20)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert len(cols["pos"]) == n_recs
    growth_mb = (rss1 - rss0) / 1024.0
    # the old full-slurp design held the whole inflated stream (>34 MB)
    # plus the compressed file; the streaming pipeline needs only the
    # window (4 MB) + rolling buffer + columns (~11 MB for 240k records)
    assert growth_mb < 25, f"RSS grew {growth_mb:.0f} MB"


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_stale_gidx_rejected(multi_ref_bam, tmp_path):
    """A .gidx whose (size, mtime) fingerprint no longer matches the
    BAM must be ignored: ranged decode falls back to the full-scan
    path and still returns correct rows (a stale seek would land on
    wrong virtual offsets and decode the wrong shard)."""
    import os
    import shutil

    bam, n_ref = multi_ref_bam
    bam2 = str(tmp_path / "copy.bam")
    idx2 = bam2 + ".gidx"
    shutil.copy(bam, bam2)
    _, _, _, cols0 = _full(bam2, index_path=idx2)
    assert os.path.exists(idx2)

    # regenerate the BAM (same contig set, different content layout):
    # prepend nothing but rewrite the file -> new size and/or mtime
    with open(bam, "rb") as fh:
        data = fh.read()
    with open(bam2, "wb") as fh:
        fh.write(data)
    os.utime(bam2, (123456789, 123456789))  # force a distinct mtime

    for lo, hi in [(0, 3), (4, n_ref)]:
        _, _, _, cols = _full(bam2, ref_lo=lo, ref_hi=hi, index_path=idx2)
        sel = (cols0["ref_id"] >= lo) & (cols0["ref_id"] < hi)
        for k in cols0:
            np.testing.assert_array_equal(cols[k], cols0[k][sel],
                                          err_msg=f"{k} [{lo},{hi})")


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_legacy_gidx1_rejected(multi_ref_bam, tmp_path):
    """Old GAMGIDX1 indexes (no fingerprint) are rejected outright."""
    import struct

    bam, n_ref = multi_ref_bam
    idx = str(tmp_path / "legacy.gidx")
    # fabricate a v1 index with garbage offsets: if the reader trusted
    # it, the seek would explode; rejection -> clean full-scan decode
    with open(idx, "wb") as fh:
        fh.write(b"GAMGIDX1")
        fh.write(struct.pack("<i", n_ref))
        fh.write(struct.pack("<q", 999999) * n_ref)
    _, _, _, cols0 = _full(bam)
    _, _, _, cols = _full(bam, ref_lo=1, ref_hi=4, index_path=idx)
    sel = (cols0["ref_id"] >= 1) & (cols0["ref_id"] < 4)
    for k in cols0:
        np.testing.assert_array_equal(cols[k], cols0[k][sel], err_msg=k)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_multi_run_ranged_decode(multi_ref_bam, tmp_path):
    """read_bam_runs: union of disjoint contig runs via per-run .gidx
    seeks must equal the filtered full decode."""
    import shutil

    from gam_ngs_tpu.io.bam import read_bam, read_bam_runs

    bam0, n_ref = multi_ref_bam
    bam = str(tmp_path / "runs.bam")
    shutil.copy(bam0, bam)
    full = read_bam(bam)
    # build the index
    _full(bam, index_path=bam + ".gidx")

    for runs in ([(0, 2), (4, 5)], [(1, 2), (3, 4), (6, n_ref)],
                 [(0, 1)], []):
        got = read_bam_runs(bam, runs) if runs else None
        if not runs:
            continue
        keep = np.zeros(len(full.table), bool)
        for lo, hi in runs:
            keep |= ((full.table.ref_id >= lo)
                     & (full.table.ref_id < hi))
        for k in ("ref_id", "pos", "end_pos", "flag", "name_h1"):
            np.testing.assert_array_equal(
                getattr(got.table, k), getattr(full.table, k)[keep],
                err_msg=f"{k} {runs}")

    # no-gidx fallback: full decode + mask, same rows
    bam2 = str(tmp_path / "noidx.bam")
    shutil.copy(bam0, bam2)
    got = read_bam_runs(bam2, [(0, 2), (4, 5)])
    keep = ((full.table.ref_id >= 0) & (full.table.ref_id < 2)) | \
           ((full.table.ref_id >= 4) & (full.table.ref_id < 5))
    np.testing.assert_array_equal(got.table.pos, full.table.pos[keep])


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_bai_interop_ranged_decode(multi_ref_bam, tmp_path):
    """A standard .bai (no .gidx) must power ranged decodes: the
    bai->gidx bridge (io/bai.py) translates per-ref first virtual
    offsets into a fingerprinted GAMGIDX2 before the native seek."""
    import os
    import shutil

    from gam_ngs_tpu.io.bam import read_bam, read_bam_runs

    bam0, n_ref = multi_ref_bam
    bam = str(tmp_path / "bai.bam")
    shutil.copy(bam0, bam)
    testutil.write_real_bai(bam)
    assert not os.path.exists(bam + ".gidx")

    full = read_bam(read_path := bam)
    got = read_bam(read_path, ref_range=(2, 5))
    assert os.path.exists(bam + ".gidx"), "bai->gidx bridge did not fire"
    sel = (full.table.ref_id >= 2) & (full.table.ref_id < 5)
    for k in ("ref_id", "pos", "end_pos", "name_h1"):
        np.testing.assert_array_equal(getattr(got.table, k),
                                      getattr(full.table, k)[sel], k)

    # multi-run path through the same synthesized index
    got2 = read_bam_runs(bam, [(0, 1), (3, 4), (6, n_ref)])
    keep = np.zeros(len(full.table), bool)
    for lo, hi in [(0, 1), (3, 4), (6, n_ref)]:
        keep |= (full.table.ref_id >= lo) & (full.table.ref_id < hi)
    np.testing.assert_array_equal(got2.table.pos, full.table.pos[keep])
