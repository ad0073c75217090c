"""Native C++ BAM decoder vs the pure-Python oracle decoder."""

import numpy as np
import pytest

import testutil
from gam_ngs_tpu.io import bam, bgzf
from gam_ngs_tpu.native import bamdecode

pytestmark = pytest.mark.skipif(not bamdecode.available(),
                                reason="native toolchain unavailable")


def _synth_bam(tmp_path, n_pairs=300, with_tags=True):
    rng = np.random.default_rng(7)
    genome = testutil.random_genome(rng, 5000)
    recs = []
    for i in range(n_pairs):
        p = int(rng.integers(0, 4000))
        q = p + 150
        recs += testutil.make_pe_records(
            f"read_{i}", genome[p:p + 50], 0, p, False,
            genome[q:q + 50], 0, q, True)
    path = str(tmp_path / "t.bam")
    testutil.write_sorted_bam(path, ["C0"], [5000], recs)
    return path


def test_native_matches_python(tmp_path):
    path = _synth_bam(tmp_path)
    py_header, py_table = bam.decode_bam_bytes(bgzf.read_file(path))
    nat_header, nat_table = bamdecode.decode_file(path)

    assert nat_header.ref_names == py_header.ref_names
    assert nat_header.ref_lengths == py_header.ref_lengths
    assert nat_header.text == py_header.text
    for fname in ("ref_id", "pos", "end_pos", "flag", "l_seq",
                  "mate_ref_id", "mate_pos", "nh", "xt", "name_h1",
                  "name_h2"):
        a = getattr(py_table, fname)
        b = getattr(nat_table, fname)
        assert a.dtype == b.dtype, fname
        np.testing.assert_array_equal(a, b, err_msg=fname)


def test_read_bam_uses_native(tmp_path):
    path = _synth_bam(tmp_path, n_pairs=50)
    bf = bam.read_bam(path)
    py_header, py_table = bam.decode_bam_bytes(bgzf.read_file(path))
    np.testing.assert_array_equal(bf.table.name_h1, py_table.name_h1)
    assert len(bf.table) == len(py_table)


def test_empty_bam(tmp_path):
    path = str(tmp_path / "empty.bam")
    testutil.write_sorted_bam(path, ["C0"], [100], [])
    nat_header, nat_table = bamdecode.decode_file(path)
    assert len(nat_table) == 0
    assert nat_header.ref_names == ["C0"]


def test_native_block_scan_matches_python(tmp_path):
    """Native findBlocks vs the Python oracle on a two-contig genome
    with overlapping read lattices (exercises active-list retirement,
    strand evidence, and the short-read empty-block quirk)."""
    from gam_ngs_tpu.core import blocks as blocks_mod
    from gam_ngs_tpu.core.multibam import MultiBam

    rng = np.random.default_rng(21)
    genome = testutil.random_genome(rng, 8000)
    m_recs, s_recs = [], []
    for i in range(500):
        p = int(rng.integers(0, 7500))
        q = min(p + 200, 7800)
        m_recs += testutil.make_pe_records(
            f"p{i}", genome[p:p + 50], 0, p, False,
            genome[q:q + 50], 0, q, True)
        # slave genome split at 4000 into two contigs
        def splat(pos):
            return (0, pos) if pos < 4000 else (1, pos - 4000)
        c1, p1 = splat(p)
        c2, p2 = splat(q)
        s_recs += testutil.make_pe_records(
            f"p{i}", genome[p:p + 50], c1, p1, False,
            genome[q:q + 50], c2, p2, True)
    mp, sp = str(tmp_path / "m.bam"), str(tmp_path / "s.bam")
    testutil.write_sorted_bam(mp, ["M0"], [8000], m_recs)
    testutil.write_sorted_bam(sp, ["S0", "S1"], [4000, 4000], s_recs)
    ml, sl = str(tmp_path / "m.list"), str(tmp_path / "s.list")
    testutil.write_bam_list(ml, [mp])
    testutil.write_bam_list(sl, [sp])

    master = MultiBam.open(ml)
    slave = MultiBam.open(sl)
    for mbs in (1, 10, 60):
        map1, map2 = blocks_mod.load_reads_map(master, False)
        py = blocks_mod.find_blocks(slave, mbs, map1, map2, False)
        nat = blocks_mod.find_blocks_fast(master, slave, mbs, False)
        assert nat is not None
        assert len(nat) == len(py), f"mbs={mbs}"
        for f in ("num_reads", "m_ctg", "m_begin", "m_end",
                  "m_block_reads_len", "s_ctg", "s_strand", "s_begin",
                  "s_end", "s_block_reads_len"):
            np.testing.assert_array_equal(
                getattr(py, f), getattr(nat, f), err_msg=f"{f} mbs={mbs}")


def test_tsan_threaded_decoder(tmp_path):
    """Race-detection harness (SURVEY.md §5): the native decoder's
    rolling-window parallel inflate compiled with -fsanitize=thread and
    driven over a multi-contig BAM must produce zero TSAN reports."""
    import os
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(here, "gam_ngs_tpu", "native", "gamio_tsan_main.cc")
    binary = str(tmp_path / "gamio_tsan")
    try:
        subprocess.run(
            ["g++", "-O1", "-g", "-fsanitize=thread", "-o", binary, src,
             "-I", os.path.dirname(src), "-lz", "-pthread"],
            check=True, capture_output=True, text=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import pytest

        pytest.skip(f"tsan toolchain unavailable: "
                    f"{getattr(e, 'stderr', e)}"[:300])

    rng = np.random.default_rng(11)
    recs = []
    for c in range(5):
        genome = testutil.random_genome(rng, 3000)
        for i in range(200):
            p = int(rng.integers(0, 2600))
            recs += testutil.make_pe_records(
                f"c{c}r{i}" + "y" * int(rng.integers(0, 30)),
                genome[p:p + 50], c, p, False,
                genome[p + 150:p + 200], c, p + 150, True)
    bam = str(tmp_path / "tsan.bam")
    testutil.write_sorted_bam(bam, [f"C{c}" for c in range(5)],
                              [3000] * 5, recs)

    res = subprocess.run([binary, bam, "8", "8192"],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, f"harness failed:\n{res.stderr[-3000:]}"
    assert "TSAN_HARNESS_OK" in res.stdout
    assert "ThreadSanitizer" not in res.stderr, \
        f"TSAN report:\n{res.stderr[-4000:]}"
