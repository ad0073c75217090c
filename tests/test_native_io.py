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
