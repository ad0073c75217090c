"""Core engine tests: stats, read maps, block construction, filters."""

import numpy as np
import pytest

from gam_ngs_tpu.core import blocks as blocks_mod
from gam_ngs_tpu.core import stats as stats_mod
from gam_ngs_tpu.core.multibam import MultiBam
from gam_ngs_tpu.io import bam as bam_io

import testutil


def se_read(name, ref, pos, length=50, rev=False, nh=1, xt="U"):
    tags = bam_io.make_tag_i("NH", nh) + bam_io.make_tag_A("XT", xt)
    return dict(name=name, flag=(0x10 if rev else 0), ref_id=ref, pos=pos,
                cigar=[(length, "M")], seq="A" * length, tags=tags)


def make_multibam(tmp_path, tag, ref_names, ref_lengths, records,
                  inserts=((100, 1000000),)):
    bam_p = str(tmp_path / f"{tag}.bam")
    testutil.write_sorted_bam(bam_p, ref_names, ref_lengths, records)
    lst = str(tmp_path / f"{tag}.list")
    testutil.write_bam_list(lst, [bam_p], list(inserts))
    return MultiBam.open(lst), lst


class TestWelford:
    def test_two_samples(self):
        m, s, c = stats_mod.welford_isize_stats(np.array([200, 210]))
        assert m == 205.0
        assert c == 3
        assert s == pytest.approx(np.sqrt(50.0 / 3.0), abs=1e-12)

    def test_empty(self):
        m, s, c = stats_mod.welford_isize_stats(np.array([], np.int64))
        assert (m, s, c) == (0.0, 0.0, 1)

    def test_matches_sequential_cpp_order(self):
        rng = np.random.default_rng(0)
        xs = rng.integers(100, 400, size=1000)
        m, s, c = stats_mod.welford_isize_stats(xs)
        assert m == pytest.approx(xs.mean(), rel=1e-12)
        # reference quirk: variance divided by n+1
        assert s == pytest.approx(np.sqrt(xs.var() * len(xs) / (len(xs) + 1)),
                                  rel=1e-9)


class TestInsertFilters:
    def test_isize_computation_and_orientation(self, tmp_path):
        recs = testutil.make_pe_records(
            "p0", "A" * 50, 0, 100, False, "A" * 50, 0, 250, True)
        # wrong orientation pair (RF) — skipped
        recs += testutil.make_pe_records(
            "p1", "A" * 50, 0, 300, True, "A" * 50, 0, 450, False)
        mb, _ = make_multibam(tmp_path, "m", ["c"], [1000], recs)
        ins = stats_mod.filtered_inserts(mb.files[0].table, 100, 1000000, True)
        # p0 first mate fwd: 250 + 50 - 100 = 200
        # p0 second mate is not FirstMate -> skipped
        # p1 first mate rev at 300 with mate at 450 (mate_start > start):
        #   fwd_first branch needs fwd read — orientation fails
        assert ins.tolist() == [200]

    def test_bounds(self, tmp_path):
        recs = testutil.make_pe_records(
            "p0", "A" * 50, 0, 100, False, "A" * 50, 0, 250, True)
        mb, _ = make_multibam(tmp_path, "m", ["c"], [1000], recs)
        assert stats_mod.filtered_inserts(
            mb.files[0].table, 201, 1000000, True).size == 0

    def test_coverage(self, tmp_path):
        recs = [se_read("a", 0, 0, 100), se_read("b", 0, 50, 100)]
        mb, _ = make_multibam(tmp_path, "m", ["c"], [400], recs)
        mb.compute_statistics(require_paired_flag=True)
        assert mb.coverage[0] == pytest.approx(200 / 400.0)


class TestFindBlocks:
    def _run(self, tmp_path, master_reads, slave_reads, mbs=2,
             ref_m=("mc",), len_m=(1000,), ref_s=("sc",), len_s=(1000,),
             no_mult=False):
        m_recs = [se_read(*r[:-1], **r[-1]) if isinstance(r[-1], dict)
                  else se_read(*r) for r in master_reads]
        s_recs = [se_read(*r[:-1], **r[-1]) if isinstance(r[-1], dict)
                  else se_read(*r) for r in slave_reads]
        master, _ = make_multibam(tmp_path, "master", list(ref_m), list(len_m), m_recs)
        slave, _ = make_multibam(tmp_path, "slave", list(ref_s), list(len_s), s_recs)
        m_cov = blocks_mod.coverage_vectors(master, no_mult)
        s_cov = blocks_mod.coverage_vectors(slave, no_mult)
        map1, map2 = blocks_mod.load_reads_map(master, no_mult)
        bt = blocks_mod.find_blocks(slave, mbs, map1, map2, no_mult)
        blocks_mod.update_coverages(bt, m_cov, s_cov)
        return bt

    def test_basic_block(self, tmp_path):
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100), ("r1", 0, 120), ("r2", 0, 400)],
            slave_reads=[("r0", 0, 100), ("r1", 0, 120), ("r2", 0, 400)],
        )
        assert len(bt) == 1
        # readsLen over [100,169]: r0 contributes 50 + r1 contributes 50
        assert bt.row(0) == (2, 0, ord("+"), 100, 169, 100, 100,
                             0, ord("+"), 100, 169, 100, 100)

    def test_min_block_size_drops_small(self, tmp_path):
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100)],
            slave_reads=[("r0", 0, 100)],
            mbs=2,
        )
        assert len(bt) == 0

    def test_adjacency_extends(self, tmp_path):
        # slave read starting exactly at frame_end+1 still joins the block
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100), ("r1", 0, 150)],
            slave_reads=[("r0", 0, 100), ("r1", 0, 150)],
        )
        assert len(bt) == 1
        assert bt.row(0)[0] == 2
        assert (bt.m_begin[0], bt.m_end[0]) == (100, 199)

    def test_gap_splits_blocks(self, tmp_path):
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100), ("r1", 0, 120),
                          ("r2", 0, 400), ("r3", 0, 420)],
            slave_reads=[("r0", 0, 100), ("r1", 0, 120),
                         ("r2", 0, 400), ("r3", 0, 420)],
        )
        assert len(bt) == 2
        assert (bt.m_begin.tolist(), bt.m_end.tolist()) == ([100, 400], [169, 469])

    def test_strand_evidence(self, tmp_path):
        # both reads reversed on slave only -> discordant -> slave strand '-'
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100), ("r1", 0, 120)],
            slave_reads=[("r0", 0, 100, 50, True), ("r1", 0, 120, 50, True)],
        )
        assert len(bt) == 1
        assert chr(bt.s_strand[0]) == "-"
        assert chr(bt.m_strand[0]) == "+"

    def test_multiplicity_filter(self, tmp_path):
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100), ("r1", 0, 120)],
            slave_reads=[("r0", 0, 100, 50, False, dict(nh=2)),
                         ("r1", 0, 120)],
        )
        assert len(bt) == 0  # only one read joined

    def test_no_mult_filter_keeps_multimapped(self, tmp_path):
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100), ("r1", 0, 120)],
            slave_reads=[("r0", 0, 100, 50, False, dict(nh=2)),
                         ("r1", 0, 120)],
            no_mult=True,
        )
        assert len(bt) == 1 and bt.num_reads[0] == 2

    def test_master_gap_splits(self, tmp_path):
        # reads adjacent on slave but far apart on master -> separate blocks
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100), ("r1", 0, 700)],
            slave_reads=[("r0", 0, 100), ("r1", 0, 120)],
            mbs=1,
        )
        assert len(bt) == 2

    def test_short_read_cannot_seed(self, tmp_path):
        # reads shorter than min_block_size enqueue an empty block that
        # absorbs the next matched read (Block ctor quirk)
        bt = self._run(
            tmp_path,
            master_reads=[("r0", 0, 100, 30), ("r1", 0, 500)],
            slave_reads=[("r0", 0, 100, 30), ("r1", 0, 500)],
            mbs=40,
        )
        # r0 len 30 < 40: empty block; r1 absorbed by the EMPTY block
        # (numReads becomes 1 < 40) -> nothing emitted
        assert len(bt) == 0


class TestCoverageFilter:
    def test_filter_by_coverage(self):
        from gam_ngs_tpu.io.blocks_io import BlockTable
        rows = [
            # ratio 600/1200=0.5 and 600/1100≈0.55 -> max 0.55 < 0.75 -> drop
            (12, 0, ord("+"), 0, 99, 600, 1200, 0, ord("+"), 0, 99, 600, 1100),
            # ratios 1.0 -> kept; cov = 1000/100 = 10 >= min_cov
            (20, 1, ord("+"), 0, 99, 1000, 1000, 1, ord("+"), 0, 99, 1000, 1000),
            # ratios 1.0 but cov 2 < min_cov 5, not single-link -> drop
            (2, 2, ord("+"), 0, 99, 200, 200, 2, ord("+"), 0, 99, 200, 200),
            # same as above but single-link -> kept
            (2, 3, ord("+"), 0, 99, 200, 200, 3, ord("+"), 0, 99, 200, 200),
        ]
        bt = BlockTable.from_rows(rows)
        out = blocks_mod.filter_blocks_by_coverage(bt, {(3, 3)}, 5.0, 0.75)
        assert out.m_ctg.tolist() == [1, 3]

    def test_no_blocks_contigs(self):
        from gam_ngs_tpu.io.blocks_io import BlockTable
        rows = [(5, 1, ord("+"), 0, 9, 1, 1, 0, ord("+"), 0, 9, 1, 1)]
        bt = BlockTable.from_rows(rows)
        m, s = blocks_mod.no_blocks_contigs(3, 2, bt)
        assert m.tolist() == [True, False, True]
        assert s.tolist() == [False, True]
