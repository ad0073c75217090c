"""End-to-end gam-create pipeline test on fabricated BAMs."""

import numpy as np

from gam_ngs_tpu.models.create import CreateOptions, run_create
from gam_ngs_tpu.io import blocks_io

import testutil


def test_create_end_to_end(tmp_path):
    rng = np.random.default_rng(7)
    genome = testutil.random_genome(rng, 2000)
    read_len, insert = 50, 200

    # identical assemblies; paired reads sampled from the genome
    pairs = testutil.sample_reads_from(genome, rng, 60, read_len, insert)
    m_recs, s_recs = [], []
    for name, p1, p2 in pairs:
        seq1 = genome[p1:p1 + read_len]
        seq2 = genome[p2:p2 + read_len]
        m_recs += testutil.make_pe_records(name, seq1, 0, p1, False,
                                           seq2, 0, p2, True)
        s_recs += testutil.make_pe_records(name, seq1, 0, p1, False,
                                           seq2, 0, p2, True)

    mp = str(tmp_path / "master.bam")
    sp = str(tmp_path / "slave.bam")
    testutil.write_sorted_bam(mp, ["mctg0"], [2000], m_recs)
    testutil.write_sorted_bam(sp, ["sctg0"], [2000], s_recs)
    ml = str(tmp_path / "master.list")
    sl = str(tmp_path / "slave.list")
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])

    opts = CreateOptions(master_bam_file=ml, slave_bam_file=sl,
                         min_block_size=10,
                         output_file_prefix=str(tmp_path / "out"))
    logs = []
    blocks = run_create(opts, log=logs.append)

    # identical mappings => every read joins; one or few dense blocks
    assert len(blocks) >= 1
    assert blocks.num_reads.sum() >= 100  # most of the 120 records joined

    # outputs exist and parse
    bt = blocks_io.load_blocks(str(tmp_path / "out.blocks"))
    assert len(bt) == len(blocks)
    iz = open(ml + ".isize").read().split("\n")
    assert iz[0] == mp
    mean = float(iz[1].split("\t")[0])
    assert abs(mean - 200.0) < 1.0  # insert size 200 by construction

    assert any("[main] finding blocks" in l for l in logs)


def test_create_identical_master_slave_blocks_symmetric(tmp_path):
    """Frames on master and slave must be identical when mappings match."""
    rng = np.random.default_rng(3)
    genome = testutil.random_genome(rng, 1500)
    pairs = testutil.sample_reads_from(genome, rng, 40, 50, 200)
    recs = []
    for name, p1, p2 in pairs:
        recs += testutil.make_pe_records(
            name, genome[p1:p1 + 50], 0, p1, False,
            genome[p2:p2 + 50], 0, p2, True)
    mp = str(tmp_path / "m.bam")
    sp = str(tmp_path / "s.bam")
    testutil.write_sorted_bam(mp, ["c"], [1500], recs)
    testutil.write_sorted_bam(sp, ["c"], [1500], recs)
    ml, sl = str(tmp_path / "m.list"), str(tmp_path / "s.list")
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])
    blocks = run_create(CreateOptions(
        master_bam_file=ml, slave_bam_file=sl, min_block_size=5,
        output_file_prefix=str(tmp_path / "o")), log=lambda *_: None)
    assert (blocks.m_begin == blocks.s_begin).all()
    assert (blocks.m_end == blocks.s_end).all()
    assert (blocks.m_reads_len == blocks.s_reads_len).all()


def test_create_engines_byte_identical(tmp_path):
    """oracle / native / tpu engines must all emit the same .blocks file
    — the device join (ops/device_join.py) at the pipeline surface."""
    rng = np.random.default_rng(11)
    genome = testutil.random_genome(rng, 3000)
    read_len = 50
    pairs = testutil.sample_reads_from(genome, rng, 120, read_len, 220)
    m_recs, s_recs = [], []
    for name, p1, p2 in pairs:
        seq1 = genome[p1:p1 + read_len]
        seq2 = genome[p2:p2 + read_len]
        m_recs += testutil.make_pe_records(name, seq1, 0, p1, False,
                                           seq2, 0, p2, True)
        s_recs += testutil.make_pe_records(name, seq1, 0, p1, False,
                                           seq2, 0, p2, True)
    mp, sp = str(tmp_path / "m.bam"), str(tmp_path / "s.bam")
    testutil.write_sorted_bam(mp, ["c0"], [3000], m_recs)
    testutil.write_sorted_bam(sp, ["c0"], [3000], s_recs)
    ml, sl = str(tmp_path / "m.list"), str(tmp_path / "s.list")
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])

    outputs = {}
    for engine in ("oracle", "native", "tpu"):
        if engine == "native":
            from gam_ngs_tpu.native import native_available
            if not native_available():
                continue
        prefix = str(tmp_path / f"out_{engine}")
        run_create(CreateOptions(
            master_bam_file=ml, slave_bam_file=sl, min_block_size=10,
            output_file_prefix=prefix, engine=engine), log=lambda *_: None)
        outputs[engine] = open(prefix + ".blocks", "rb").read()

    assert len(outputs["oracle"]) > 100
    for engine, data in outputs.items():
        assert data == outputs["oracle"], f"{engine} diverges from oracle"
