"""End-to-end gam create + merge on a synthetic two-assembly genome.

Master assembly splits the genome at 3000; the slave contig spans the
junction.  The merged assembly must reconstruct the genome exactly.
"""

import numpy as np
import pytest

from gam_ngs_tpu.io import fasta
from gam_ngs_tpu.models.create import CreateOptions, run_create
from gam_ngs_tpu.models.merge import MergeOptions, run_merge

import testutil

GENOME_LEN = 6000
JUNCTION = 3000
S0_START, S0_END = 2000, 4500  # slave contig span
READ_LEN = 50
INSERT = 200


def _pairs():
    """Deterministic lattice of FR pairs over the genome."""
    out = []
    i = 0
    for p in range(0, GENOME_LEN - INSERT + 1, 8):
        out.append((f"pair{i}", p, p + INSERT - READ_LEN))
        i += 1
    return out


def _build_inputs(tmp_path):
    rng = np.random.default_rng(12345)
    genome = testutil.random_genome(rng, GENOME_LEN)

    master_ctgs = [("M0", genome[:JUNCTION]), ("M1", genome[JUNCTION:])]
    slave_ctgs = [("S0", genome[S0_START:S0_END])]

    m_recs, s_recs = [], []
    for name, p_fwd, p_rev in _pairs():
        seq1 = genome[p_fwd:p_fwd + READ_LEN]
        seq2 = genome[p_rev:p_rev + READ_LEN]
        lo, hi = p_fwd, p_rev + READ_LEN
        # master: keep pairs fully within one master contig
        if hi <= JUNCTION:
            m_recs += testutil.make_pe_records(
                name, seq1, 0, p_fwd, False, seq2, 0, p_rev, True)
        elif lo >= JUNCTION:
            m_recs += testutil.make_pe_records(
                name, seq1, 1, p_fwd - JUNCTION, False,
                seq2, 1, p_rev - JUNCTION, True)
        # slave: keep pairs fully within S0
        if lo >= S0_START and hi <= S0_END:
            s_recs += testutil.make_pe_records(
                name, seq1, 0, p_fwd - S0_START, False,
                seq2, 0, p_rev - S0_START, True)

    mp, sp = str(tmp_path / "master.bam"), str(tmp_path / "slave.bam")
    testutil.write_sorted_bam(mp, ["M0", "M1"], [JUNCTION, GENOME_LEN - JUNCTION],
                              m_recs)
    testutil.write_sorted_bam(sp, ["S0"], [S0_END - S0_START], s_recs)
    ml, sl = str(tmp_path / "master.list"), str(tmp_path / "slave.list")
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])

    mfa, sfa = str(tmp_path / "master.fasta"), str(tmp_path / "slave.fasta")
    fasta.write_fasta(mfa, [(n, fasta.seq_to_codes(s)) for n, s in master_ctgs])
    fasta.write_fasta(sfa, [(n, fasta.seq_to_codes(s)) for n, s in slave_ctgs])
    return genome, ml, sl, mfa, sfa


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    genome, ml, sl, mfa, sfa = _build_inputs(tmp_path)
    blocks = run_create(CreateOptions(
        master_bam_file=ml, slave_bam_file=sl, min_block_size=10,
        output_file_prefix=str(tmp_path / "out")), log=lambda *_: None)
    logs = []
    pctgs = run_merge(MergeOptions(
        master_bam_file=ml, slave_bam_file=sl,
        blocks_file=str(tmp_path / "out.blocks"),
        master_fasta_file=mfa, slave_fasta_file=sfa,
        min_block_size=10, output_file_prefix=str(tmp_path / "out"),
    ), log=logs.append)
    return dict(tmp=tmp_path, genome=genome, blocks=blocks, pctgs=pctgs,
                logs=logs)


def test_blocks_link_both_masters(pipeline):
    blocks = pipeline["blocks"]
    assert len(blocks) == 2
    assert set(blocks.m_ctg.tolist()) == {0, 1}
    assert set(blocks.s_ctg.tolist()) == {0}
    assert all(chr(c) == "+" for c in blocks.s_strand)


def test_merged_assembly_reconstructs_genome(pipeline):
    pctgs = pipeline["pctgs"]
    assert len(pctgs) == 1  # everything merged into one contig
    merged = fasta.codes_to_bytes(pctgs[0].sequence()).decode()
    assert merged == pipeline["genome"]


def test_output_files(pipeline):
    tmp = pipeline["tmp"]
    gam = fasta.read_fasta(str(tmp / "out.gam.fasta"))
    assert [n for n, _ in gam] == ["PairedContig_0"]
    assert fasta.codes_to_bytes(gam[0][1]).decode() == pipeline["genome"]

    # no leftover slave contigs
    assert open(tmp / "out.noblocks.BF.fasta", "rb").read() == b""
    assert open(tmp / "out.noblocks.AF.fasta", "rb").read() == b""
    assert open(tmp / "out.notmerged.fasta", "rb").read() == b""

    stats = open(tmp / "out.stats").read()
    assert "[graphs stats]" in stats
    assert "Linears = 1" in stats

    pctgs_desc = open(tmp / "out.pctgs").read().strip().split("\n")
    assert pctgs_desc[0].startswith("#Name\tSize")
    rows = [l for l in pctgs_desc if l.startswith("PairedContig_0")]
    # weave: master head, master block regions (blocks adjacent -> no slave
    # bases needed), master tail
    assert len(rows) >= 3
    assembly_col = [r.split("\t")[2] for r in rows]
    assert "Master" in assembly_col


def test_merge_log_progress(pipeline):
    assert any("Paired contigs built = 1" in l for l in pipeline["logs"])


# ---------------------------------------------------------------------------
# Gap-filling scenario: the master assembly MISSES genome[2900:3100]; the
# slave contig spans it.  The merged contig must recover the full genome,
# with the junction bases coming from the slave.
# ---------------------------------------------------------------------------

M0_END, M1_START = 2900, 3100


def _build_gap_inputs(tmp_path):
    rng = np.random.default_rng(777)
    genome = testutil.random_genome(rng, GENOME_LEN)

    m_recs, s_recs = [], []
    for name, p_fwd, p_rev in _pairs():
        seq1 = genome[p_fwd:p_fwd + READ_LEN]
        seq2 = genome[p_rev:p_rev + READ_LEN]
        lo, hi = p_fwd, p_rev + READ_LEN
        if hi <= M0_END:
            m_recs += testutil.make_pe_records(
                name, seq1, 0, p_fwd, False, seq2, 0, p_rev, True)
        elif lo >= M1_START:
            m_recs += testutil.make_pe_records(
                name, seq1, 1, p_fwd - M1_START, False,
                seq2, 1, p_rev - M1_START, True)
        if lo >= S0_START and hi <= S0_END:
            s_recs += testutil.make_pe_records(
                name, seq1, 0, p_fwd - S0_START, False,
                seq2, 0, p_rev - S0_START, True)

    mp, sp = str(tmp_path / "master.bam"), str(tmp_path / "slave.bam")
    testutil.write_sorted_bam(
        mp, ["M0", "M1"], [M0_END, GENOME_LEN - M1_START], m_recs)
    testutil.write_sorted_bam(sp, ["S0"], [S0_END - S0_START], s_recs)
    ml, sl = str(tmp_path / "master.list"), str(tmp_path / "slave.list")
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])

    mfa, sfa = str(tmp_path / "master.fasta"), str(tmp_path / "slave.fasta")
    fasta.write_fasta(mfa, [("M0", fasta.seq_to_codes(genome[:M0_END])),
                            ("M1", fasta.seq_to_codes(genome[M1_START:]))])
    fasta.write_fasta(sfa, [("S0",
                             fasta.seq_to_codes(genome[S0_START:S0_END]))])
    return genome, ml, sl, mfa, sfa


def test_gap_filling_uses_slave_sequence(tmp_path):
    genome, ml, sl, mfa, sfa = _build_gap_inputs(tmp_path)
    run_create(CreateOptions(
        master_bam_file=ml, slave_bam_file=sl, min_block_size=10,
        output_file_prefix=str(tmp_path / "out")), log=lambda *_: None)
    pctgs = run_merge(MergeOptions(
        master_bam_file=ml, slave_bam_file=sl,
        blocks_file=str(tmp_path / "out.blocks"),
        master_fasta_file=mfa, slave_fasta_file=sfa,
        min_block_size=10, output_file_prefix=str(tmp_path / "out"),
    ), log=lambda *_: None)

    assert len(pctgs) == 1
    merged = fasta.codes_to_bytes(pctgs[0].sequence()).decode()
    assert merged == genome
    # the junction must come from the slave
    assert any(not it.is_master for it in pctgs[0].merge_list)


def test_batched_engine_matches_sequential(pipeline):
    """run_merge with the device engine (wavefront-batched scheduler)
    must produce byte-identical outputs to the sequential oracle run."""
    from gam_ngs_tpu.ops.bsw_batch import BswEngine

    tmp = pipeline["tmp"]
    prefix = str(tmp / "dev")
    run_merge(MergeOptions(
        master_bam_file=str(tmp / "master.list"),
        slave_bam_file=str(tmp / "slave.list"),
        blocks_file=str(tmp / "out.blocks"),
        master_fasta_file=str(tmp / "master.fasta"),
        slave_fasta_file=str(tmp / "slave.fasta"),
        min_block_size=10, output_file_prefix=prefix,
        engine=BswEngine(),  # band=150, same as the sequential default
    ), log=lambda *_: None)
    for suffix in (".gam.fasta", ".pctgs", ".notmerged.fasta"):
        seq = open(str(tmp / "out") + suffix, "rb").read()
        dev = open(prefix + suffix, "rb").read()
        assert dev == seq, suffix


def test_partition_checkpoint_resume(pipeline):
    """With checkpoint=True, a rerun must not align at all (poisoned
    engine) and must reproduce byte-identical outputs from the ckpt."""
    from gam_ngs_tpu.ops.bsw_batch import BswEngine

    tmp = pipeline["tmp"]

    def merge(prefix, eng):
        run_merge(MergeOptions(
            master_bam_file=str(tmp / "master.list"),
            slave_bam_file=str(tmp / "slave.list"),
            blocks_file=str(tmp / "out.blocks"),
            master_fasta_file=str(tmp / "master.fasta"),
            slave_fasta_file=str(tmp / "slave.fasta"),
            min_block_size=10, output_file_prefix=prefix,
            engine=eng, checkpoint=True,
        ), log=lambda *_: None)
        return open(prefix + ".gam.fasta", "rb").read()

    prefix = str(tmp / "ck")
    first = merge(prefix, BswEngine())
    ckpt_files = list((tmp / "ck.ckpt").iterdir())
    assert ckpt_files, "no checkpoints written"

    class Poisoned(BswEngine):
        def align_many(self, problems):
            if problems:
                raise AssertionError("resume should not align")
            return []

    second = merge(prefix, Poisoned())
    assert second == first
    assert first == open(str(tmp / "out") + ".gam.fasta", "rb").read()
