"""Adversarial-scale differential corpus: oracle vs device vs native.

The reference binary cannot be compiled in this image (Boost and
sparsehash are absent — see BASELINE.md), so the widest available net
is a three-way differential across independently-implemented paths:

  create: Python oracle scan / JAX device join / C++ native scan must
          emit byte-identical .blocks across a min-block-size sweep;
  merge:  sequential oracle aligner vs batched device engine must emit
          byte-identical output files (.gam.fasta, .pctgs, .stats, …).

Scenarios are chosen to hit the branches where a shared misreading
would be most likely to diverge: repeat-heavy genomes with
multi-mapped reads, fork-dense bridge topologies, deliberate
master/slave order conflicts (cyclic graphs, dropped by the census),
and reverse-complemented slave contigs.
"""

import numpy as np
import pytest

import testutil
from gam_ngs_tpu.io import fasta
from gam_ngs_tpu.models.create import CreateOptions, run_create
from gam_ngs_tpu.models.merge import MergeOptions, run_merge
from gam_ngs_tpu.ops.bsw_batch import BswEngine

READ_LEN = 50
INSERT = 200

MERGE_OUTS = ("gam.fasta", "pctgs", "stats", "noblocks.BF.fasta",
              "noblocks.AF.fasta", "notmerged.fasta")


def _lattice(genome_piece: str, stride: int = 8):
    n = len(genome_piece)
    return [(p, p + INSERT - READ_LEN)
            for p in range(0, n - INSERT + 1, stride)]


def _emit_pair(recs, name, genome, base, p, q, ctg, off, nh=1, xt="U"):
    recs += testutil.make_pe_records(
        name, genome[base + p:base + p + READ_LEN], ctg, off + p, False,
        genome[base + q:base + q + READ_LEN], ctg, off + q, True,
        nh=nh, xt=xt)


def _write_assembly(tmp_path, tag, ctgs, recs, inserts=(100, 1000)):
    """ctgs: list of (name, seq_str).  Returns (bam_list, fasta)."""
    bam = str(tmp_path / f"{tag}.bam")
    testutil.write_sorted_bam(bam, [n for n, _ in ctgs],
                              [len(s) for _, s in ctgs], recs)
    lst = str(tmp_path / f"{tag}.list")
    testutil.write_bam_list(lst, [bam], [inserts])
    fa = str(tmp_path / f"{tag}.fasta")
    fasta.write_fasta(fa, [(n, fasta.seq_to_codes(s)) for n, s in ctgs])
    return lst, fa


def _differential(tmp_path, ml, sl, mfa, sfa, mbs_sweep=(1, 5, 10, 30),
                  check_reconstruction=None):
    """Three-way create differential + two-way merge differential."""
    for mbs in mbs_sweep:
        blocks_bytes = {}
        for engine in ("oracle", "tpu", "native"):
            prefix = str(tmp_path / f"blk_{engine}_{mbs}")
            run_create(CreateOptions(
                master_bam_file=ml, slave_bam_file=sl,
                min_block_size=mbs, output_file_prefix=prefix,
                engine=engine), log=lambda *_: None)
            blocks_bytes[engine] = open(prefix + ".blocks", "rb").read()
        assert blocks_bytes["oracle"] == blocks_bytes["tpu"], \
            f"device join diverged at mbs={mbs}"
        assert blocks_bytes["oracle"] == blocks_bytes["native"], \
            f"native scan diverged at mbs={mbs}"

    # merge differential at the sweep's default granularity
    merged = {}
    for tag, eng in (("seq", None), ("dev", BswEngine())):
        run_merge(MergeOptions(
            master_bam_file=ml, slave_bam_file=sl,
            blocks_file=str(tmp_path / "blk_oracle_5.blocks"),
            master_fasta_file=mfa, slave_fasta_file=sfa,
            min_block_size=5,
            output_file_prefix=str(tmp_path / tag), engine=eng,
        ), log=lambda *_: None)
        merged[tag] = {
            o: open(tmp_path / f"{tag}.{o}", "rb").read()
            for o in MERGE_OUTS}
    for o in MERGE_OUTS:
        assert merged["seq"][o] == merged["dev"][o], \
            f"merge output {o} diverged between oracle and device"

    if check_reconstruction is not None:
        recs = fasta.read_fasta(str(tmp_path / "dev.gam.fasta"))
        seqs = [fasta.codes_to_bytes(s).decode() for _n, s in recs]
        check_reconstruction(seqs)


def test_repeat_heavy_multimapped(tmp_path):
    """A repeat unit tiled between unique spacers; reads inside repeat
    copies carry NH=3/XT=R and must be dropped by every path's
    multiplicity filter identically."""
    rng = np.random.default_rng(301)
    repeat = testutil.random_genome(rng, 400)
    parts = []
    for k in range(5):
        parts.append(testutil.random_genome(rng, 1500))
        parts.append(repeat)
    parts.append(testutil.random_genome(rng, 1500))
    genome = "".join(parts)
    n = len(genome)
    junction = n // 2

    def in_repeat(p):
        # offsets of repeat copies: 1500, then every 1900
        for k in range(5):
            lo = 1500 * (k + 1) + 400 * k
            if lo - READ_LEN < p < lo + 400:
                return True
        return False

    m_recs, s_recs = [], []
    for i, (p, q) in enumerate(_lattice(genome)):
        nh, xt = (3, "R") if in_repeat(p) or in_repeat(q) else (1, "U")
        hi = q + READ_LEN
        if hi <= junction:
            _emit_pair(m_recs, f"r{i}", genome, 0, p, q, 0, 0, nh, xt)
        elif p >= junction:
            _emit_pair(m_recs, f"r{i}", genome, 0, p - junction,
                       q - junction, 1, 0, nh, xt)
        s_recs += testutil.make_pe_records(
            f"r{i}", genome[p:p + READ_LEN], 0, p, False,
            genome[q:q + READ_LEN], 0, q, True, nh=nh, xt=xt)

    ml, mfa = _write_assembly(
        tmp_path, "m", [("M0", genome[:junction]), ("M1", genome[junction:])],
        m_recs)
    sl, sfa = _write_assembly(tmp_path, "s", [("S0", genome)], s_recs)

    def check(seqs):
        assert any(genome in s for s in seqs), "genome not reconstructed"

    _differential(tmp_path, ml, sl, mfa, sfa,
                  check_reconstruction=check)


def test_fork_dense_bridges(tmp_path):
    """One slave contig bridging SIX master contigs plus a second slave
    overlapping alternate junctions: fork-dense compact graphs."""
    rng = np.random.default_rng(302)
    genome = testutil.random_genome(rng, 18000)
    cuts = list(range(0, 18001, 3000))

    m_recs, s_recs = [], []
    for i, (p, q) in enumerate(_lattice(genome)):
        hi = q + READ_LEN
        for c in range(6):
            if p >= cuts[c] and hi <= cuts[c + 1]:
                _emit_pair(m_recs, f"r{i}", genome, 0, p, q, c, -cuts[c])
        s_recs += testutil.make_pe_records(
            f"r{i}", genome[p:p + READ_LEN], 0, p, False,
            genome[q:q + READ_LEN], 0, q, True)
        # second slave covers [1500, 16500): alternate junction bridge
        if p >= 1500 and hi <= 16500:
            s_recs += testutil.make_pe_records(
                f"r{i}", genome[p:p + READ_LEN], 1, p - 1500, False,
                genome[q:q + READ_LEN], 1, q - 1500, True)

    ml, mfa = _write_assembly(
        tmp_path, "m",
        [(f"M{c}", genome[cuts[c]:cuts[c + 1]]) for c in range(6)], m_recs)
    sl, sfa = _write_assembly(
        tmp_path, "s", [("S0", genome), ("S1", genome[1500:16500])], s_recs)

    def check(seqs):
        assert any(genome in s for s in seqs)

    _differential(tmp_path, ml, sl, mfa, sfa)


def test_order_conflict_cyclic(tmp_path):
    """Slave contig stitches master segments in SWAPPED order: the
    master says A<B, the slave says B<A -> a cycle the census must
    count and drop, identically on every path."""
    rng = np.random.default_rng(303)
    seg_a = testutil.random_genome(rng, 2500)
    seg_b = testutil.random_genome(rng, 2500)
    slave_seq = seg_b + seg_a  # swapped
    master_seq = seg_a + seg_b

    m_recs, s_recs = [], []
    i = 0
    # master-consistent pairs within each segment
    for base_m, base_s, seg in ((0, 2500, seg_a), (2500, 0, seg_b)):
        for p, q in _lattice(seg):
            _emit_pair(m_recs, f"r{i}", seg, 0, p, q, 0, base_m)
            _emit_pair(s_recs, f"r{i}", seg, 0, p, q, 0, base_s)
            i += 1

    ml, mfa = _write_assembly(tmp_path, "m", [("M0", master_seq)], m_recs)
    sl, sfa = _write_assembly(tmp_path, "s", [("S0", slave_seq)], s_recs)

    _differential(tmp_path, ml, sl, mfa, sfa)
    stats = open(tmp_path / "dev.stats").read()
    assert "Cyclics = " in stats


def test_revcomp_and_mixed_strand_blocks(tmp_path):
    """Reverse-complemented slave contig with a strand-consistent
    mapping: strand inference + flipped weave on every path."""
    rng = np.random.default_rng(304)
    genome = testutil.random_genome(rng, 7000)
    junction = 3500
    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}

    def rcs(s):
        return "".join(comp[c] for c in reversed(s))

    rc = rcs(genome)
    m_recs, s_recs = [], []
    n = len(genome)
    for i, (p, q) in enumerate(_lattice(genome)):
        hi = q + READ_LEN
        if hi <= junction:
            _emit_pair(m_recs, f"r{i}", genome, 0, p, q, 0, 0)
        elif p >= junction:
            _emit_pair(m_recs, f"r{i}", genome, 0, p - junction,
                       q - junction, 1, 0)
        # slave S0 = revcomp(genome): the pair flips orientation + order
        q1 = n - p - READ_LEN  # read1, now reverse
        q2 = n - q - READ_LEN  # read2, now forward
        s_recs += testutil.make_pe_records(
            f"r{i}", rcs(genome[p:p + READ_LEN]), 0, q1, True,
            rcs(genome[q:q + READ_LEN]), 0, q2, False)

    ml, mfa = _write_assembly(
        tmp_path, "m",
        [("M0", genome[:junction]), ("M1", genome[junction:])], m_recs)
    sl, sfa = _write_assembly(tmp_path, "s", [("S0", rc)], s_recs)

    def check(seqs):
        assert any(genome in s or rc in s for s in seqs)

    _differential(tmp_path, ml, sl, mfa, sfa,
                  check_reconstruction=check)
