"""Batched (device) edge-weight counting vs the sequential oracle."""

import numpy as np

import testutil
from gam_ngs_tpu.core.multibam import MultiBam
from gam_ngs_tpu.graphs.partition import partition_blocks_by_paired_contigs
from gam_ngs_tpu.graphs.assembly import AssemblyGraph
from gam_ngs_tpu.graphs.compact import CompactAssemblyGraph
from gam_ngs_tpu.models.create import CreateOptions, run_create


def _pipeline_graphs(tmp_path):
    """Three master contigs bridged by one slave contig -> a compact
    graph with master+slave edges whose weights need region counting."""
    rng = np.random.default_rng(99)
    genome = testutil.random_genome(rng, 9000)
    cuts = [0, 3000, 6000, 9000]
    m_recs, s_recs = [], []
    i = 0
    for p in range(0, 9000 - 220, 6):
        q = p + 170
        name = f"r{i}"
        i += 1
        s1 = genome[p:p + 50]
        s2 = genome[q:q + 50]
        # master: pairs within one of the three contigs
        for c in range(3):
            if p >= cuts[c] and q + 50 <= cuts[c + 1]:
                m_recs += testutil.make_pe_records(
                    name, s1, c, p - cuts[c], False,
                    s2, c, q - cuts[c], True)
        # slave: single contig spanning everything
        s_recs += testutil.make_pe_records(name, s1, 0, p, False,
                                           s2, 0, q, True)
    mp, sp = str(tmp_path / "m.bam"), str(tmp_path / "s.bam")
    testutil.write_sorted_bam(mp, ["M0", "M1", "M2"], [3000, 3000, 3000],
                              m_recs)
    testutil.write_sorted_bam(sp, ["S0"], [9000], s_recs)
    ml, sl = str(tmp_path / "m.list"), str(tmp_path / "s.list")
    testutil.write_bam_list(ml, [mp], [(50, 500)])
    testutil.write_bam_list(sl, [sp], [(50, 500)])
    blocks = run_create(CreateOptions(
        master_bam_file=ml, slave_bam_file=sl, min_block_size=10,
        output_file_prefix=str(tmp_path / "out")), log=lambda *_: None)
    master = MultiBam.open(ml)
    slave = MultiBam.open(sl)
    master.read_stats_from_file(ml + ".isize")
    slave.read_stats_from_file(sl + ".isize")
    return blocks, master, slave


def test_batched_matches_sequential(tmp_path):
    blocks, master, slave = _pipeline_graphs(tmp_path)
    parts = partition_blocks_by_paired_contigs(blocks)
    assert parts, "expected at least one partition"
    checked_edges = 0
    for ag_id, rows in enumerate(parts, start=1):
        ag = AssemblyGraph(blocks, rows, ag_id)
        cg_seq = CompactAssemblyGraph(ag)
        cg_seq.compute_edge_weights(master, None, slave, None,
                                    batched=False)
        cg_bat = CompactAssemblyGraph(ag)
        cg_bat.compute_edge_weights(master, None, slave, None,
                                    batched=True)
        for e in cg_seq.edges():
            ps, pb = cg_seq.prop[e], cg_bat.prop[e]
            assert ps["weight"] == pb["weight"], e
            assert ps["rnum"] == pb["rnum"], e
            assert ps["min_cov"] == pb["min_cov"], e
            checked_edges += 1
    assert checked_edges >= 2  # master edges across the junctions
