"""Graph layer tests: partitioning, strand inference, assembly/compact graphs."""

import numpy as np

from gam_ngs_tpu.io.blocks_io import BlockTable
from gam_ngs_tpu.graphs import paired, strand
from gam_ngs_tpu.graphs.assembly import (
    AssemblyGraph, MASTER_EDGE, SLAVE_EDGE, BOTH_EDGE, NotADag)
from gam_ngs_tpu.graphs.compact import CompactAssemblyGraph


def mk_block(num, mctg, mbeg, mend, sctg, sbeg, send, sstrand="+"):
    return (num, mctg, ord("+"), mbeg, mend, 100, 200,
            sctg, ord(sstrand), sbeg, send, 100, 200)


def bt(*rows):
    return BlockTable.from_rows(list(rows))


class TestPaired:
    def test_vertex_numbering_and_components(self):
        blocks = bt(
            mk_block(5, 2, 0, 99, 7, 0, 99),
            mk_block(5, 0, 0, 99, 9, 0, 99),
            mk_block(5, 2, 200, 299, 9, 200, 299),
            mk_block(5, 4, 0, 99, 8, 0, 99),
        )
        g = paired.PairedContigGraph(blocks)
        # masters sorted: 0,2,4 -> vertices 0,1,2; slaves 7,8,9 -> 3,4,5
        assert g.vertex_to_ctg == [0, 2, 4, 7, 8, 9]
        assert g.first_slave_vertex == 3
        parts = paired.partition_blocks_by_paired_contigs(blocks)
        # component of vertex 0 (master 0): blocks 1, 2, 0 connected via
        # slave 9 and master 2; master 4+slave 8 separate
        assert sorted(map(len, parts)) == [1, 3]
        big = max(parts, key=len)
        assert big == [0, 1, 2]  # original order preserved

    def test_single_link(self):
        blocks = bt(
            mk_block(5, 0, 0, 99, 7, 0, 99),
            mk_block(5, 0, 200, 299, 8, 0, 99),
            mk_block(5, 1, 0, 99, 7, 200, 299),
        )
        sl = paired.get_single_link_blocks(blocks)
        # master 0 degree 2; slave 7 degree 2; slave 8 degree 1; master 1 degree 1
        assert sl == {(0, 8), (1, 7)}


class TestStrand:
    def test_two_vertices_positive(self):
        blocks = bt(mk_block(10, 0, 0, 99, 5, 0, 99, "+"))
        m, s = strand.compute_relative_strand_map(blocks, [0])
        assert m[0] == 1.0
        assert s[5] == 1.0
        assert strand.strand_char(s[5]) == "+"

    def test_two_vertices_negative(self):
        blocks = bt(mk_block(10, 0, 0, 99, 5, 0, 99, "-"))
        m, s = strand.compute_relative_strand_map(blocks, [0])
        assert m[0] == 1.0
        assert s[5] == 0.0
        assert strand.strand_char(s[5]) == "-"

    def test_chain_propagation(self):
        # master0 -(+)- slave5 -(-)- master1 : master1 should be reversed
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 0, 99, "+"),
            mk_block(10, 1, 0, 99, 5, 200, 299, "-"),
        )
        m, s = strand.compute_relative_strand_map(blocks, [0, 1])
        assert m[0] == 1.0 and s[5] == 1.0
        assert m[1] == 0.0
        assert strand.strand_char(m[1]) == "-"

    def test_mixed_evidence(self):
        blocks = bt(
            mk_block(30, 0, 0, 99, 5, 0, 99, "+"),
            mk_block(10, 0, 200, 299, 5, 200, 299, "-"),
        )
        m, s = strand.compute_relative_strand_map(blocks, [0, 1])
        assert s[5] == 0.75


class TestAssemblyGraph:
    def test_linear_chain_both_edges(self):
        # two blocks, successive on both contigs -> single BOTH edge 0->1
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 0, 99),
            mk_block(10, 0, 200, 299, 5, 200, 299),
        )
        ag = AssemblyGraph(blocks, [0, 1])
        assert ag.edges() == [(0, 1)]
        assert ag.prop[(0, 1)]["kind"] == BOTH_EDGE
        assert not ag.has_forks()
        assert not ag.has_bubbles()
        ag.topological_sort_throwing()

    def test_reversed_slave_flips_direction(self):
        # slave reversed: slave ordering gives opposite edge, still BOTH
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 200, 299, "-"),
            mk_block(10, 0, 200, 299, 5, 0, 99, "-"),
        )
        ag = AssemblyGraph(blocks, [0, 1])
        assert ag.edges() == [(0, 1)]
        assert ag.prop[(0, 1)]["kind"] == BOTH_EDGE

    def test_master_only_edge(self):
        # blocks share master contig only
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 0, 99),
            mk_block(10, 0, 200, 299, 6, 0, 99),
        )
        ag = AssemblyGraph(blocks, [0, 1])
        assert ag.prop[(0, 1)]["kind"] == MASTER_EDGE

    def test_fork(self):
        # master chain 0->1 and 0->2 via two different slaves
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 0, 99),
            mk_block(10, 0, 200, 299, 6, 0, 99),
            mk_block(10, 1, 0, 99, 6, 200, 299),
        )
        ag = AssemblyGraph(blocks, [0, 1, 2])
        assert ag.prop[(0, 1)]["kind"] == MASTER_EDGE
        assert ag.prop[(1, 2)]["kind"] == SLAVE_EDGE
        assert not ag.has_forks()

    def test_cycle_detection(self):
        # construct a cyclic configuration: master order 0<1, slave order 1<0
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 200, 299, "+"),
            mk_block(10, 0, 200, 299, 5, 0, 99, "+"),
        )
        ag = AssemblyGraph(blocks, [0, 1])
        # master edge 0->1, slave edge 1->0: cycle
        try:
            ag.topological_sort_throwing()
            cyclic = False
        except NotADag:
            cyclic = True
        assert cyclic


class TestCompactGraph:
    def test_chain_collapse(self):
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 0, 99),
            mk_block(10, 0, 200, 299, 5, 200, 299),
            mk_block(10, 0, 400, 499, 5, 400, 499),
        )
        ag = AssemblyGraph(blocks, [0, 1, 2])
        cg = CompactAssemblyGraph(ag)
        assert cg.n == 1
        assert cg.vertex_rows == [[0, 1, 2]]
        assert cg.edges() == []

    def test_mixed_chain(self):
        # 0-1 BOTH, then 1-2 master-only (different slave)
        blocks = bt(
            mk_block(10, 0, 0, 99, 5, 0, 99),
            mk_block(10, 0, 200, 299, 5, 200, 299),
            mk_block(10, 0, 400, 499, 6, 0, 99),
        )
        ag = AssemblyGraph(blocks, [0, 1, 2])
        cg = CompactAssemblyGraph(ag)
        assert cg.n == 2
        assert cg.vertex_rows == [[0, 1], [2]]
        assert cg.prop[(0, 1)]["kind"] == MASTER_EDGE
