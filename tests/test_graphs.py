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

    def test_long_path_graph_no_stack_overflow(self):
        # 10k-vertex chain master0-slave0-master1-slave1-...: the
        # iterative DFS must complete where a recursive one would
        # exhaust the interpreter's native stack (recursion-limit
        # raises don't grow the C stack).
        n = 5000  # masters == slaves == 5000 -> 10k vertices
        rows = []
        for k in range(n):
            rows.append(mk_block(10, k, 0, 99, k, 0, 99, "+"))
            if k + 1 < n:
                rows.append(mk_block(10, k + 1, 0, 99, k, 200, 299, "-"))
        blocks = bt(*rows)
        m, s = strand.compute_relative_strand_map(
            blocks, list(range(len(rows))))
        assert len(m) == n and len(s) == n
        # alternating '-' edges flip orientation every master step
        assert m[0] == 1.0 and s[0] == 1.0
        assert m[1] == 0.0 and s[1] == 0.0
        assert m[2] == 1.0

    def test_iterative_matches_recursive_reference(self):
        # The explicit-stack DFS must reproduce the recursive
        # extendPathFrom semantics exactly (including the sibling
        # min-evidence leak and push-front order) on dense random
        # graphs with cycles and the MAX_PTP_LIST_SIZE cap active.
        rng = np.random.default_rng(42)
        for trial in range(5):
            nm, ns = 6, 6
            rows = []
            for _ in range(18):
                mc = int(rng.integers(0, nm))
                sc = int(rng.integers(0, ns))
                st = "+" if rng.random() < 0.5 else "-"
                nr = int(rng.integers(1, 50))
                rows.append(mk_block(nr, mc, 0, 99, sc, 0, 99, st))
            blocks = bt(*rows)
            got_m, got_s = strand.compute_relative_strand_map(
                blocks, list(range(len(rows))))
            want_m, want_s = _recursive_strand_map(blocks,
                                                   list(range(len(rows))))
            assert got_m == want_m, f"trial {trial} master maps differ"
            assert got_s == want_s, f"trial {trial} slave maps differ"


def _recursive_strand_map(blocks, rows):
    """The pre-round-3 recursive formulation (RelativeStrand.cc:87
    verbatim), kept as the semantic oracle for the iterative DFS."""
    g = paired.PairedContigGraph(blocks, rows)
    pos, neg = {}, {}
    for r in rows:
        u = g.master_map[int(blocks.m_ctg[r])]
        v = g.slave_map[int(blocks.s_ctg[r])]
        key = (u, v)
        pos.setdefault(key, 0)
        neg.setdefault(key, 0)
        if blocks.m_strand[r] == blocks.s_strand[r]:
            pos[key] += int(blocks.num_reads[r])
        else:
            neg[key] += int(blocks.num_reads[r])

    def edge(u, v):
        return (u, v) if (u, v) in pos else (v, u)

    master_out, slave_out = {}, {}
    if g.n == 0:
        return master_out, slave_out
    if g.n == 1:
        if 0 < g.first_slave_vertex:
            master_out[g.vertex_to_ctg[0]] = 1.0
        else:
            slave_out[g.vertex_to_ctg[0]] = 1.0
        return master_out, slave_out

    path_lists = {}
    color = [0] * g.n

    def compose(p, key):
        e = pos[key] + neg[key]
        return p * (pos[key] / e) + (1 - p) * (neg[key] / e)

    def extend_from(node, path_prob, min_evid):
        color[node] = 1
        for v in g.neighbors(node):
            if color[v] == 0:
                key = edge(node, v)
                new_prob = compose(path_prob, key)
                min_evid = min(min_evid, pos[key] + neg[key])
                lst = path_lists.setdefault(v, [])
                if len(lst) < strand.MAX_PTP_LIST_SIZE:
                    lst.insert(0, (min_evid, new_prob))
                    extend_from(v, new_prob, min_evid)
        color[node] = 0

    root = 0
    path_lists[root] = [(1, 1.0)]
    color[root] = 1
    for v in g.neighbors(root):
        if color[v] == 0:
            key = edge(root, v)
            new_prob = compose(1.0, key)
            evid = pos[key] + neg[key]
            path_lists.setdefault(v, []).insert(0, (evid, new_prob))
            extend_from(v, new_prob, evid)
    color[root] = 0

    for node, lst in path_lists.items():
        vp = sum(p * float(e) for e, p in lst)
        te = sum(e for e, _ in lst)
        vp = min(1.0, max(0.0, vp / float(te)))
        if node < g.first_slave_vertex:
            master_out[g.vertex_to_ctg[node]] = vp
        else:
            slave_out[g.vertex_to_ctg[node]] = vp
    return master_out, slave_out


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
