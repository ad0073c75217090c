"""Block partitioning driver — partitionBlocks equivalent.

Reference: /root/reference/lib/src/PartitionFunctions.cc:65-170.
Partitions blocks by contig-pair connected components, builds the
Assembly/Compact graphs, computes edge weights, classifies each graph
(linear / forks / bubbles / cyclic) and DROPS cyclic ones.  Returns the
kept compact graphs (in partition order) plus the .stats counters.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..core.multibam import MultiBam
from ..io.blocks_io import BlockTable
from .assembly import AssemblyGraph, NotADag
from .compact import CompactAssemblyGraph
from .paired import partition_blocks_by_paired_contigs


@dataclass
class GraphStats:
    linears: int = 0
    forks: int = 0
    bubbles: int = 0
    cyclics: int = 0

    def stats_text(self) -> str:
        """The `.stats` block ([graphs stats], PartitionFunctions.cc:162)."""
        return (f"[graphs stats]\nLinears = {self.linears}\n"
                f"Forks = {self.forks}\nBubbles = {self.bubbles}\n"
                f"Cyclics = {self.cyclics}\n\n")


def partition_blocks(blocks: BlockTable, master_pe: MultiBam,
                     master_mp: MultiBam | None, slave_pe: MultiBam,
                     slave_mp: MultiBam | None, no_mult_filter: bool = False,
                     output_graphs: bool = False, graphs_dir: str = "./gam_graphs",
                     batched_weights: bool = True,
                     ) -> tuple[list[CompactAssemblyGraph], GraphStats]:
    parts = partition_blocks_by_paired_contigs(blocks)

    # Per-component contig-graph dumps (PartitionFunctions.cc:281-291):
    # the reference writes these UNCONDITIONALLY (not gated by
    # --output-graphs) into ./gam_graphs/, silently skipping when the
    # directory does not exist (a failed ofstream writes nothing).
    if os.path.isdir(graphs_dir):
        from .paired import PairedContigGraph

        for i, rows in enumerate(parts):
            try:
                with open(os.path.join(graphs_dir,
                                       f"ContigGraph_{i}.dot"), "w") as fh:
                    PairedContigGraph(blocks, rows).write_graphviz(fh)
            except OSError:
                pass

    stats = GraphStats()
    out: list[CompactAssemblyGraph] = []

    # Pass 1: build graphs, classify, and plan every edge-weight job —
    # no device work.  Pass 2 runs ONE region_score.count_jobs dispatch
    # over the concatenated jobs of all graphs (a single upload/kernel/
    # download instead of per-graph, per-shape round-trips) and hands
    # each graph its result slice.
    built: list[tuple] = []  # (ag, cg, suffix, job_lo, job_hi)
    all_jobs: list[dict] = []

    ag_id = 1
    for rows in parts:
        ag = AssemblyGraph(blocks, rows, ag_id)
        cg = CompactAssemblyGraph(ag)
        if batched_weights:
            jobs = cg.prepare_edge_weights(master_pe, master_mp, slave_pe,
                                           slave_mp, no_mult_filter)
            lo, hi = len(all_jobs), len(all_jobs) + len(jobs)
            all_jobs.extend(jobs)
        else:
            cg.compute_edge_weights(master_pe, master_mp, slave_pe,
                                    slave_mp, no_mult_filter,
                                    batched=False)
            lo = hi = 0
        suffix = None
        try:
            ag.topological_sort_throwing()
            out.append(cg)
            has_bubbles = ag.has_bubbles()
            has_forks = ag.has_forks()
            if has_bubbles:
                stats.bubbles += 1
                suffix = "bubbles"
            elif has_forks:
                stats.forks += 1
                suffix = "forks"
            else:
                stats.linears += 1
                suffix = "linear"
        except NotADag:
            stats.cyclics += 1
            suffix = "cyclic"
        built.append((ag, cg, suffix, lo, hi))
        ag_id += 1

    if batched_weights:
        from ..ops import region_score as region_ops

        results = region_ops.count_jobs(all_jobs)
        for _, cg, _, lo, hi in built:
            cg.apply_edge_weights(results[lo:hi])

    if output_graphs and os.path.isdir(graphs_dir):
        for gid, (ag, cg, suffix, _, _) in enumerate(built, start=1):
            _write_dot(ag, cg, graphs_dir, gid, suffix)

    return out, stats


def _write_dot(ag: AssemblyGraph, cg: CompactAssemblyGraph, graphs_dir: str,
               ag_id: int, suffix: str) -> None:
    from ..utils.cppfmt import cpp_double

    kinds = {0: "black", 1: "red", 2: "green"}
    p1 = os.path.join(graphs_dir, f"AssemblyGraph_{ag_id}_{suffix}.dot")
    if not os.path.exists(p1):
        with open(p1, "w") as fh:
            fh.write("digraph AssemblyGraph {\n   rankdir=LR;\n")
            for v in range(ag.n):
                fh.write(f"   {v};\n")
            for (u, v) in ag.edges():
                prop = ag.prop[(u, v)]
                fh.write(f"   {u}->{v}[color={kinds[prop['kind']]}, "
                         f"label=\"{cpp_double(prop['weight'])}\"];\n")
            fh.write("}\n")
    p2 = os.path.join(graphs_dir, f"CompactGraph_{ag_id}_{suffix}.dot")
    if not os.path.exists(p2):
        with open(p2, "w") as fh:
            fh.write("digraph CompactAssemblyGraph {\n   rankdir=LR;\n")
            for v in range(cg.n):
                fh.write(f"   {v};\n")
            for (u, v) in cg.edges():
                prop = cg.prop[(u, v)]
                fh.write(f"   {u}->{v}[color={kinds[prop['kind']]}, "
                         f"label=\"{cpp_double(prop['weight'])}/{prop['rnum']}\"];\n")
            fh.write("}\n")
