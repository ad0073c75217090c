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
                     shard: tuple[int, int] | None = None,
                     _allgather=None,
                     mesh=None,
                     defer_weights: bool = False,
                     ):
    """shard=(pid, nproc) enables the multi-host path: graph build and
    classification stay replicated (cheap, blocks-only), but each host
    decodes ONLY the BAM contig runs its owned graphs touch (deferred
    MultiBams + .gidx ranged decode), prepares and counts only its own
    edge-weight jobs, and one allgather of final edge props makes every
    host's graphs identical to the sequential run.  Ownership uses the
    same deterministic LPT assignment as distributed_build_pctgs, so
    the rows decoded here are exactly the rows the build phase needs."""
    pid, nproc = shard if shard else (0, 1)
    is_writer = pid == 0

    parts = partition_blocks_by_paired_contigs(blocks)

    # Per-component contig-graph dumps (PartitionFunctions.cc:281-291):
    # the reference writes these UNCONDITIONALLY (not gated by
    # --output-graphs) into ./gam_graphs/, silently skipping when the
    # directory does not exist (a failed ofstream writes nothing).
    if is_writer and os.path.isdir(graphs_dir):
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

    # Pass 1: build graphs, classify — no device work, no BAM rows.
    # Pass 2 runs ONE region_score.count_jobs dispatch over the
    # concatenated jobs of this host's graphs and hands each graph its
    # result slice.
    built: list[tuple] = []  # (ag, cg, suffix, part_idx)
    kept_idx: list[int] = []  # indices into `built` of non-cyclic graphs

    ag_id = 1
    for part_idx, rows in enumerate(parts):
        ag = AssemblyGraph(blocks, rows, ag_id)
        cg = CompactAssemblyGraph(ag)
        suffix = None
        try:
            ag.topological_sort_throwing()
            kept_idx.append(len(built))
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
        built.append((ag, cg, suffix, part_idx))
        ag_id += 1

    # ---- ownership + sharded ingestion ----
    if shard and nproc > 1:
        from ..parallel.distributed import shard_partitions

        mine_kept = set(shard_partitions([g.n for g in out], nproc, pid))
        owned = {kept_idx[k] for k in mine_kept}
        # cyclic graphs (not built later, but their weights appear in
        # the host-0 dot dumps) go round-robin
        cyc = [i for i in range(len(built)) if i not in set(kept_idx)]
        owned.update(i for k, i in enumerate(cyc) if k % nproc == pid)

        m_ctgs: set[int] = set()
        s_ctgs: set[int] = set()
        for i in owned:
            rows = parts[built[i][3]]
            m_ctgs.update(int(blocks.m_ctg[r]) for r in rows)
            s_ctgs.update(int(blocks.s_ctg[r]) for r in rows)
        for mb, ctgs in ((master_pe, m_ctgs), (master_mp, m_ctgs),
                         (slave_pe, s_ctgs), (slave_mp, s_ctgs)):
            if mb is not None:
                mb.load_ref_runs(_ctg_runs(ctgs))
    else:
        owned = set(range(len(built)))

    # ---- pass 2: edge weights for owned graphs, one dispatch ----
    all_jobs: list[dict] = []
    spans: dict[int, tuple[int, int]] = {}
    for i in owned:
        cg = built[i][1]
        if batched_weights:
            jobs = cg.prepare_edge_weights(master_pe, master_mp, slave_pe,
                                           slave_mp, no_mult_filter)
            spans[i] = (len(all_jobs), len(all_jobs) + len(jobs))
            all_jobs.extend(jobs)
        else:
            cg.compute_edge_weights(master_pe, master_mp, slave_pe,
                                    slave_mp, no_mult_filter,
                                    batched=False)

    fetch_weights = None
    if batched_weights:
        from ..ops import region_score as region_ops

        # dispatch NOW (async), fetch in the finisher: the caller can
        # overlap the device count + link round-trip with host work
        # (run_merge loads the contig FASTAs in between)
        fetch_weights = region_ops.count_jobs(all_jobs, mesh=mesh,
                                              defer=True)

    def finish_weights():
        if fetch_weights is not None:
            results = fetch_weights()
            for i, (lo, hi) in spans.items():
                built[i][1].apply_edge_weights(results[lo:hi])

        if shard and nproc > 1:
            # one allgather of final edge props fills non-owned graphs
            ag_fn = _allgather
            if ag_fn is None:
                from ..parallel.distributed import allgather_obj as ag_fn

            local_props = {
                i: [(p["weight"], p["rnum"], p["min_cov"])
                    for p in (built[i][1].prop[e]
                              for e in built[i][1].edges())]
                for i in owned}
            for part in ag_fn(local_props):
                for i, props in part.items():
                    if i in owned:
                        continue
                    cg = built[i][1]
                    for e, (w, r, mc) in zip(cg.edges(), props):
                        cg.prop[e]["weight"] = w
                        cg.prop[e]["rnum"] = r
                        cg.prop[e]["min_cov"] = mc

        if is_writer and output_graphs and os.path.isdir(graphs_dir):
            for gid, (ag, cg, suffix, _) in enumerate(built, start=1):
                _write_dot(ag, cg, graphs_dir, gid, suffix)

    if defer_weights:
        return out, stats, finish_weights
    finish_weights()
    return out, stats


def _ctg_runs(ctgs: set[int]) -> list[tuple[int, int]]:
    """Ascending disjoint [lo, hi) runs of consecutive contig ids."""
    if not ctgs:
        return []
    ids = sorted(ctgs)
    runs = [[ids[0], ids[0] + 1]]
    for c in ids[1:]:
        if c == runs[-1][1]:
            runs[-1][1] = c + 1
        else:
            runs.append([c, c + 1])
    return [(lo, hi) for lo, hi in runs]


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
