"""Per-graph merge pipeline + single-contig pctg generation.

Reference: buildPctg (/root/reference/lib/src/pctg/BuildPctgFunctions.cc:41)
and generateSingleCtgPctgs (:111).  Processing order is the reference's
sequential (--threads 1) order, which is the canonical output order; the
batched device scheduler preserves it by construction.
"""

from __future__ import annotations

from ..core.multibam import MultiBam
from ..core.refseq import RefSequence
from ..graphs.compact import CompactAssemblyGraph
from ..ops.bsw_ref import bsw_align
from .align import align_merge_block
from .forks import solve_forks
from .paths import get_merge_paths
from .pctg import CtgInPctg, PairedContig
from .weave import (
    PctgWeaver,
    split_merge_blocks_by_align,
    split_merge_blocks_by_direction,
    split_merge_blocks_by_inclusions,
    sort_merge_blocks_by_direction,
)


def build_pctg(graph: CompactAssemblyGraph, master_ref: RefSequence,
               slave_ref: RefSequence, master_bam: MultiBam | None,
               slave_bam: MultiBam | None, pctg_list: list[PairedContig],
               aligner=bsw_align, no_mult_filter: bool = False,
               debug: bool = False, log=None) -> None:
    ok, mbv = solve_forks(graph, debug, log)
    if not ok:
        return

    roots = [v for v in range(graph.n) if graph.in_degree(v) == 0]
    merge_lists: list[list] = []
    while roots:
        rv = roots.pop()
        merge_lists.insert(0, [])
        get_merge_paths(graph, rv, mbv, merge_lists, debug, log)

    for ml in merge_lists:
        for mb in ml:
            align_merge_block(graph, mb, master_ref, slave_ref, aligner)

    merge_lists = split_merge_blocks_by_align(merge_lists)
    merge_lists = split_merge_blocks_by_direction(merge_lists)
    sort_merge_blocks_by_direction(merge_lists)
    merge_lists = split_merge_blocks_by_inclusions(merge_lists, master_ref,
                                                   slave_ref)

    weaver = PctgWeaver(master_ref, slave_ref, master_bam, slave_bam,
                        no_mult_filter)
    for ml in merge_lists:
        if len(ml) == 0:
            continue
        weaver.build_pctgs(pctg_list, ml)


def generate_single_ctg_pctgs(pctg_list: list[PairedContig],
                              ctg_ids: list[int], master_ref: RefSequence,
                              next_id: int) -> int:
    """Wrap unmerged master contigs as single-contig pctgs (:111)."""
    for cid in ctg_ids:
        seq = master_ref[cid].seq
        if seq is None or len(seq) == 0:
            continue
        p = PairedContig(pctg_id=next_id)
        p.master_ids.add(cid)
        p.parts.append(seq)
        p.merge_list.append(CtgInPctg(cid, 0, len(seq) - 1, False, True))
        pctg_list.append(p)
        next_id += 1
    return next_id
