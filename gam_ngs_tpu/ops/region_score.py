"""Batched junction-evidence counting — graph edge weighting on device.

The reference weighs every compact-graph edge by re-opening BAM regions
and counting F-oriented paired reads whose mate should cross the
junction (getLibRegionScore, CompactAssemblyGraph.cc:361-530) — one
mutex-guarded BamReader scan per (edge, library).  Here every
(edge, library) job is a contiguous slice of the HBM-resident
coordinate-sorted alignment table; all jobs (across every compact graph
of the run) are concatenated into ONE flat row stream with a segment-id
vector and counted by a single jitted segment-sum dispatch returning
one stacked (3, J) array — one upload, one kernel, one download.  Row
and job counts are padded to powers of two so the whole pipeline
compiles O(log) distinct shapes.  graphs.compact prepares jobs and
applies the reference's sentinel/arbitration logic to the counts.
"""

from __future__ import annotations

import functools

import numpy as np

from ..io.bam import FMREVERSE, FMUNMAP, FPAIRED, FREVERSE

XT_U = ord("U")

_ROW_FIELDS = ("pos", "end_pos", "flag", "nh", "xt", "ref_id",
               "mate_ref", "mate_pos", "goodq")
_SCA_FIELDS = ("s1", "s2", "t", "max_insert", "seq_len", "no_mult")


@functools.lru_cache(maxsize=64)
def _count_kernel(R: int, J: int):
    import jax
    import jax.numpy as jnp

    def f(pos, end_pos, flag, nh, xt, ref_id, mate_ref, mate_pos, goodq,
          valid, seg, s1, s2, t, max_insert, seq_len, no_mult):
        """Row arrays (R,) int32; seg (R,) int32 job ids; scalars (J,).

        Returns (3, J) int32 — good_reads, exp_reads, num_reads: the
        three accumulators of the reference's region loop, segment-
        summed per job.
        """
        s1 = s1[seg]
        s2 = s2[seg]
        t = t[seg]
        max_insert = max_insert[seg]
        seq_len = seq_len[seg]
        no_mult = no_mult[seg]

        rl = end_pos - pos
        end_read = pos + rl - 1
        end_mate = mate_pos + rl - 1

        paired = (flag & FPAIRED) != 0
        fwd = (flag & FREVERSE) == 0
        munmap = (flag & FMUNMAP) != 0
        mrev = (flag & FMREVERSE) != 0
        uniq = (no_mult != 0) | ((nh == 1) & (xt == XT_U))
        in_range = (pos >= s1) & (pos <= s2)

        base = (valid != 0) & (goodq != 0) & paired & uniq & in_range & fwd
        read_overlap = jnp.where(end_read > s2, s2 - pos + 1, rl)

        diff_ref = ref_id != mate_ref
        mate_crosses = end_mate >= t

        c1 = base & munmap
        c2 = base & ~munmap & diff_ref
        c2_exp = c2 & (pos + max_insert < seq_len)
        c3 = base & ~munmap & ~diff_ref & ~mrev & mate_crosses
        c4 = base & ~munmap & ~diff_ref & mrev & mate_crosses

        ov = read_overlap
        exp_m = jnp.where(c1 | c2_exp | c3 | c4, ov, 0)
        good_m = jnp.where(c4, ov, 0)
        num_m = jnp.where(c1 | c2 | c3 | c4, 1, 0)
        return jnp.stack([
            jax.ops.segment_sum(good_m, seg, num_segments=J),
            jax.ops.segment_sum(exp_m, seg, num_segments=J),
            jax.ops.segment_sum(num_m, seg, num_segments=J),
        ])

    return jax.jit(f)


def _pow2(n: int, floor: int) -> int:
    return max(floor, 1 << int(np.ceil(np.log2(max(1, n)))))


def count_jobs(jobs: list[dict]) -> list[tuple[int, int, int]]:
    """Count junction evidence for a list of jobs in ONE device pass.

    Each job: dict with row-array views (pos, end_pos, flag, nh, xt,
    ref_id, mate_ref, mate_pos, goodq — np arrays of the region rows)
    and scalars (s1, s2, t, max_insert, seq_len, no_mult).
    Returns (good_reads, exp_reads, num_reads) per job, in order.
    """
    if not jobs:
        return []

    lens = np.array([len(j["pos"]) for j in jobs], np.int64)
    total = int(lens.sum())
    R = _pow2(total, 512)
    J = _pow2(len(jobs), 8)

    rows = {f: np.zeros(R, np.int32) for f in _ROW_FIELDS}
    valid = np.zeros(R, np.int32)
    seg = np.zeros(R, np.int32)
    scals = {f: np.zeros(J, np.int32) for f in _SCA_FIELDS}

    off = 0
    for k, job in enumerate(jobs):
        n = int(lens[k])
        for f in _ROW_FIELDS:
            rows[f][off:off + n] = job[f]
        valid[off:off + n] = 1
        seg[off:off + n] = k
        off += n
        for f in _SCA_FIELDS:
            scals[f][k] = job[f]
    # padding rows keep seg=0 with valid=0: masked out of every sum

    kern = _count_kernel(R, J)
    out = np.asarray(kern(
        rows["pos"], rows["end_pos"], rows["flag"], rows["nh"],
        rows["xt"], rows["ref_id"], rows["mate_ref"], rows["mate_pos"],
        rows["goodq"], valid, seg, scals["s1"], scals["s2"], scals["t"],
        scals["max_insert"], scals["seq_len"], scals["no_mult"]))
    return [(int(out[0, k]), int(out[1, k]), int(out[2, k]))
            for k in range(len(jobs))]
