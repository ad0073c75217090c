"""Batched junction-evidence counting — graph edge weighting on device.

The reference weighs every compact-graph edge by re-opening BAM regions
and counting F-oriented paired reads whose mate should cross the
junction (getLibRegionScore, CompactAssemblyGraph.cc:361-530) — one
mutex-guarded BamReader scan per (edge, library).  Here every
(edge, library) job is a contiguous slice of the HBM-resident
coordinate-sorted alignment table; jobs are padded into (J, W) batches
and counted in ONE jitted elementwise-plus-reduction pass per shape
bucket.  graphs.compact prepares jobs and applies the reference's
sentinel/arbitration logic to the returned counts.
"""

from __future__ import annotations

import functools

import numpy as np

from ..io.bam import FMREVERSE, FMUNMAP, FPAIRED, FREVERSE

XT_U = ord("U")


@functools.lru_cache(maxsize=32)
def _count_kernel(J: int, W: int):
    import jax
    import jax.numpy as jnp

    def f(pos, end_pos, flag, nh, xt, ref_id, mate_ref, mate_pos, goodq,
          valid, s1, s2, t, max_insert, seq_len, no_mult):
        """All row arrays (J, W) int32; scalars (J,) int32.

        Returns (good_reads, exp_reads, num_reads) each (J,) int32 —
        the three accumulators of the reference's region loop.
        """
        s1 = s1[:, None]
        s2 = s2[:, None]
        t = t[:, None]
        max_insert = max_insert[:, None]
        seq_len = seq_len[:, None]
        no_mult = no_mult[:, None]

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
        return (jnp.sum(good_m, axis=1), jnp.sum(exp_m, axis=1),
                jnp.sum(num_m, axis=1))

    return jax.jit(f)


def count_jobs(jobs: list[dict]) -> list[tuple[int, int, int]]:
    """Count junction evidence for a list of jobs.

    Each job: dict with row-array views (pos, end_pos, flag, nh, xt,
    ref_id, mate_ref, mate_pos, goodq — np arrays of the region rows)
    and scalars (s1, s2, t, max_insert, seq_len, no_mult).
    Returns (good_reads, exp_reads, num_reads) per job, in order.
    """
    if not jobs:
        return []
    out: list = [None] * len(jobs)

    buckets: dict[int, list[int]] = {}
    for j, job in enumerate(jobs):
        w = max(8, 1 << int(np.ceil(np.log2(max(1, len(job["pos"]))))))
        buckets.setdefault(w, []).append(j)

    row_fields = ("pos", "end_pos", "flag", "nh", "xt", "ref_id",
                  "mate_ref", "mate_pos", "goodq")
    sca_fields = ("s1", "s2", "t", "max_insert", "seq_len", "no_mult")

    for w, idxs in buckets.items():
        jn = max(8, 1 << int(np.ceil(np.log2(len(idxs)))))
        arrs = {f: np.zeros((jn, w), np.int32) for f in row_fields}
        valid = np.zeros((jn, w), np.int32)
        scals = {f: np.zeros(jn, np.int32) for f in sca_fields}
        for k, j in enumerate(idxs):
            job = jobs[j]
            n = len(job["pos"])
            for f in row_fields:
                arrs[f][k, :n] = job[f]
            valid[k, :n] = 1
            for f in sca_fields:
                scals[f][k] = job[f]
        kern = _count_kernel(jn, w)
        good, exp, num = kern(
            arrs["pos"], arrs["end_pos"], arrs["flag"], arrs["nh"],
            arrs["xt"], arrs["ref_id"], arrs["mate_ref"],
            arrs["mate_pos"], arrs["goodq"], valid, scals["s1"],
            scals["s2"], scals["t"], scals["max_insert"],
            scals["seq_len"], scals["no_mult"])
        good = np.asarray(good)
        exp = np.asarray(exp)
        num = np.asarray(num)
        for k, j in enumerate(idxs):
            out[j] = (int(good[k]), int(exp[k]), int(num[k]))
    return out
