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


# Row cap per dispatch: bounds the int32 cumsum (cap * max-overlap
# 2^21 * ~2^9 < 2^31) and keeps every compiled shape small.
ROW_CAP = 1 << 21


@functools.lru_cache(maxsize=64)
def _count_kernel(R: int, J: int):
    import jax
    import jax.numpy as jnp

    def f(pos, end_pos, flag, nh, xt, ref_id, mate_ref, mate_pos, goodq,
          valid, seg, starts, ends, s1, s2, t, max_insert, seq_len,
          no_mult):
        """Row arrays (R,) int32, sorted by job; seg (R,) int32 job ids;
        starts/ends (J,) row offsets of each job; scalars (J,).

        Returns (3, J) int32 — good_reads, exp_reads, num_reads: the
        three accumulators of the reference's region loop.  Jobs are
        contiguous row runs, so the segment reduction is an exclusive
        cumsum sampled at run boundaries — no scatter, compiles to a
        plain scan + two tiny gathers.
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

        def jsum(v):
            c = jnp.concatenate([jnp.zeros(1, v.dtype), jnp.cumsum(v)])
            return c[ends] - c[starts]

        return jnp.stack([jsum(good_m), jsum(exp_m), jsum(num_m)])

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

    lens = [len(j["pos"]) for j in jobs]
    out: list = []
    # chunk at job boundaries so each dispatch stays under ROW_CAP
    chunk: list[int] = []
    chunk_rows = 0
    chunks: list[list[int]] = []
    for k, n in enumerate(lens):
        if chunk and chunk_rows + n > ROW_CAP:
            chunks.append(chunk)
            chunk, chunk_rows = [], 0
        chunk.append(k)
        chunk_rows += n
    if chunk:
        chunks.append(chunk)

    results: list = [None] * len(jobs)
    for idxs in chunks:
        # a single oversized job (> ROW_CAP rows) still runs alone in
        # its own chunk; junction regions are insert-sized so this
        # stays far from the int32 bound in practice
        total = sum(lens[k] for k in idxs)
        R = _pow2(total, 512)
        J = _pow2(len(idxs), 8)

        rows = {f: np.zeros(R, np.int32) for f in _ROW_FIELDS}
        valid = np.zeros(R, np.int32)
        seg = np.zeros(R, np.int32)
        starts = np.zeros(J, np.int32)
        ends = np.zeros(J, np.int32)
        scals = {f: np.zeros(J, np.int32) for f in _SCA_FIELDS}

        off = 0
        for j, k in enumerate(idxs):
            job = jobs[k]
            n = lens[k]
            for f in _ROW_FIELDS:
                rows[f][off:off + n] = job[f]
            valid[off:off + n] = 1
            seg[off:off + n] = j
            starts[j] = off
            ends[j] = off + n
            off += n
            for f in _SCA_FIELDS:
                scals[f][j] = job[f]
        # padding rows keep seg=0 with valid=0: masked out of every sum
        # and outside every [start, end) run

        kern = _count_kernel(R, J)
        res = np.asarray(kern(
            rows["pos"], rows["end_pos"], rows["flag"], rows["nh"],
            rows["xt"], rows["ref_id"], rows["mate_ref"],
            rows["mate_pos"], rows["goodq"], valid, seg, starts, ends,
            scals["s1"], scals["s2"], scals["t"], scals["max_insert"],
            scals["seq_len"], scals["no_mult"]))
        for j, k in enumerate(idxs):
            results[k] = (int(res[0, j]), int(res[1, j]), int(res[2, j]))
    out = results
    return out
