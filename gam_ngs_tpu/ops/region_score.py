"""Batched junction-evidence counting — graph edge weighting on device.

The reference weighs every compact-graph edge by re-opening BAM regions
and counting F-oriented paired reads whose mate should cross the
junction (getLibRegionScore, CompactAssemblyGraph.cc:361-530) — one
mutex-guarded BamReader scan per (edge, library).  Here every
(edge, library) job is a contiguous slice of the HBM-resident
coordinate-sorted alignment table; all jobs (across every compact graph
of the run) are concatenated into ONE flat row stream and counted by a
single jitted dispatch returning one stacked (3, J) array — one
upload, one kernel, one download.

TPU-shape notes: rows are laid out (R/LANES, LANES) — large 1-D
tensors are a TPU-compiler worst case (a (512K,) cumsum took ~10 min
to compile remotely; the 2-D form compiles in seconds).  Jobs are
contiguous row runs, so the segment reduction is a per-row cumsum, an
exclusive cumsum of row totals, and two J-sized gathers — no scatter.
Job scalars are expanded to per-row arrays on the host (cheap numpy
broadcasts) instead of a device gather.  Row and job counts pad to
powers of two so the whole pipeline compiles O(log) distinct shapes.
"""

from __future__ import annotations

import functools

import numpy as np

from ..io.bam import FMREVERSE, FMUNMAP, FPAIRED, FREVERSE

XT_U = ord("U")

_ROW_FIELDS = ("pos", "end_pos", "flag", "nh", "xt", "ref_id",
               "mate_ref", "mate_pos", "goodq")
_ROW_DTYPES = {"flag": np.uint16, "nh": np.uint16, "xt": np.uint8,
               "goodq": np.uint8}
_SCA_FIELDS = ("s1", "s2", "t", "max_insert", "seq_len", "no_mult")

LANES = 512

# Row cap per dispatch: bounds the int32 cumsum (cap * max-overlap
# 2^21 * ~2^9 < 2^31) and keeps every compiled shape small.
ROW_CAP = 1 << 21

# Hard bound on the int32 overlap cumsum within one dispatch: the
# summed overlap `ov` equals the FULL read length when a read ends
# inside the region, so long-read BAMs (10kb+ records) could overflow
# the row cap's short-read assumption.  Chunks are split when the
# host-side worst-case sum of read lengths exceeds this; a single job
# beyond it is counted exactly on the host instead.
OV_CAP = 1 << 30


@functools.lru_cache(maxsize=64)
def _count_kernel(R: int, J: int):
    import jax
    import jax.numpy as jnp

    assert R % LANES == 0
    R2 = R // LANES

    def f(pos, end_pos, flag, nh, xt, ref_id, mate_ref, mate_pos, goodq,
          valid, s1, s2, t, max_insert, seq_len, no_mult, starts, ends):
        """All row arrays (R2, LANES), flat row k at [k // LANES,
        k % LANES]; starts/ends (J,) int32 flat row offsets per job.
        Narrow fields (flag/nh uint16, xt/goodq/no_mult/valid uint8)
        upload at their wire width — the payload is the dominant cost
        of the partition phase on thin host->device links — and are
        widened here.

        Returns (3, J) int32 — good_reads, exp_reads, num_reads: the
        three accumulators of the reference's region loop.
        """
        flag = flag.astype(jnp.int32)
        nh = nh.astype(jnp.int32)
        xt = xt.astype(jnp.int32)
        goodq = goodq.astype(jnp.int32)
        no_mult = no_mult.astype(jnp.int32)
        valid = valid.astype(jnp.int32)
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

        def jsum(v2):
            cr = jnp.cumsum(v2, axis=1)          # within-row inclusive
            row_tot = cr[:, -1]
            offs = jnp.cumsum(row_tot) - row_tot  # (R2,) exclusive
            c2d = cr + offs[:, None]              # global inclusive csum

            def at(idx):  # global inclusive csum at flat idx-1 (0 if 0)
                i = (idx - 1) // LANES
                j = (idx - 1) % LANES
                return jnp.where(idx > 0, c2d[i, j], 0)

            return at(ends) - at(starts)

        return jnp.stack([jsum(good_m), jsum(exp_m), jsum(num_m)])

    return jax.jit(f)


def _pow2(n: int, floor: int) -> int:
    return max(floor, 1 << int(np.ceil(np.log2(max(1, n)))))


def _count_job_host(job: dict) -> tuple[int, int, int]:
    """Exact int64 host replica of the device kernel for one job —
    the overflow escape hatch for jobs whose Σ read lengths alone
    would exceed the int32 cumsum bound."""
    pos = np.asarray(job["pos"], np.int64)
    end_pos = np.asarray(job["end_pos"], np.int64)
    flag = np.asarray(job["flag"], np.int64)
    nh = np.asarray(job["nh"], np.int64)
    xt = np.asarray(job["xt"], np.int64)
    ref_id = np.asarray(job["ref_id"], np.int64)
    mate_ref = np.asarray(job["mate_ref"], np.int64)
    mate_pos = np.asarray(job["mate_pos"], np.int64)
    goodq = np.asarray(job["goodq"], bool)

    rl = end_pos - pos
    end_read = pos + rl - 1
    end_mate = mate_pos + rl - 1
    paired = (flag & FPAIRED) != 0
    fwd = (flag & FREVERSE) == 0
    munmap = (flag & FMUNMAP) != 0
    mrev = (flag & FMREVERSE) != 0
    uniq = bool(job["no_mult"]) | ((nh == 1) & (xt == XT_U))
    in_range = (pos >= job["s1"]) & (pos <= job["s2"])

    base = goodq & paired & uniq & in_range & fwd
    ov = np.where(end_read > job["s2"], job["s2"] - pos + 1, rl)

    diff_ref = ref_id != mate_ref
    mate_crosses = end_mate >= job["t"]
    c1 = base & munmap
    c2 = base & ~munmap & diff_ref
    c2_exp = c2 & (pos + job["max_insert"] < job["seq_len"])
    c3 = base & ~munmap & ~diff_ref & ~mrev & mate_crosses
    c4 = base & ~munmap & ~diff_ref & mrev & mate_crosses

    good = int(ov[c4].sum())
    exp = int(ov[c1 | c2_exp | c3 | c4].sum())
    num = int((c1 | c2 | c3 | c4).sum())
    return good, exp, num


def count_jobs(jobs: list[dict]) -> list[tuple[int, int, int]]:
    """Count junction evidence for a list of jobs in ONE device pass
    (per ROW_CAP chunk).

    Each job: dict with row-array views (pos, end_pos, flag, nh, xt,
    ref_id, mate_ref, mate_pos, goodq — np arrays of the region rows)
    and scalars (s1, s2, t, max_insert, seq_len, no_mult).
    Returns (good_reads, exp_reads, num_reads) per job, in order.
    """
    if not jobs:
        return []

    lens = [len(j["pos"]) for j in jobs]
    # worst-case int32 cumsum contribution per job = Σ read lengths
    # (ov <= rl); used to split chunks before the kernel can overflow
    weights = [
        int(np.clip(np.asarray(j["end_pos"], np.int64)
                    - np.asarray(j["pos"], np.int64), 0, None).sum())
        for j in jobs]

    results: list = [None] * len(jobs)

    # chunk at job boundaries so each dispatch stays under ROW_CAP and
    # OV_CAP; a job that alone exceeds OV_CAP is counted on the host
    # (exact int64 numpy — junction regions are insert-sized, so this
    # path only triggers on extreme long-read coverage)
    chunk: list[int] = []
    chunk_rows = 0
    chunk_w = 0
    chunks: list[list[int]] = []
    for k, n in enumerate(lens):
        if weights[k] > OV_CAP:
            results[k] = _count_job_host(jobs[k])
            continue
        if chunk and (chunk_rows + n > ROW_CAP
                      or chunk_w + weights[k] > OV_CAP):
            chunks.append(chunk)
            chunk, chunk_rows, chunk_w = [], 0, 0
        chunk.append(k)
        chunk_rows += n
        chunk_w += weights[k]
    if chunk:
        chunks.append(chunk)
    for idxs in chunks:
        total = sum(lens[k] for k in idxs)
        R = _pow2(total, LANES)
        J = _pow2(len(idxs), 8)

        flat = {f: np.zeros(R, _ROW_DTYPES.get(f, np.int32))
                for f in _ROW_FIELDS}
        valid = np.zeros(R, np.uint8)
        sca_rows = {f: np.zeros(R, np.uint8 if f == "no_mult"
                                else np.int32) for f in _SCA_FIELDS}
        starts = np.zeros(J, np.int32)
        ends = np.zeros(J, np.int32)

        off = 0
        for j, k in enumerate(idxs):
            job = jobs[k]
            n = lens[k]
            for f in _ROW_FIELDS:
                v = job[f]
                if f == "nh":
                    # uint16 wire width: clip so oversized NH tags
                    # cannot wrap onto the ==1 uniqueness test
                    v = np.clip(v, 0, 65535)
                flat[f][off:off + n] = v
            valid[off:off + n] = 1
            for f in _SCA_FIELDS:
                sca_rows[f][off:off + n] = job[f]
            starts[j] = off
            ends[j] = off + n
            off += n
        # padding rows have valid=0: masked out of every count and
        # outside every [start, end) run

        def two_d(a):
            return a.reshape(R // LANES, LANES)

        kern = _count_kernel(R, J)
        res = np.asarray(kern(
            two_d(flat["pos"]), two_d(flat["end_pos"]),
            two_d(flat["flag"]), two_d(flat["nh"]), two_d(flat["xt"]),
            two_d(flat["ref_id"]), two_d(flat["mate_ref"]),
            two_d(flat["mate_pos"]), two_d(flat["goodq"]), two_d(valid),
            two_d(sca_rows["s1"]), two_d(sca_rows["s2"]),
            two_d(sca_rows["t"]), two_d(sca_rows["max_insert"]),
            two_d(sca_rows["seq_len"]), two_d(sca_rows["no_mult"]),
            starts, ends))
        for j, k in enumerate(idxs):
            results[k] = (int(res[0, j]), int(res[1, j]), int(res[2, j]))
    return results
