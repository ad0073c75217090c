"""Distributed gam-create parity: sharded block construction and stats
must equal the sequential results exactly (blocks) or to float rounding
(moment-based stats).

The multi-process runtime is simulated in-process: nproc lockstep
threads each run the real distributed function with an injected
allgather that rendezvouses at a barrier — the collective call pattern
is identical to the jax.distributed one (same number of rounds on every
process, same payloads), so the only thing not exercised here is the
wire itself (tests/test_distributed_2proc.py covers that).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from gam_ngs_tpu.ops.device_join import find_blocks_device
from gam_ngs_tpu.parallel.create_dist import (
    distributed_coverage_vectors,
    distributed_find_blocks,
    distributed_library_stats,
    shard_ranges_by_weight,
)

from test_device_join import _stream, _assert_same, _table_cols  # noqa: E402
from gam_ngs_tpu.core.blocks import find_blocks_from_columns


class LockstepGather:
    """In-process allgather: nproc threads rendezvous per round."""

    def __init__(self, nproc: int):
        self.n = nproc
        self.buf: list = [None] * nproc
        self.enter = threading.Barrier(nproc)
        self.exit = threading.Barrier(nproc)
        self.lock = threading.Lock()
        self.seq = 0

    def for_pid(self, pid: int):
        def gather(obj):
            self.buf[pid] = obj
            self.enter.wait(timeout=60)
            out = list(self.buf)
            self.exit.wait(timeout=60)  # all read before next round writes
            return out

        return gather


def run_lockstep(fn, nproc: int) -> list:
    """Run fn(pid, gather) on nproc lockstep threads; return results."""
    g = LockstepGather(nproc)
    with ThreadPoolExecutor(nproc) as ex:
        futs = [ex.submit(fn, pid, g.for_pid(pid)) for pid in range(nproc)]
        return [f.result(timeout=120) for f in futs]


def test_shard_ranges_cover_and_balance():
    w = np.array([5, 1, 1, 10, 2, 2, 7, 1], np.int64)
    for nproc in (1, 2, 3, 8, 12):
        r = shard_ranges_by_weight(w, nproc)
        assert len(r) == nproc
        assert r[0][0] == 0 and r[-1][1] == len(w)
        for (a, b), (c, _) in zip(r, r[1:]):
            assert b == c and a <= b


CASES = [
    # (n_reads, n_ctg, span, len_lo, len_hi, n_names, mbs)
    (400, 2, 300, 30, 60, 120, 5),     # 2 contigs, dense
    (400, 5, 300, 5, 60, 120, 20),     # short reads: carry bits cross shards
    (600, 8, 800, 30, 60, 300, 2),     # many contigs, sparse
    (500, 3, 400, 10, 35, 80, 30),     # mbs > most read lengths
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("nproc", [2, 3])
def test_distributed_find_blocks_parity(case, nproc):
    n, n_ctg, span, lo, hi, names, mbs = CASES[case]
    rng = np.random.default_rng(4000 + case)
    m_cols = _stream(rng, n, n_ctg, span, lo, hi, names)
    s_cols = _stream(rng, n, n_ctg, span, lo, hi, names)
    want = find_blocks_device(m_cols, s_cols, mbs)

    got = run_lockstep(
        lambda pid, gather: distributed_find_blocks(
            m_cols, s_cols, mbs, pid, nproc, _allgather=gather),
        nproc)
    for pid in range(nproc):
        _assert_same(got[pid], want, f"case={case} nproc={nproc} pid={pid}")


@pytest.mark.parametrize("nproc", [2, 4, 7])
def test_distributed_blocks_vs_oracle_min_block_sweep(nproc):
    """Directly against the Python oracle, with min-block sizes chosen
    so empty-slot carries land on shard boundaries."""
    rng = np.random.default_rng(99)
    m_cols = _stream(rng, 700, 6, 400, 8, 70, 200)
    s_cols = _stream(rng, 700, 6, 400, 8, 70, 200)
    for mbs in (1, 10, 25, 60):
        want = _table_cols(find_blocks_from_columns(m_cols, s_cols, mbs))
        got = run_lockstep(
            lambda pid, gather: distributed_find_blocks(
                m_cols, s_cols, mbs, pid, nproc, _allgather=gather),
            nproc)
        _assert_same(got[0], want, f"mbs={mbs} nproc={nproc}")


def test_distributed_find_blocks_more_procs_than_contigs():
    rng = np.random.default_rng(7)
    m_cols = _stream(rng, 200, 1, 200, 20, 40, 60, )
    s_cols = _stream(rng, 200, 1, 200, 20, 40, 60, )
    want = find_blocks_device(m_cols, s_cols, 3)
    got = run_lockstep(
        lambda pid, gather: distributed_find_blocks(
            m_cols, s_cols, 3, pid, 4, _allgather=gather),
        4)
    _assert_same(got[0], want, "1 contig, 4 procs")


def _mini_multibam(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from test_merge_pipeline import _build_inputs
    from gam_ngs_tpu.core.multibam import MultiBam

    _genome, ml, _sl, _mfa, _sfa = _build_inputs(tmp_path)
    return MultiBam.open(ml)


def test_distributed_library_stats_parity(tmp_path):
    mb = _mini_multibam(tmp_path)
    mb.compute_statistics(require_paired_flag=True)
    want = (list(mb.isize_mean), list(mb.isize_std), list(mb.coverage))

    nproc = 3

    def job(pid, gather):
        import copy

        my = copy.copy(mb)
        distributed_library_stats(my, True, pid, nproc, _allgather=gather)
        return my.isize_mean, my.isize_std, my.coverage

    res = run_lockstep(job, nproc)
    for mean, std, cov in res:
        np.testing.assert_allclose(mean, want[0], rtol=1e-9)
        np.testing.assert_allclose(std, want[1], rtol=1e-6)
        np.testing.assert_allclose(cov, want[2], rtol=1e-12)


def test_distributed_coverage_parity(tmp_path):
    from gam_ngs_tpu.core.blocks import coverage_vectors

    mb = _mini_multibam(tmp_path)
    want = coverage_vectors(mb, False)
    nproc = 2
    res = run_lockstep(
        lambda pid, gather: distributed_coverage_vectors(
            mb, False, pid, nproc, _allgather=gather),
        nproc)
    for got in res:
        assert len(got) == len(want)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
