"""Differential tests: device block construction vs the exact oracle.

The device path (ops/device_join.py) must reproduce Block::findBlocks
(/root/reference/lib/src/assembly/Block.cc:470) exactly — same blocks,
same fields, same emission order — across adversarial random streams:
overlap-dense contigs (first-fit tie-breaks), short reads (empty-slot
carry), multi-contig masters inside one slave run, min-block-size
sweeps.  The oracle is core.blocks.find_blocks_from_columns; when the
native C++ scan is available it is compared three-way.
"""

from __future__ import annotations

import numpy as np
import pytest

from gam_ngs_tpu.core.blocks import find_blocks_from_columns
from gam_ngs_tpu.ops.device_join import find_blocks_device

_FIELDS = ("num_reads", "m_ctg", "m_begin", "m_end", "m_block_reads_len",
           "s_ctg", "s_strand", "s_begin", "s_end", "s_block_reads_len")


def _table_cols(t):
    return dict(num_reads=t.num_reads, m_ctg=t.m_ctg, m_begin=t.m_begin,
                m_end=t.m_end, m_block_reads_len=t.m_block_reads_len,
                s_ctg=t.s_ctg, s_strand=t.s_strand, s_begin=t.s_begin,
                s_end=t.s_end, s_block_reads_len=t.s_block_reads_len)


def _assert_same(got: dict, want: dict, ctx: str):
    assert len(got["num_reads"]) == len(want["num_reads"]), \
        f"{ctx}: {len(got['num_reads'])} blocks vs {len(want['num_reads'])}"
    for f in _FIELDS:
        np.testing.assert_array_equal(
            np.asarray(got[f], np.int64), np.asarray(want[f], np.int64),
            err_msg=f"{ctx}: column {f}")


def _stream(rng, n, n_ctg, span, len_lo, len_hi, n_names):
    """A coordinate-sorted synthetic alignment stream as flat columns."""
    name = rng.integers(0, n_names, n).astype(np.uint64)
    h1 = name * np.uint64(0x9E3779B97F4A7C15) + np.uint64(1)
    h2 = name ^ np.uint64(0xC2B2AE3D27D4EB4F)
    first = rng.integers(0, 2, n).astype(np.uint8)
    ctg = np.sort(rng.integers(0, n_ctg, n)).astype(np.int32)
    pos = rng.integers(0, span, n).astype(np.int32)
    # coordinate order within each contig
    order = np.lexsort((pos, ctg))
    ctg, pos = ctg[order], pos[order]
    name, h1, h2, first = name[order], h1[order], h2[order], first[order]
    end = pos + rng.integers(len_lo, len_hi + 1, n).astype(np.int32)
    rev = rng.integers(0, 2, n).astype(np.uint8)
    return (h1, h2, first, ctg, pos, end, rev)


CASES = [
    # (n_reads, n_ctg, span, len_lo, len_hi, n_names, mbs) — each probes
    # a different failure mode of the run/group decomposition
    (400, 2, 300, 30, 60, 120, 5),      # dense overlap, first-fit ties
    (400, 2, 300, 5, 60, 120, 20),      # many short reads: empty slots
    (600, 4, 2000, 30, 60, 300, 2),     # sparse: many runs
    (500, 1, 150, 20, 40, 100, 1),      # one contig, one giant run
    (500, 3, 400, 10, 35, 80, 30),      # mbs > most read lengths
    (300, 5, 100, 25, 50, 60, 5),       # tiny contigs, cross-ctg carry
    (800, 2, 500, 40, 80, 150, 50),     # default create mbs
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_oracle(case, seed):
    n, n_ctg, span, lo, hi, names, mbs = CASES[case]
    rng = np.random.default_rng(1000 * case + seed)
    m_cols = _stream(rng, n, n_ctg, span, lo, hi, names)
    s_cols = _stream(rng, n, n_ctg, span, lo, hi, names)
    want = _table_cols(find_blocks_from_columns(m_cols, s_cols, mbs))
    got = find_blocks_device(m_cols, s_cols, mbs)
    _assert_same(got, want, f"case={case} seed={seed}")


@pytest.mark.parametrize("mbs", [1, 3, 10, 25, 60])
def test_min_block_size_sweep(mbs):
    rng = np.random.default_rng(77)
    m_cols = _stream(rng, 700, 3, 600, 8, 70, 200)
    s_cols = _stream(rng, 700, 3, 600, 8, 70, 200)
    want = _table_cols(find_blocks_from_columns(m_cols, s_cols, mbs))
    stats: dict = {}
    got = find_blocks_device(m_cols, s_cols, mbs, stats=stats)
    _assert_same(got, want, f"mbs={mbs}")
    assert stats["matched_reads"] > 0


def test_three_way_with_native():
    from gam_ngs_tpu.native.loader import find_blocks_native, native_available
    if not native_available():
        pytest.skip("native gamio unavailable")
    rng = np.random.default_rng(5)
    m_cols = _stream(rng, 900, 3, 800, 10, 80, 250)
    s_cols = _stream(rng, 900, 3, 800, 10, 80, 250)
    for mbs in (2, 15, 50):
        want = _table_cols(find_blocks_from_columns(m_cols, s_cols, mbs))
        nat = find_blocks_native(m_cols, s_cols, mbs)
        dev = find_blocks_device(m_cols, s_cols, mbs)
        _assert_same(nat, want, f"native mbs={mbs}")
        _assert_same(dev, want, f"device mbs={mbs}")


def test_empty_inputs():
    z = (np.zeros(0, np.uint64), np.zeros(0, np.uint64),
         np.zeros(0, np.uint8), np.zeros(0, np.int32),
         np.zeros(0, np.int32), np.zeros(0, np.int32),
         np.zeros(0, np.uint8))
    rng = np.random.default_rng(0)
    s = _stream(rng, 50, 1, 100, 20, 30, 20)
    assert len(find_blocks_device(z, s, 1)["num_reads"]) == 0
    assert len(find_blocks_device(s, z, 1)["num_reads"]) == 0


def test_no_matches():
    rng = np.random.default_rng(9)
    m = _stream(rng, 100, 1, 200, 20, 30, 50)
    s = list(_stream(rng, 100, 1, 200, 20, 30, 50))
    s[0] = s[0] + np.uint64(10 ** 12)  # disjoint name space
    got = find_blocks_device(m, tuple(s), 1)
    assert len(got["num_reads"]) == 0


def test_carry_chain_across_runs():
    """Hand-built stream: a short unmatched read leaves an empty slot
    that the next run's first read seeds (its strand evidence counts)."""
    def cols(rows):
        # rows: (name, first, ctg, pos, end, rev)
        name = np.array([r[0] for r in rows], np.uint64)
        return (name * np.uint64(7919) + np.uint64(3),
                name ^ np.uint64(0xABCDEF),
                np.array([r[1] for r in rows], np.uint8),
                np.array([r[2] for r in rows], np.int32),
                np.array([r[3] for r in rows], np.int32),
                np.array([r[4] for r in rows], np.int32),
                np.array([r[5] for r in rows], np.uint8))

    master = cols([
        (1, 1, 0, 100, 104, 0),    # short (len 4)
        (2, 1, 0, 200, 260, 0),
        (3, 1, 0, 210, 270, 1),
    ])
    slave = cols([
        (1, 1, 0, 10, 14, 0),      # short: creates empty slot
        (2, 1, 0, 500, 560, 1),    # new run: seeds the empty (rev vs fwd)
        (3, 1, 0, 510, 570, 1),    # chains
    ])
    for mbs in (1, 5, 10):
        want = _table_cols(find_blocks_from_columns(master, slave, mbs))
        got = find_blocks_device(master, slave, mbs)
        _assert_same(got, want, f"carry mbs={mbs}")
