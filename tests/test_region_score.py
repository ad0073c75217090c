"""Batched (device) edge-weight counting vs the sequential oracle."""

import numpy as np

import testutil
from gam_ngs_tpu.core.multibam import MultiBam
from gam_ngs_tpu.graphs.partition import partition_blocks_by_paired_contigs
from gam_ngs_tpu.graphs.assembly import AssemblyGraph
from gam_ngs_tpu.graphs.compact import CompactAssemblyGraph
from gam_ngs_tpu.models.create import CreateOptions, run_create


def _pipeline_graphs(tmp_path):
    """Three master contigs bridged by one slave contig -> a compact
    graph with master+slave edges whose weights need region counting."""
    rng = np.random.default_rng(99)
    genome = testutil.random_genome(rng, 9000)
    cuts = [0, 3000, 6000, 9000]
    m_recs, s_recs = [], []
    i = 0
    for p in range(0, 9000 - 220, 6):
        q = p + 170
        name = f"r{i}"
        i += 1
        s1 = genome[p:p + 50]
        s2 = genome[q:q + 50]
        # master: pairs within one of the three contigs
        for c in range(3):
            if p >= cuts[c] and q + 50 <= cuts[c + 1]:
                m_recs += testutil.make_pe_records(
                    name, s1, c, p - cuts[c], False,
                    s2, c, q - cuts[c], True)
        # slave: single contig spanning everything
        s_recs += testutil.make_pe_records(name, s1, 0, p, False,
                                           s2, 0, q, True)
    mp, sp = str(tmp_path / "m.bam"), str(tmp_path / "s.bam")
    testutil.write_sorted_bam(mp, ["M0", "M1", "M2"], [3000, 3000, 3000],
                              m_recs)
    testutil.write_sorted_bam(sp, ["S0"], [9000], s_recs)
    ml, sl = str(tmp_path / "m.list"), str(tmp_path / "s.list")
    testutil.write_bam_list(ml, [mp], [(50, 500)])
    testutil.write_bam_list(sl, [sp], [(50, 500)])
    blocks = run_create(CreateOptions(
        master_bam_file=ml, slave_bam_file=sl, min_block_size=10,
        output_file_prefix=str(tmp_path / "out")), log=lambda *_: None)
    master = MultiBam.open(ml)
    slave = MultiBam.open(sl)
    master.read_stats_from_file(ml + ".isize")
    slave.read_stats_from_file(sl + ".isize")
    return blocks, master, slave


def test_batched_matches_sequential(tmp_path):
    blocks, master, slave = _pipeline_graphs(tmp_path)
    parts = partition_blocks_by_paired_contigs(blocks)
    assert parts, "expected at least one partition"
    checked_edges = 0
    for ag_id, rows in enumerate(parts, start=1):
        ag = AssemblyGraph(blocks, rows, ag_id)
        cg_seq = CompactAssemblyGraph(ag)
        cg_seq.compute_edge_weights(master, None, slave, None,
                                    batched=False)
        cg_bat = CompactAssemblyGraph(ag)
        cg_bat.compute_edge_weights(master, None, slave, None,
                                    batched=True)
        for e in cg_seq.edges():
            ps, pb = cg_seq.prop[e], cg_bat.prop[e]
            assert ps["weight"] == pb["weight"], e
            assert ps["rnum"] == pb["rnum"], e
            assert ps["min_cov"] == pb["min_cov"], e
            checked_edges += 1
    assert checked_edges >= 2  # master edges across the junctions


def _random_job(rng, n, long_reads=False):
    rl = rng.integers(12000, 20000, n) if long_reads \
        else rng.integers(50, 200, n)
    pos = rng.integers(0, 5000, n).astype(np.int32)
    return {
        "pos": pos,
        "end_pos": (pos + rl).astype(np.int32),
        "flag": rng.choice([1, 1 | 16, 1 | 8, 1 | 32, 1 | 16 | 32],
                           n).astype(np.int32),
        "nh": rng.choice([1, 1, 1, 2], n).astype(np.int32),
        "xt": np.full(n, ord("U"), np.int32),
        "ref_id": np.zeros(n, np.int32),
        "mate_ref": rng.choice([0, 0, 0, 1], n).astype(np.int32),
        "mate_pos": rng.integers(0, 6000, n).astype(np.int32),
        "goodq": np.ones(n, np.int32),
        "s1": 100, "s2": 4000, "t": 3000,
        "max_insert": 600, "seq_len": 9000, "no_mult": 0,
    }


def test_host_replica_matches_kernel():
    """_count_job_host (the int32-overflow escape hatch) must agree
    with the device kernel bit-for-bit on in-range jobs."""
    from gam_ngs_tpu.ops import region_score as rs

    rng = np.random.default_rng(5)
    jobs = [_random_job(rng, int(rng.integers(10, 400))) for _ in range(6)]
    got = rs.count_jobs(jobs)
    for k, job in enumerate(jobs):
        assert rs._count_job_host(job) == got[k], f"job {k}"


def test_long_read_overflow_routes_to_host(monkeypatch):
    """A job whose summed read lengths exceed OV_CAP must bypass the
    int32 device cumsum, and chunks must split on the weight bound."""
    from gam_ngs_tpu.ops import region_score as rs

    rng = np.random.default_rng(6)
    big = _random_job(rng, 300, long_reads=True)
    small = _random_job(rng, 50)
    # shrink the cap so the test stays fast: big alone exceeds it
    monkeypatch.setattr(rs, "OV_CAP", 10000)
    calls = []
    orig = rs._count_kernel

    def spy(R, J):
        calls.append((R, J))
        return orig(R, J)

    monkeypatch.setattr(rs, "_count_kernel", spy)
    got = rs.count_jobs([small, big, small])
    assert got[1] == rs._count_job_host(big)
    assert got[0] == got[2] == rs._count_job_host(small)
    # each small job weighs ~6250 (> cap/2), so the two smalls split
    # into separate dispatches
    assert len(calls) == 2


def test_resident_matches_payload(tmp_path, monkeypatch):
    """The device-resident range-job path must match the row-payload
    path edge-for-edge (same graphs, both vs each other)."""
    from gam_ngs_tpu.ops import region_score as rs

    blocks, master, slave = _pipeline_graphs(tmp_path)
    parts = partition_blocks_by_paired_contigs(blocks)

    def weights_with(resident: str):
        monkeypatch.setenv("GAM_RESIDENT", resident)
        out = []
        for ag_id, rows in enumerate(parts, start=1):
            ag = AssemblyGraph(blocks, rows, ag_id)
            cg = CompactAssemblyGraph(ag)
            cg.compute_edge_weights(master, None, slave, None,
                                    batched=True)
            out.append([(e, cg.prop[e]["weight"], cg.prop[e]["rnum"])
                        for e in cg.edges()])
        return out

    w0 = rs.WIRE["bytes_up"]
    res = weights_with("1")
    resident_bytes = rs.WIRE["bytes_up"] - w0
    w0 = rs.WIRE["bytes_up"]
    pay = weights_with("0")
    payload_bytes = rs.WIRE["bytes_up"] - w0
    assert res == pay
    # the whole point: range jobs ship orders of magnitude fewer bytes
    assert resident_bytes < payload_bytes


def test_resident_overflow_routes_to_host(tmp_path, monkeypatch):
    """OV_CAP escape hatch on the resident path: a range job whose
    Σ read lengths exceed the cap is counted by the exact host
    replica."""
    from gam_ngs_tpu.ops import region_score as rs

    blocks, master, slave = _pipeline_graphs(tmp_path)
    parts = partition_blocks_by_paired_contigs(blocks)
    monkeypatch.setenv("GAM_RESIDENT", "1")
    monkeypatch.setattr(rs, "OV_CAP", 1000)  # every job overflows
    for ag_id, rows in enumerate(parts, start=1):
        ag = AssemblyGraph(blocks, rows, ag_id)
        cg_seq = CompactAssemblyGraph(ag)
        cg_seq.compute_edge_weights(master, None, slave, None,
                                    batched=False)
        cg_res = CompactAssemblyGraph(ag)
        cg_res.compute_edge_weights(master, None, slave, None,
                                    batched=True)
        for e in cg_seq.edges():
            assert cg_seq.prop[e]["weight"] == cg_res.prop[e]["weight"]
            assert cg_seq.prop[e]["rnum"] == cg_res.prop[e]["rnum"]
