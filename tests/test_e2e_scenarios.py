"""End-to-end scenarios: reversed slave contigs, multiple partitions.

Each scenario runs gam create + merge (sequential oracle AND batched
device engine) and checks genome reconstruction plus byte-identical
outputs between the two paths.
"""

import numpy as np
import pytest

import testutil
from gam_ngs_tpu.io import fasta
from gam_ngs_tpu.models.create import CreateOptions, run_create
from gam_ngs_tpu.models.merge import MergeOptions, run_merge
from gam_ngs_tpu.ops.bsw_batch import BswEngine

READ_LEN = 50
INSERT = 200


def _pairs(lo, hi):
    return [(p, p + INSERT - READ_LEN)
            for p in range(lo, hi - INSERT + 1, 8)]


def _revcomp_str(s):
    comp = {"A": "T", "T": "A", "C": "G", "G": "C", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


def _run_both(tmp_path, ml, sl, mfa, sfa, mbs=10):
    run_create(CreateOptions(master_bam_file=ml, slave_bam_file=sl,
                             min_block_size=mbs,
                             output_file_prefix=str(tmp_path / "out")),
               log=lambda *_: None)
    outs = {}
    for tag, eng in (("seq", None), ("dev", BswEngine())):
        run_merge(MergeOptions(
            master_bam_file=ml, slave_bam_file=sl,
            blocks_file=str(tmp_path / "out.blocks"),
            master_fasta_file=mfa, slave_fasta_file=sfa,
            min_block_size=mbs,
            output_file_prefix=str(tmp_path / tag), engine=eng,
        ), log=lambda *_: None)
        outs[tag] = open(tmp_path / f"{tag}.gam.fasta", "rb").read()
    assert outs["seq"] == outs["dev"], "device path diverged"
    recs = fasta.read_fasta(str(tmp_path / "dev.gam.fasta"))
    return [fasta.codes_to_bytes(seq).decode() for _name, seq in recs]


def test_reversed_slave_contig(tmp_path):
    """Slave contig stored reverse-complemented: strand inference must
    flag '-' and the merge must flip it back to reconstruct the genome."""
    rng = np.random.default_rng(1234)
    genome = testutil.random_genome(rng, 6000)
    S_START, S_END = 2000, 4500
    slave_seq = _revcomp_str(genome[S_START:S_END])
    s_len = S_END - S_START

    m_recs, s_recs = [], []
    for i, (p, m) in enumerate(_pairs(0, 6000)):
        name = f"pair{i}"
        seq1, seq2 = genome[p:p + READ_LEN], genome[m:m + READ_LEN]
        if m + READ_LEN <= 3000:
            m_recs += testutil.make_pe_records(name, seq1, 0, p, False,
                                               seq2, 0, m, True)
        elif p >= 3000:
            m_recs += testutil.make_pe_records(name, seq1, 1, p - 3000,
                                               False, seq2, 1, m - 3000,
                                               True)
        if p >= S_START and m + READ_LEN <= S_END:
            # on the reversed slave the pair flips orientation and order
            q1 = S_END - p - READ_LEN       # read1, now reverse
            q2 = S_END - m - READ_LEN       # read2, now forward
            s_recs += testutil.make_pe_records(
                name, _revcomp_str(seq1), 0, q1, True,
                _revcomp_str(seq2), 0, q2, False)

    mp, sp = str(tmp_path / "m.bam"), str(tmp_path / "s.bam")
    testutil.write_sorted_bam(mp, ["M0", "M1"], [3000, 3000], m_recs)
    testutil.write_sorted_bam(sp, ["S0"], [s_len], s_recs)
    ml, sl = str(tmp_path / "m.list"), str(tmp_path / "s.list")
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])
    mfa, sfa = str(tmp_path / "m.fasta"), str(tmp_path / "s.fasta")
    fasta.write_fasta(mfa, [("M0", fasta.seq_to_codes(genome[:3000])),
                            ("M1", fasta.seq_to_codes(genome[3000:]))])
    fasta.write_fasta(sfa, [("S0", fasta.seq_to_codes(slave_seq))])

    merged = _run_both(tmp_path, ml, sl, mfa, sfa)
    assert merged == [genome]


def test_two_independent_partitions(tmp_path):
    """Two disjoint (master-pair, slave) junctions -> two graphs; the
    batched scheduler interleaves them; both genomes reconstruct."""
    rng = np.random.default_rng(555)
    g1 = testutil.random_genome(rng, 5000)
    g2 = testutil.random_genome(rng, 5000)

    m_recs, s_recs = [], []
    specs = [  # (genome, master ctg ids, slave ctg id, base offsets)
        (g1, (0, 1), 0),
        (g2, (2, 3), 1),
    ]
    for gi, (g, (c1, c2), s_ctg) in enumerate(specs):
        for i, (p, m) in enumerate(_pairs(0, 5000)):
            name = f"g{gi}_{i}"
            seq1, seq2 = g[p:p + READ_LEN], g[m:m + READ_LEN]
            if m + READ_LEN <= 2500:
                m_recs += testutil.make_pe_records(name, seq1, c1, p,
                                                   False, seq2, c1, m,
                                                   True)
            elif p >= 2500:
                m_recs += testutil.make_pe_records(
                    name, seq1, c2, p - 2500, False, seq2, c2, m - 2500,
                    True)
            if p >= 1500 and m + READ_LEN <= 4000:
                s_recs += testutil.make_pe_records(
                    name, seq1, s_ctg, p - 1500, False,
                    seq2, s_ctg, m - 1500, True)

    mp, sp = str(tmp_path / "m.bam"), str(tmp_path / "s.bam")
    testutil.write_sorted_bam(mp, ["A0", "A1", "B0", "B1"],
                              [2500, 2500, 2500, 2500], m_recs)
    testutil.write_sorted_bam(sp, ["SA", "SB"], [2500, 2500], s_recs)
    ml, sl = str(tmp_path / "m.list"), str(tmp_path / "s.list")
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])
    mfa, sfa = str(tmp_path / "m.fasta"), str(tmp_path / "s.fasta")
    fasta.write_fasta(mfa, [
        ("A0", fasta.seq_to_codes(g1[:2500])),
        ("A1", fasta.seq_to_codes(g1[2500:])),
        ("B0", fasta.seq_to_codes(g2[:2500])),
        ("B1", fasta.seq_to_codes(g2[2500:]))])
    fasta.write_fasta(sfa, [
        ("SA", fasta.seq_to_codes(g1[1500:4000])),
        ("SB", fasta.seq_to_codes(g2[1500:4000]))])

    merged = _run_both(tmp_path, ml, sl, mfa, sfa)
    assert sorted(merged) == sorted([g1, g2])


def test_mp_library_arbitration(tmp_path):
    """PE + MP libraries: the PE/MP region-score arbitration path runs
    (getRegionScore :341-358) and the genome still reconstructs, with
    sequential == batched outputs."""
    rng = np.random.default_rng(42)
    genome = testutil.random_genome(rng, 6000)
    MP_INSERT = 1200

    m_recs, s_recs, m_mp, s_mp = [], [], [], []
    for i, (p, m) in enumerate(_pairs(0, 6000)):
        name = f"pe{i}"
        seq1, seq2 = genome[p:p + READ_LEN], genome[m:m + READ_LEN]
        if m + READ_LEN <= 3000:
            m_recs += testutil.make_pe_records(name, seq1, 0, p, False,
                                               seq2, 0, m, True)
        elif p >= 3000:
            m_recs += testutil.make_pe_records(name, seq1, 1, p - 3000,
                                               False, seq2, 1, m - 3000,
                                               True)
        if p >= 2000 and m + READ_LEN <= 4500:
            s_recs += testutil.make_pe_records(name, seq1, 0, p - 2000,
                                               False, seq2, 0, m - 2000,
                                               True)
    # MP pairs with a long insert
    for i, p in enumerate(range(0, 6000 - MP_INSERT, 40)):
        m = p + MP_INSERT - READ_LEN
        name = f"mp{i}"
        seq1, seq2 = genome[p:p + READ_LEN], genome[m:m + READ_LEN]
        if m + READ_LEN <= 3000:
            m_mp += testutil.make_pe_records(name, seq1, 0, p, False,
                                             seq2, 0, m, True)
        elif p >= 3000:
            m_mp += testutil.make_pe_records(name, seq1, 1, p - 3000,
                                             False, seq2, 1, m - 3000, True)
        if p >= 2000 and m + READ_LEN <= 4500:
            s_mp += testutil.make_pe_records(name, seq1, 0, p - 2000,
                                             False, seq2, 0, m - 2000, True)

    names_m, lens_m = ["M0", "M1"], [3000, 3000]
    names_s, lens_s = ["S0"], [2500]
    files = {}
    for tag, names, lens, recs in (
            ("m", names_m, lens_m, m_recs), ("s", names_s, lens_s, s_recs),
            ("mmp", names_m, lens_m, m_mp), ("smp", names_s, lens_s, s_mp)):
        path = str(tmp_path / f"{tag}.bam")
        testutil.write_sorted_bam(path, names, lens, recs)
        lst = str(tmp_path / f"{tag}.list")
        testutil.write_bam_list(lst, [path],
                                [(100, 1000) if "mp" not in tag
                                 else (600, 3000)])
        files[tag] = lst
    mfa, sfa = str(tmp_path / "m.fasta"), str(tmp_path / "s.fasta")
    fasta.write_fasta(mfa, [("M0", fasta.seq_to_codes(genome[:3000])),
                            ("M1", fasta.seq_to_codes(genome[3000:]))])
    fasta.write_fasta(sfa, [("S0", fasta.seq_to_codes(genome[2000:4500]))])

    run_create(CreateOptions(master_bam_file=files["m"],
                             slave_bam_file=files["s"], min_block_size=10,
                             output_file_prefix=str(tmp_path / "out")),
               log=lambda *_: None)
    outs = {}
    for tag, eng in (("seq", None), ("dev", BswEngine())):
        run_merge(MergeOptions(
            master_bam_file=files["m"], slave_bam_file=files["s"],
            master_mp_bam_file=files["mmp"], slave_mp_bam_file=files["smp"],
            blocks_file=str(tmp_path / "out.blocks"),
            master_fasta_file=mfa, slave_fasta_file=sfa,
            min_block_size=10, output_file_prefix=str(tmp_path / tag),
            engine=eng), log=lambda *_: None)
        outs[tag] = open(tmp_path / f"{tag}.gam.fasta", "rb").read()
    assert outs["seq"] == outs["dev"]
    recs = fasta.read_fasta(str(tmp_path / "dev.gam.fasta"))
    merged = [fasta.codes_to_bytes(seq).decode() for _n, seq in recs]
    assert merged == [genome]
