"""End-to-end scale benchmark on a synthetic multi-contig genome.

Generates GENOME_MB megabases, a master assembly split every MASTER_CUT
bases, a slave assembly split every SLAVE_CUT bases offset by half a
cut (so every master junction is spanned by a slave contig), and an
FR read-pair lattice.  Runs gam create + gam merge and reports phase
wall-clock + reconstruction accuracy.

Usage: python bench/e2e_scale.py [genome_mb] [cpu|device]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    mode = sys.argv[2] if len(sys.argv) > 2 else "cpu"
    if mode == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import testutil
    from gam_ngs_tpu.io import fasta
    from gam_ngs_tpu.models.create import CreateOptions, run_create
    from gam_ngs_tpu.models.merge import MergeOptions, run_merge
    from gam_ngs_tpu.ops.bsw_batch import BswEngine

    N = int(genome_mb * 1_000_000)
    MASTER_CUT = 50_000
    SLAVE_CUT = 50_000
    READ_LEN, INSERT, STRIDE = 50, 200, 25

    rng = np.random.default_rng(2024)
    t0 = time.time()
    genome = testutil.random_genome(rng, N)
    print(f"[gen] genome {N/1e6:.1f} Mbp in {time.time()-t0:.1f}s")

    m_cuts = list(range(0, N + 1, MASTER_CUT))
    s_cuts = [0] + list(range(SLAVE_CUT // 2, N, SLAVE_CUT)) + [N]

    def ctg_of(cuts, p, q):
        """contig idx if [p, q) within one contig else None."""
        import bisect

        c = bisect.bisect_right(cuts, p) - 1
        if q <= cuts[c + 1]:
            return c, p - cuts[c]
        return None, None

    t0 = time.time()
    m_recs, s_recs = [], []
    n_pairs = 0
    for p in range(0, N - INSERT, STRIDE):
        m = p + INSERT - READ_LEN
        name = f"r{n_pairs}"
        n_pairs += 1
        seq1 = genome[p:p + READ_LEN]
        seq2 = genome[m:m + READ_LEN]
        c, off = ctg_of(m_cuts, p, m + READ_LEN)
        if c is not None:
            m_recs += testutil.make_pe_records(
                name, seq1, c, off, False, seq2, c,
                m - m_cuts[c], True)
        c, off = ctg_of(s_cuts, p, m + READ_LEN)
        if c is not None:
            s_recs += testutil.make_pe_records(
                name, seq1, c, off, False, seq2, c,
                m - s_cuts[c], True)
    print(f"[gen] {n_pairs} pairs -> {len(m_recs)}/{len(s_recs)} recs "
          f"in {time.time()-t0:.1f}s")

    tmp = tempfile.mkdtemp()
    t0 = time.time()
    mp, sp = f"{tmp}/m.bam", f"{tmp}/s.bam"
    m_names = [f"M{i}" for i in range(len(m_cuts) - 1)]
    s_names = [f"S{i}" for i in range(len(s_cuts) - 1)]
    testutil.write_sorted_bam(
        mp, m_names, [m_cuts[i + 1] - m_cuts[i]
                      for i in range(len(m_cuts) - 1)], m_recs)
    testutil.write_sorted_bam(
        sp, s_names, [s_cuts[i + 1] - s_cuts[i]
                      for i in range(len(s_cuts) - 1)], s_recs)
    ml, sl = f"{tmp}/m.list", f"{tmp}/s.list"
    testutil.write_bam_list(ml, [mp], [(100, 1000)])
    testutil.write_bam_list(sl, [sp], [(100, 1000)])
    mfa, sfa = f"{tmp}/m.fasta", f"{tmp}/s.fasta"
    fasta.write_fasta(mfa, [
        (m_names[i], fasta.seq_to_codes(genome[m_cuts[i]:m_cuts[i + 1]]))
        for i in range(len(m_names))])
    fasta.write_fasta(sfa, [
        (s_names[i], fasta.seq_to_codes(genome[s_cuts[i]:s_cuts[i + 1]]))
        for i in range(len(s_names))])
    print(f"[gen] BAM/FASTA write in {time.time()-t0:.1f}s")

    t0 = time.time()
    blocks = run_create(CreateOptions(
        master_bam_file=ml, slave_bam_file=sl, min_block_size=10,
        output_file_prefix=f"{tmp}/out"), log=lambda *_: None)
    t_create = time.time() - t0
    print(f"[create] {len(blocks)} blocks in {t_create:.2f}s")

    t0 = time.time()
    pctgs = run_merge(MergeOptions(
        master_bam_file=ml, slave_bam_file=sl,
        blocks_file=f"{tmp}/out.blocks",
        master_fasta_file=mfa, slave_fasta_file=sfa, min_block_size=10,
        output_file_prefix=f"{tmp}/dev", engine=BswEngine()),
        log=lambda *_: None)
    t_merge = time.time() - t0

    merged = sorted((fasta.codes_to_bytes(p.sequence()).decode()
                     for p in pctgs), key=len, reverse=True)
    ok = merged[0] == genome if merged else False
    print(f"[merge] {len(pctgs)} pctgs in {t_merge:.2f}s; "
          f"longest == genome: {ok}")
    print(open(f"{tmp}/dev.metrics.json").read())
    print(f"E2E_SECONDS {t_create + t_merge:.2f}")


if __name__ == "__main__":
    main()
