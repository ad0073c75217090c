"""End-to-end scale benchmark on a synthetic multi-contig genome.

Generates GENOME_MB megabases, a master assembly split every MASTER_CUT
bases, a slave assembly split every SLAVE_CUT bases offset by half a
cut (so every master junction is spanned by a slave contig), and an
FR read-pair lattice.  Runs gam create + gam merge and reports phase
wall-clock + reconstruction accuracy.

Usage: python bench/e2e_scale.py [genome_mb] [cpu|device] [--ref] [--json PATH]

--ref also runs the REFERENCE's own gam-create (bench/refbuild/ref-create,
compiled unmodified from /root/reference — see build.sh) on the same
corpus as a true single-thread C++ baseline for the create phase.
--json persists the result record (PERF.md cites these).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def build_corpus(genome_mb: float, tmp: str, break_every: int = 0) -> dict:
    """Generate the synthetic corpus (genome, BAMs, lists, FASTAs) and
    return its paths + the genome string.  Shared by this driver and
    bench/dist_scale.py.

    break_every=k snaps every k-th slave cut onto a master cut, so
    neither assembly bridges there — the block graph splits into ~#cuts/k
    connected components (multi-partition corpora for the distributed
    benches; 0 = one big component)."""
    import testutil
    from gam_ngs_tpu.io import fasta

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
    if break_every:
        for k in range(break_every, len(s_cuts) - 1, break_every):
            s_cuts[k] = round(s_cuts[k] / MASTER_CUT) * MASTER_CUT
        s_cuts = sorted(set(s_cuts))

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
    return dict(genome=genome, mp=mp, sp=sp, ml=ml, sl=sl, mfa=mfa,
                sfa=sfa, n_pairs=n_pairs, m_names=m_names,
                s_names=s_names)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_ref = "--ref" in sys.argv
    create_only = "--create-only" in sys.argv
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    genome_mb = float(args[0]) if len(args) > 0 else 2.0
    mode = args[1] if len(args) > 1 else "cpu"
    if mode == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import testutil
    from gam_ngs_tpu.io import fasta
    from gam_ngs_tpu.models.create import CreateOptions, run_create
    from gam_ngs_tpu.models.merge import MergeOptions, run_merge
    from gam_ngs_tpu.ops.bsw_batch import BswEngine

    # --corpus-dir PATH reuses an already-generated corpus (A/B runs on
    # identical inputs without paying the multi-minute generation)
    tmp = None
    if "--corpus-dir" in sys.argv:
        tmp = sys.argv[sys.argv.index("--corpus-dir") + 1]
        os.makedirs(tmp, exist_ok=True)
    pickled = os.path.join(tmp, "corpus.meta.json") if tmp else None
    if pickled and os.path.exists(pickled):
        meta = json.load(open(pickled))
        c = {k: (os.path.join(tmp, v) if k in
                 ("mp", "sp", "ml", "sl", "mfa", "sfa") else v)
             for k, v in meta.items()}
        c["genome"] = open(os.path.join(tmp, "genome.txt")).read()
        print(f"[gen] reused corpus in {tmp}")
    else:
        if tmp is None:
            tmp = tempfile.mkdtemp()
        c = build_corpus(genome_mb, tmp)
        if pickled:
            with open(os.path.join(tmp, "genome.txt"), "w") as fh:
                fh.write(c["genome"])
            json.dump({k: (os.path.basename(v) if k in
                           ("mp", "sp", "ml", "sl", "mfa", "sfa")
                           else v)
                       for k, v in c.items() if k != "genome"},
                      open(pickled, "w"))
    genome, mp, sp, ml, sl, mfa, sfa, n_pairs, m_names, s_names = (
        c["genome"], c["mp"], c["sp"], c["ml"], c["sl"], c["mfa"],
        c["sfa"], c["n_pairs"], c["m_names"], c["s_names"])

    t_ref_create = None
    if run_ref:
        here = os.path.dirname(os.path.abspath(__file__))
        ref_bin = os.path.join(here, "refbuild", "ref-create")
        if not os.path.exists(ref_bin):
            subprocess.run(["sh", os.path.join(here, "refbuild",
                                               "build.sh")], check=True)
        testutil.write_bai_stub(mp, len(m_names))
        testutil.write_bai_stub(sp, len(s_names))
        # separate list files -> the reference writes its own .isize
        mlr, slr = f"{tmp}/m_ref.list", f"{tmp}/s_ref.list"
        testutil.write_bam_list(mlr, [mp], [(100, 1000)])
        testutil.write_bam_list(slr, [sp], [(100, 1000)])
        t0 = time.time()
        subprocess.run([ref_bin, "--master-bam", mlr, "--slave-bam", slr,
                        "--min-block-size", "10",
                        "--output", f"{tmp}/ref"],
                       check=True, capture_output=True)
        t_ref_create = time.time() - t0
        print(f"[ref-create] reference C++ binary in {t_ref_create:.2f}s")

    t0 = time.time()
    blocks = run_create(CreateOptions(
        master_bam_file=ml, slave_bam_file=sl, min_block_size=10,
        output_file_prefix=f"{tmp}/out"), log=lambda *_: None)
    t_create = time.time() - t0
    print(f"[create] {len(blocks)} blocks in {t_create:.2f}s")
    if run_ref:
        same = (open(f"{tmp}/ref.blocks", "rb").read()
                == open(f"{tmp}/out.blocks", "rb").read())
        print(f"[ref-create] .blocks identical to reference: {same}")
        assert same, ".blocks differs from the reference binary"

    if create_only:
        print(f"CREATE_ONLY ours={t_create:.2f}s ref={t_ref_create}s")
        if json_out:
            with open(json_out, "w") as fh:
                json.dump({"genome_mb": genome_mb, "mode": mode,
                           "n_pairs": n_pairs, "blocks": len(blocks),
                           "t_create_s": round(t_create, 2),
                           "t_ref_create_s": (round(t_ref_create, 2)
                                              if t_ref_create is not None
                                              else None)}, fh, indent=1)
            print(f"[json] wrote {json_out}")
        return

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
    metrics = json.loads(open(f"{tmp}/dev.metrics.json").read())
    print(json.dumps(metrics))
    print(f"E2E_SECONDS {t_create + t_merge:.2f}")

    if json_out:
        cells = metrics.get("counters", {}).get("aligned_cells", 0)
        rec = {
            "genome_mb": genome_mb,
            "mode": mode,
            "n_pairs": n_pairs,
            "blocks": len(blocks),
            "pctgs": len(pctgs),
            "t_create_s": round(t_create, 2),
            "t_ref_create_s": (round(t_ref_create, 2)
                               if t_ref_create is not None else None),
            "t_merge_s": round(t_merge, 2),
            "e2e_s": round(t_create + t_merge, 2),
            "merge_phases_s": {k: round(v, 2) for k, v in
                               metrics.get("phases", {}).items()},
            "aligned_cells": cells,
            "aligned_cells_per_s": (round(cells / t_merge)
                                    if t_merge > 0 else 0),
            "blocks_per_s_create": round(len(blocks) / t_create, 1),
            "reconstruction_ok": bool(ok),
            "counters": metrics.get("counters", {}),
            "maxrss_mb": __import__("resource").getrusage(
                __import__("resource").RUSAGE_SELF).ru_maxrss // 1024,
        }
        with open(json_out, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"[json] wrote {json_out}")


if __name__ == "__main__":
    main()
