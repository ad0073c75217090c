"""Structurally hard corpus + benchmark (SURVEY §7 "ragged batching").

The e2e_scale corpora produce ONE linear compact graph; this generator
builds a power-law mixture of independent components with injected
structural events, exercising the fork/bubble/cycle machinery and the
scheduler's shape-bucketing at scale:

  * component sizes ~ Zipf (a few multi-hundred-kb giants, a long tail
    of small components);
  * unit types: linear, revcomp-linear (slave reverse-complemented),
    FORK (a collapsed repeat: reads from two master copies mapped to
    one slave site — the slave vertex gains two master-side neighbors,
    lib/src/graphs/AssemblyGraph.cc:190), BUBBLE (two redundant slave
    contigs covering the same master span with interleaved blocks),
    CYCLIC (a slave-side order conflict: two blocks whose master and
    slave orders disagree -> 2-cycle -> the partition DROPS the graph,
    lib/src/PartitionFunctions.cc:131).

Usage: python bench/hard_corpus.py [genome_mb] [cpu|device] [--ref]
           [--json PATH]
--ref additionally byte-compares .blocks against ref-create and all six
merge outputs against ref-merge (the compiled reference binaries).
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

READ_LEN, INSERT, STRIDE = 50, 200, 25


def _comp(s):
    c = {"A": "T", "T": "A", "C": "G", "G": "C"}
    return "".join(c[x] for x in reversed(s))


def build_hard_corpus(genome_mb: float, tmp: str, seed: int = 77) -> dict:
    import testutil
    from gam_ngs_tpu.io import fasta

    rng = np.random.default_rng(seed)
    total = int(genome_mb * 1_000_000)

    # power-law unit sizes: sum to ~total
    sizes = []
    left = total
    while left > 30_000:
        u = min(left, int(30_000 * (rng.pareto(1.2) + 1)))
        u = min(u, 2_000_000)
        sizes.append(u)
        left -= u
    if left >= 2000:
        sizes.append(left)
    types = rng.choice(
        ["linear", "rc", "fork", "bubble", "cyclic"],
        p=[0.55, 0.15, 0.12, 0.12, 0.06], size=len(sizes))

    m_ctgs, s_ctgs = [], []   # (name, seq)
    m_recs, s_recs = [], []
    expect = {"fork": 0, "bubble": 0, "cyclic": 0}
    rid = 0

    def add_reads(pairs):
        """pairs: list of (m_ctg_idx, m_off, s_ctg_idx, s_off, genome,
        p, rc_m, rc_s, m_len, s_len) mapping plans per read pair."""
        nonlocal rid
        for (mc, moff, sc, soff, g, p, rc_m, rc_s, m_len,
             s_len) in pairs:
            q = p + INSERT - READ_LEN
            s1, s2 = g[p:p + READ_LEN], g[q:q + READ_LEN]
            name = f"h{rid}"
            rid += 1
            if mc is not None:
                if rc_m:
                    p1 = m_len - (p - moff) - READ_LEN
                    p2 = m_len - (q - moff) - READ_LEN
                    m_recs.extend(testutil.make_pe_records(
                        name, _comp(s1), mc, p1, True, _comp(s2), mc,
                        p2, False))
                else:
                    m_recs.extend(testutil.make_pe_records(
                        name, s1, mc, p - moff, False, s2, mc,
                        q - moff, True))
            if sc is not None:
                if rc_s:
                    p1 = s_len - (p - soff) - READ_LEN
                    p2 = s_len - (q - soff) - READ_LEN
                    s_recs.extend(testutil.make_pe_records(
                        name, _comp(s1), sc, p1, True, _comp(s2), sc,
                        p2, False))
                else:
                    s_recs.extend(testutil.make_pe_records(
                        name, s1, sc, p - soff, False, s2, sc,
                        q - soff, True))

    for u, (L, typ) in enumerate(zip(sizes, types)):
        g = testutil.random_genome(rng, L)
        mb0, sb0 = len(m_ctgs), len(s_ctgs)

        if typ in ("linear", "rc"):
            # master split mid-unit, slave spanning (maybe revcomp'd)
            cut = L // 2
            m_ctgs.append((f"M{u}a", g[:cut]))
            m_ctgs.append((f"M{u}b", g[cut:]))
            rc = typ == "rc"
            s_ctgs.append((f"S{u}", _comp(g) if rc else g))
            plans = []
            for p in range(0, L - INSERT, STRIDE):
                q = p + INSERT - READ_LEN
                if q + READ_LEN <= cut:
                    mc, moff, mlen = mb0, 0, cut
                elif p >= cut:
                    mc, moff, mlen = mb0 + 1, cut, L - cut
                else:
                    mc = None
                    moff = mlen = 0
                plans.append((mc, moff, sb0, 0, g, p, False, rc, mlen, L))
            add_reads(plans)

        elif typ == "fork":
            # slave misjoin: master M1=[A B], M2=[C]; slave S1=[A C]
            # (misjoined), S2=[B].  Block bA's master-successor is bB
            # but its slave-successor is bC -> out-degree 2 at bA
            # (AssemblyGraph.cc:190/:218 add one edge per ordering).
            expect["fork"] += 1
            third = L // 3
            A, Bs, C = g[:third], g[third:2 * third], g[2 * third:]
            m_ctgs.append((f"M{u}a", A + Bs))
            m_ctgs.append((f"M{u}b", C))
            s_ctgs.append((f"S{u}a", A + C))
            s_ctgs.append((f"S{u}b", Bs))
            plans = []
            for p in range(0, third - INSERT, STRIDE):
                # A: (M1@p, S1@p)
                plans.append((mb0, 0, sb0, 0, g, p, False, False,
                              2 * third, third + len(C)))
            for p in range(third, 2 * third - INSERT, STRIDE):
                # B: (M1@p, S2@p-third)
                plans.append((mb0, 0, sb0 + 1, third, g, p, False,
                              False, 2 * third, third))
            for p in range(2 * third, L - INSERT, STRIDE):
                # C: (M2@p-2t, S1@p-t) — S1's C part sits after A
                plans.append((mb0 + 1, 2 * third, sb0, third, g, p,
                              False, False, len(C), third + len(C)))
            add_reads(plans)

        elif typ == "bubble":
            # two redundant slave contigs over the same master middle
            expect["bubble"] += 1
            third = L // 3
            m_ctgs.append((f"M{u}", g))
            s_ctgs.append((f"S{u}a", g[:2 * third]))
            s_ctgs.append((f"S{u}b", g[third:]))
            plans = []
            k = 0
            for p in range(0, L - INSERT, STRIDE):
                q = p + INSERT - READ_LEN
                in_a = q + READ_LEN <= 2 * third
                in_b = p >= third
                if in_a and in_b:
                    # middle: alternate runs between the two slaves
                    sc, soff, slen = ((sb0, 0, 2 * third)
                                      if (k // 40) % 2 == 0 else
                                      (sb0 + 1, third, L - third))
                    k += 1
                elif in_a:
                    sc, soff, slen = sb0, 0, 2 * third
                elif in_b:
                    sc, soff, slen = sb0 + 1, third, L - third
                else:
                    sc = None
                    soff = slen = 0
                plans.append((mb0, 0, sc, soff, g, p, False, False, L,
                              slen))
            add_reads(plans)

        else:  # cyclic: master order b1<b2, slave order b2<b1
            expect["cyclic"] += 1
            half = L // 2
            m_ctgs.append((f"M{u}", g))
            # slave contig = [second half][first half] (translocation)
            s_ctgs.append((f"S{u}", g[half:] + g[:half]))
            plans = []
            for p in range(0, L - INSERT, STRIDE):
                q = p + INSERT - READ_LEN
                if q + READ_LEN <= half:
                    soff = -(L - half)  # maps into S at p + (L-half)
                    plans.append((mb0, 0, sb0, soff, g, p, False,
                                  False, L, L))
                elif p >= half:
                    plans.append((mb0, 0, sb0, half, g, p, False,
                                  False, L, L))
            add_reads(plans)

    mp, sp = f"{tmp}/m.bam", f"{tmp}/s.bam"
    import testutil as tu

    tu.write_sorted_bam(mp, [n for n, _ in m_ctgs],
                        [len(s) for _, s in m_ctgs], m_recs)
    tu.write_sorted_bam(sp, [n for n, _ in s_ctgs],
                        [len(s) for _, s in s_ctgs], s_recs)
    ml, sl = f"{tmp}/m.list", f"{tmp}/s.list"
    tu.write_bam_list(ml, [mp], [(100, 1000)])
    tu.write_bam_list(sl, [sp], [(100, 1000)])
    mfa, sfa = f"{tmp}/m.fasta", f"{tmp}/s.fasta"
    fasta.write_fasta(mfa, [(n, fasta.seq_to_codes(s))
                            for n, s in m_ctgs])
    fasta.write_fasta(sfa, [(n, fasta.seq_to_codes(s))
                            for n, s in s_ctgs])
    return dict(mp=mp, sp=sp, ml=ml, sl=sl, mfa=mfa, sfa=sfa,
                units=len(sizes), sizes=sizes, expect=expect,
                n_pairs=rid)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_ref = "--ref" in sys.argv
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    genome_mb = float(args[0]) if args else 4.0
    mode = args[1] if len(args) > 1 else "cpu"
    if mode == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import testutil
    from gam_ngs_tpu.models.create import CreateOptions, run_create
    from gam_ngs_tpu.models.merge import MergeOptions, run_merge
    from gam_ngs_tpu.ops.bsw_batch import BswEngine

    tmp = tempfile.mkdtemp()
    t0 = time.time()
    c = build_hard_corpus(genome_mb, tmp)
    print(f"[gen] {genome_mb} Mbp, {c['units']} units "
          f"(max {max(c['sizes'])//1000} kb), {c['n_pairs']} pairs, "
          f"expect >= {c['expect']} in {time.time()-t0:.1f}s")

    t0 = time.time()
    blocks = run_create(CreateOptions(
        master_bam_file=c["ml"], slave_bam_file=c["sl"],
        min_block_size=10, output_file_prefix=f"{tmp}/out"),
        log=lambda *_: None)
    t_create = time.time() - t0
    print(f"[create] {len(blocks)} blocks in {t_create:.2f}s")

    if run_ref:
        here = os.path.dirname(os.path.abspath(__file__))
        for b in ("ref-create", "ref-merge"):
            if not os.path.exists(os.path.join(here, "refbuild", b)):
                subprocess.run(["sh", os.path.join(here, "refbuild",
                                                   "build.sh")],
                               check=True, capture_output=True)
        testutil.write_real_bai(c["mp"])
        testutil.write_real_bai(c["sp"])
        for tag in ("m", "s"):
            testutil.write_bam_list(f"{tmp}/{tag}_ref.list",
                                    [c[tag + "p"]], [(100, 1000)])
            for side in ("ours", "ref"):
                testutil.write_bam_list(f"{tmp}/{tag}_mp_{side}.list",
                                        [c[tag + "p"]], [(100, 1000)])
        r = subprocess.run(
            [os.path.join(here, "refbuild", "ref-create"),
             "--master-bam", f"{tmp}/m_ref.list",
             "--slave-bam", f"{tmp}/s_ref.list",
             "--min-block-size", "10", "--output", f"{tmp}/refc"],
            check=True, capture_output=True, cwd=tmp)
        same = (open(f"{tmp}/refc.blocks", "rb").read()
                == open(f"{tmp}/out.blocks", "rb").read())
        print(f"[ref-create] .blocks identical: {same}")
        assert same

    eng = BswEngine()
    mp_kw = {}
    if run_ref:
        mp_kw = dict(master_mp_bam_file=f"{tmp}/m_mp_ours.list",
                     slave_mp_bam_file=f"{tmp}/s_mp_ours.list")
    t0 = time.time()
    pctgs = run_merge(MergeOptions(
        master_bam_file=c["ml"], slave_bam_file=c["sl"],
        blocks_file=f"{tmp}/out.blocks", master_fasta_file=c["mfa"],
        slave_fasta_file=c["sfa"], min_block_size=10,
        output_file_prefix=f"{tmp}/dev", engine=eng, **mp_kw),
        log=lambda *_: None)
    t_merge = time.time() - t0
    stats = open(f"{tmp}/dev.stats").read()
    metrics = json.loads(open(f"{tmp}/dev.metrics.json").read())
    print(f"[merge] {len(pctgs)} pctgs in {t_merge:.2f}s")
    print(stats.strip())
    print(json.dumps(metrics))

    ref_same = None
    if run_ref:
        here = os.path.dirname(os.path.abspath(__file__))
        t0 = time.time()
        r = subprocess.run(
            [os.path.join(here, "refbuild", "ref-merge"),
             "--master-bam", f"{tmp}/m_ref.list",
             "--slave-bam", f"{tmp}/s_ref.list",
             "--master-mp-bam", f"{tmp}/m_mp_ref.list",
             "--slave-mp-bam", f"{tmp}/s_mp_ref.list",
             "--blocks-file", f"{tmp}/out.blocks",
             "--master-fasta", c["mfa"], "--slave-fasta", c["sfa"],
             "--min-block-size", "10", "--output", f"{tmp}/refm"],
            capture_output=True, text=True, cwd=tmp)
        t_ref_merge = time.time() - t0
        assert r.returncode == 0, r.stderr[-2000:]
        outs = ("gam.fasta", "pctgs", "stats", "noblocks.BF.fasta",
                "noblocks.AF.fasta", "notmerged.fasta")
        ref_same = all(
            open(f"{tmp}/refm.{o}", "rb").read()
            == open(f"{tmp}/dev.{o}", "rb").read() for o in outs)
        print(f"[ref-merge] all six outputs identical: {ref_same} "
              f"(ref-merge took {t_ref_merge:.1f}s vs ours "
              f"{t_merge:.1f}s)")
        assert ref_same

    if json_out:
        rec = dict(
            genome_mb=genome_mb, mode=mode, units=c["units"],
            giants_kb=sorted([s // 1000 for s in c["sizes"]])[-5:],
            n_pairs=c["n_pairs"], blocks=len(blocks),
            pctgs=len(pctgs), t_create_s=round(t_create, 2),
            t_merge_s=round(t_merge, 2),
            merge_phases_s={k: round(v, 2) for k, v in
                            metrics.get("phases", {}).items()},
            counters=metrics.get("counters", {}),
            stats=stats, ref_outputs_identical=ref_same)
        with open(json_out, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(f"[json] wrote {json_out}")


if __name__ == "__main__":
    main()
