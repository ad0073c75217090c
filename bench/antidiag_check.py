"""On-chip validation + timing of the production anti-diagonal kernel.

Parity: the fused engine path (anti-diagonal forward + device find-max
+ lockstep walk, compiled Mosaic) vs the exact host oracle on quirk-
heavy problems.  Timing: fori-slope (RTT-cancelled) of the anti-diag
forward vs the row forward on identical shapes.

Usage: python bench/antidiag_check.py [parity|time|both] [B] [XW]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BAND = 150
YS = 2 * BAND + 1


def parity():
    from gam_ngs_tpu.ops.bsw_batch import BswEngine
    from gam_ngs_tpu.ops.bsw_ref import bsw_align

    rng = np.random.default_rng(99)
    problems = []
    for k in range(24):
        n = int(rng.integers(60, 250))
        a = rng.integers(0, 5 if k % 3 == 0 else 4, size=n).astype(np.uint8)
        b = a.copy()
        noise = rng.random(n) < 0.08
        b[noise] = (b[noise] + 1 + rng.integers(0, 3, noise.sum())) % 4
        if k % 3 == 0:
            cut = n // 2
            b = np.concatenate([b[:cut], b[cut + 9:]]).astype(np.uint8)
        fs, fe = k % 4 == 1, k % 4 == 2
        ba = 0
        eb = len(b) - 1
        if k % 5 == 4:
            ba = -int(rng.integers(10, 60))  # tail-window negative begin
        if k % 6 == 5:
            eb = int(rng.integers(1, 10))    # force_end underflow window
            fe = True
        problems.append((a, ba, n - 1, b, 0, eb, fs, fe))

    for fetch in ("edits", "lean"):
        eng = BswEngine(traceback="device", fetch=fetch)
        assert eng._use_antidiag(), "anti-diag not selected!"
        got = eng.align_many(problems)
        bad = 0
        for i, pr in enumerate(problems):
            want = bsw_align(*pr)
            g = got[i]
            ok = (g.score == want.score and g.begin_a == want.begin_a
                  and g.begin_b == want.begin_b and g.length == want.length
                  and abs(g.homology - want.homology) < 1e-9)
            if fetch == "edits" and want.edits is not None:
                ok = ok and list(g.edits) == list(want.edits)
            if not ok:
                bad += 1
                print(f"  MISMATCH {fetch} #{i}: score {g.score} vs "
                      f"{want.score}, ba {g.begin_a} vs {want.begin_a}, "
                      f"len {g.length} vs {want.length}")
        print(f"[parity {fetch}] {len(problems) - bad}/{len(problems)} ok")
        if bad:
            sys.exit(1)


def timing(B=128, XW=1024):
    import jax
    import jax.numpy as jnp

    from gam_ngs_tpu.ops.bsw_pallas import (antidiag_dims,
                                            pallas_forward_antidiag_raw,
                                            pallas_forward_raw)

    rng = np.random.default_rng(0)
    AW_anti = antidiag_dims(XW, BAND)[2]
    AW_row = XW + 384
    a_big = rng.integers(0, 4, size=(B, max(AW_anti, AW_row))).astype(np.uint8)
    b0 = np.empty((B, XW), np.uint8)
    b0[:] = a_big[:, BAND:BAND + XW]
    noise = rng.random(b0.shape) < 0.05
    b0[noise] = (b0[noise] + 1) % 4
    begin_a = np.full(B, BAND, np.int32)
    end_a = np.full(B, BAND + XW - 1, np.int32)
    x_size = np.full(B, XW, np.int32)
    fs = np.zeros(B, np.int32)

    def slope(raw, aw, label):
        a_len = np.full(B, aw, np.int32)
        a_win = np.ascontiguousarray(a_big[:, :aw])

        def loop(K):
            def body(_, carry):
                b, acc = carry
                _d, last_row, _dv = raw(a_win, b, begin_a, end_a, a_len,
                                        x_size, fs)
                t = last_row[0, :1] & 1
                b = (b + t) & 3
                return b, acc + last_row[0, 0]

            _, acc = jax.lax.fori_loop(
                0, K, body, (jnp.asarray(b0, jnp.int32), jnp.int32(0)))
            return acc

        jl = jax.jit(loop)

        def t_of(K):
            t0 = time.perf_counter()
            acc = jl(np.int32(K))
            float(np.asarray(acc))
            return time.perf_counter() - t0

        t_of(1)
        ts = min(t_of(24) for _ in range(3))
        tl = min(t_of(120) for _ in range(3))
        per = (tl - ts) / 96
        cells = B * XW * YS
        print(f"[{label}] {per * 1e3:.3f} ms/kernel "
              f"({cells / per / 1e9:.1f} GCUPS)")
        return cells / per / 1e9

    g_anti = slope(pallas_forward_antidiag_raw(B, XW, BAND), AW_anti,
                   "antidiag")
    g_row = slope(pallas_forward_raw(B, XW, AW_row, BAND), AW_row, "row")
    print(f"[ratio] antidiag/row = {g_anti / g_row:.2f}x")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("parity", "both"):
        parity()
    if mode in ("time", "both"):
        timing(int(sys.argv[2]) if len(sys.argv) > 2 else 128,
               int(sys.argv[3]) if len(sys.argv) > 3 else 1024)
