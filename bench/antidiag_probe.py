"""Anti-diagonal (skewed-band) stepping experiment — VERDICT r3 item 5.

The lean row kernel spends 69% of its time in the 9-round in-row
max-plus scan (PERF.md §5b).  Stepping the DP along t = 2i+j instead
of rows removes ALL intra-step dependencies (deps land in steps t-1 and
t-2), so the scan disappears — at the cost of:

  * 2·XW steps instead of XW rows (each wavefront holds ~YS/2 of the
    YS band cells -> ~50% logical occupancy per vector);
  * a SECOND dynamic lane-window per step (b chars become
    lane-dependent: lanes index i, so bc = b[base(t)+k], a sliding
    window like the a chars; the row form broadcasts ONE b scalar);
  * two extra ±1 lane rolls per step for the prev-1 alignment
    (base(t) advances every other step).

This probe measures the per-step cost of a kernel with exactly that
structure (same loads/rolls/op counts; correctness of the DP values is
NOT the point — the recurrence shape and memory traffic are) against
the production lean-row kernel on the same (B, XW, YP) shapes, and
reports the implied GCUPS of a full anti-diagonal implementation.

Usage: python bench/antidiag_probe.py [B] [XW]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BAND = 150
YS = 2 * BAND + 1
YP = 384
GAP = -8


def build_antidiag(B: int, XW: int, AW: int, tile_t: int = 16):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = 2 * XW
    n_tiles = n_steps // tile_t

    def kernel(begin_ref, alen_ref, a_ref, b_ref, dirs_ref,
               prev1_ref, prev2_ref):
        tt = pl.program_id(0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, YP), 1)
        zero_f = j_idx * 0
        begin_a = begin_ref[:]
        a_len = alen_ref[:]

        def lane_window(ref, start, width):
            i_al = pl.multiple_of((start // 128) * 128, 128)
            wide = ref[:, pl.ds(i_al, width + 128)]
            return pltpu.roll(wide, i_al - start, axis=1)[:, :width]

        packed = jnp.zeros((B, YP), jnp.int32)
        for r in range(tile_t):
            t = tt * tile_t + r
            base = t // 2  # lane k holds cell i = base + k
            # a chars: pre-reversed window -> ascending slice (host
            # uploads a_rev); offset slides with t
            ac = lane_window(a_ref, t - base, YP)
            # b chars: lanes index i, so b[base + k] — a second
            # sliding window (the row kernel broadcasts ONE scalar)
            bc = lane_window(b_ref, base, YP)
            eq = ac == bc
            an = ac == 4
            bn = bc == 4
            sc = jnp.where(
                an & bn, jnp.int32(5),
                jnp.where(an | bn, jnp.int32(0),
                          jnp.where(eq, jnp.int32(5), jnp.int32(-4))))
            prev1 = prev1_ref[:]
            prev2 = prev2_ref[:]
            # deps: diag = prev2 same-lane; up/left = prev1 with a ±1
            # roll on alternating parity (base advance).  tile_t is
            # even, so parity(t) == parity(r) — a STATIC branch
            if r % 2 == 0:
                up = jnp.roll(prev1, -1, axis=1)
                left = prev1
            else:
                up = prev1
                left = jnp.roll(prev1, 1, axis=1)
            diag_acc = prev2 + sc
            up_v = up + GAP
            left_v = left + GAP
            # validity: j = t - 2i in [0, YS) and pos in [0, a_len)
            jj = (t - 2 * base) + zero_f - 2 * j_idx
            pos = begin_a + (t - base) + zero_f - j_idx - BAND
            valid = (jj >= 0) & (jj < YS) & (pos >= 0) & (pos < a_len)
            row = jnp.where(valid,
                            jnp.maximum(jnp.maximum(diag_acc, up_v),
                                        left_v), jnp.int32(0))
            dirs = jnp.where(
                row == diag_acc, jnp.int32(0),
                jnp.where(row == up_v, jnp.int32(1), jnp.int32(2)))
            packed = packed | (dirs << (2 * (r % 16)))
            prev2_ref[:] = prev1
            prev1_ref[:] = row
        dirs_ref[0, :, :] = packed

    scalar_spec = pl.BlockSpec((B, 1), lambda tt: (0, 0),
                               memory_space=pltpu.VMEM)
    seq_spec = pl.BlockSpec((B, AW), lambda tt: (0, 0),
                            memory_space=pltpu.VMEM)
    dirs_spec = pl.BlockSpec((1, B, YP), lambda tt: (tt, 0, 0),
                             memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[scalar_spec, scalar_spec, seq_spec, seq_spec],
        out_specs=[dirs_spec],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, B, YP), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((B, YP), jnp.int32),
                        pltpu.VMEM((B, YP), jnp.int32)],
    )

    def fn(begin_a, a_len, a_win, b_win):
        to_col = lambda v: jnp.asarray(v, jnp.int32).reshape(B, 1)
        return call(to_col(begin_a), to_col(a_len),
                    jnp.asarray(a_win, jnp.int32),
                    jnp.asarray(b_win, jnp.int32))[0]

    return jax.jit(fn)


def _fori_slope(make_body, K1=4, K2=24, reps=3):
    """bench.py's RTT-cancelling method: K chained kernels ON DEVICE
    with a data-dependent carry; per-kernel time = slope between two
    K points (upload/RTT/drain cancel).  Host-chained block_until_ready
    timing through the tunnel reported 172 GCUPS for a kernel whose
    honest rate is 24.7 — it must not be trusted."""
    import jax
    import jax.numpy as jnp

    loop = jax.jit(make_body)

    def t_of(K):
        t0 = time.perf_counter()
        acc = loop(np.int32(K))
        float(np.asarray(acc))
        return time.perf_counter() - t0

    t_of(1)  # compile + first-drain
    ts = min(t_of(K1) for _ in range(reps))
    tl = min(t_of(K2) for _ in range(reps))
    return (tl - ts) / (K2 - K1)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    XW = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    AW = 2 * XW + YP + 128

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a_win = rng.integers(0, 4, size=(B, AW)).astype(np.int32)
    b_win = rng.integers(0, 4, size=(B, AW)).astype(np.int32)
    begin_a = np.full(B, BAND, np.int32)
    a_len = np.full(B, AW, np.int32)

    from gam_ngs_tpu.ops.bsw_pallas import pallas_forward_raw

    anti_raw = build_antidiag(B, XW, AW)

    def anti_loop(K):
        def body(_, carry):
            b, acc = carry
            dirs = anti_raw(begin_a, a_len, jnp.asarray(a_win), b)
            t = dirs[0, 0, :1] & 1
            b = (b + t) & 3
            return b, acc + dirs[0, 0, 0]

        _, acc = jax.lax.fori_loop(
            0, K, body, (jnp.asarray(b_win), jnp.int32(0)))
        return acc

    t_anti = _fori_slope(anti_loop)

    prod_raw = pallas_forward_raw(B, XW, XW + YP, BAND)
    end_a = np.full(B, BAND + XW - 1, np.int32)
    x_size = np.full(B, XW, np.int32)
    fs = np.zeros(B, np.int32)
    aw2 = np.ascontiguousarray(a_win[:, :XW + YP])
    bw2 = np.ascontiguousarray(b_win[:, :XW])

    def prod_loop(K):
        def body(_, carry):
            b, acc = carry
            _d, last_row, _dv = prod_raw(jnp.asarray(aw2), b, begin_a,
                                         end_a, a_len, x_size, fs)
            t = last_row[0, :1] & 1
            b = (b + t) & 3
            return b, acc + last_row[0, 0]

        _, acc = jax.lax.fori_loop(
            0, K, body, (jnp.asarray(bw2), jnp.int32(0)))
        return acc

    t_prod = _fori_slope(prod_loop)

    cells = B * XW * YS
    print(f"B={B} XW={XW} (fori-slope, RTT-cancelled)")
    print(f"anti-diagonal probe: {t_anti*1e3:.2f} ms/kernel "
          f"({cells/t_anti/1e9:.1f} GCUPS-equivalent)")
    print(f"production row kernel: {t_prod*1e3:.2f} ms/kernel "
          f"({cells/t_prod/1e9:.1f} GCUPS)")
    print(f"ratio anti/prod: {t_anti/t_prod:.2f}x "
          f"({'anti wins' if t_anti < t_prod else 'row form wins'})")


if __name__ == "__main__":
    main()
