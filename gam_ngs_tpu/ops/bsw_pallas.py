"""Pallas TPU kernel for the batched banded-SW forward DP.

Same math as ops.bsw_batch.forward_builder (reference recurrence:
lib/src/alignment/banded_smith_waterman.cc:70-214), mapped to the TPU
explicitly rather than through an XLA scan:

  * the whole problem batch B rides the sublane axis and the padded
    band (YP lanes) rides the lane axis, so every row step is a handful
    of full-width (B, YP) VPU ops;
  * the previous score row lives in a VMEM scratch that persists across
    the row-tile grid — the carry never round-trips to HBM (the XLA
    scan materializes its carry per step, which costs ~8x the useful
    bandwidth and ran at 0.06 GCUPS on a v5e chip);
  * the grid walks statically-unrolled 16-row output tiles; the 2-bit
    traceback directions of 16 consecutive rows are packed into ONE
    int32 plane (static shift-or per row), so direction traffic is
    0.25 bytes per DP cell — 16x less than a byte matrix (Mosaic also
    lacks 8-bit vector truncation, which rules the naive layout out);
  * band characters for row i are the window slice a_win[:, i:i+YP].
    Mosaic requires lane-aligned slice starts, so the kernel reads the
    128-aligned superset and lane-rotates by (i mod 128)
    (pltpu.roll with a traced shift);
  * the in-row dependency row[j] = max(base[j], row[j-1] + slope_j) is
    a Hillis-Steele doubling scan over (value, slope) pairs of max-plus
    affine maps — log2(YP) shifted maxima, all VPU;
  * the pos_a == end_a diagonal needs one score per row; each row
    deposits its diagonal cell into lane jd of a (B, YP) accumulator
    (each row's jd is distinct), and a cheap XLA gather after the
    kernel expands it to the (B, XW) per-row layout the host expects.

The kernel is cell-exact vs the oracle (tests/test_bsw_pallas.py runs
the engine with backend="pallas" in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import numpy as np

from .bsw_ref import FORCE_MAXGAP_LEN, GAP

NEG = -(1 << 29)

_DIR_DIAG, _DIR_UP, _DIR_LEFT = 0, 1, 2


def _build_kernel(B: int, XW: int, AW: int, band: int, tile_x: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    YS = 2 * band + 1
    YP = -(-(YS + 1) // 128) * 128
    ymax = YS - 1
    n_scan = max(1, int(np.ceil(np.log2(YP))))

    def kernel(begin_ref, end_ref, alen_ref, xsize_ref, fs_ref,
               a_ref, b_ref, dirs_ref, lastrow_ref, dvacc_ref, prev_ref):
        # Mosaic cannot lower selects with boolean operands or with
        # broadcast (B, 1) i1 conditions ("Unsupported target bitwidth
        # for truncation"), so ALL boolean algebra below is int32 mask
        # arithmetic: mk() turns a full-shape comparison into a 0/1
        # mask, sel(m, a, b) is the arithmetic select b + (a-b)*m, and
        # jnp.where only ever sees full-shape comparisons with int32
        # operands.
        tx = pl.program_id(0)

        j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, YP), 1)
        zero_f = j_idx * 0              # broadcast helper to (B, YP)

        def mk(cond):
            return jnp.where(cond, 1, 0)

        def sel(m, a, b):
            return b + (a - b) * m

        in_band_m = mk(j_idx < YS)
        last_m = mk(j_idx == ymax)
        first_m = mk(j_idx == 0)

        begin_a = begin_ref[:]          # (B, 1) int32
        end_a = end_ref[:]
        a_len = alen_ref[:]
        x_size = xsize_ref[:]
        fs_m = fs_ref[:]                # (B, 1) int32, 0/1
        jd_base = end_a - begin_a + band

        @pl.when(tx == 0)
        def _():
            lastrow_ref[:] = jnp.zeros((B, YP), jnp.int32)
            dvacc_ref[:] = jnp.zeros((B, YP), jnp.int32)

        def lane_window(ref, start, width):
            """ref[:, start:start+width] for arbitrary traced start.

            int32 up-cast first: Mosaic's dynamic rotate is 32-bit only.
            """
            i_al = pl.multiple_of((start // 128) * 128, 128)
            wide = ref[:, pl.ds(i_al, width + 128)]
            return pltpu.roll(wide, i_al - start, axis=1)[:, :width]

        def left_scan(c, s):
            # prefix-compose f_j(x) = max(c_j, s_j + x) left-to-right
            for k in range(n_scan):
                d = 1 << k
                if d >= YP:
                    break
                c_sh = jnp.roll(c, d, axis=1)
                s_sh = jnp.roll(s, d, axis=1)
                edge = j_idx < d
                c_sh = jnp.where(edge, NEG, c_sh)
                s_sh = jnp.where(edge, 0, s_sh)
                # combine(left=(c_sh,s_sh), cur=(c,s)):
                #   c' = max(c, s + c_left);  s' = s_left + s
                c = jnp.maximum(c, jnp.maximum(s + c_sh, NEG))
                s = jnp.maximum(s_sh + s, NEG)
            return c

        def compute_row(i, prev):
            """Returns (row, dirs) for global row i given prev row."""
            pos = begin_a - band + i + j_idx
            # a chars: aligned superset + dynamic lane rotation
            ac = lane_window(a_ref, i, YP)
            # b char: aligned 128-lane window, rotate target into lane 0
            b_al = pl.multiple_of((i // 128) * 128, 128)
            bw = b_ref[:, pl.ds(b_al, 128)]
            bc = pltpu.roll(bw, b_al - i, axis=1)[:, :1] + zero_f

            eq_m = mk(ac == bc)
            an_m = mk(ac == 4)
            bn_m = mk(bc == 4)
            sc = (-4 + 9 * eq_m) * (1 - jnp.maximum(an_m, bn_m)) \
                + 5 * an_m * bn_m
            posge0_m = mk(pos >= 0)
            valid_pos_m = posge0_m * mk(pos < a_len)
            row0_m = jnp.where(i == 0, 1, 0)        # scalar 0/1
            fm_le_m = jnp.where(i <= FORCE_MAXGAP_LEN, 1, 0)

            prev_up = jnp.roll(prev, -1, axis=1)
            pos0_m = mk(pos == 0)

            # --- general rows (i >= 1) ---
            up = sel(last_m, GAP + zero_f, prev_up + GAP)
            fresh_m = pos0_m * ((1 - fs_m) + fs_m * fm_le_m)
            fresh_forced_m = fs_m * pos0_m * (1 - fm_le_m)
            base_fresh = sel(last_m, jnp.maximum(sc, GAP),
                             jnp.maximum(jnp.maximum(sc, up), GAP))
            base_forced = sel(last_m, sc, jnp.maximum(sc, up))
            diag_acc = prev + sc
            base_gen = sel(last_m, diag_acc, jnp.maximum(diag_acc, up))
            base_g = (base_gen + (base_fresh - base_gen) * fresh_m
                      + (base_forced - base_gen) * fresh_forced_m)
            allow_left_g_m = ((1 - fresh_m - fresh_forced_m)
                              * (1 - first_m))
            valid_g_m = valid_pos_m * in_band_m
            s_g = sel(valid_g_m * allow_left_g_m, GAP + zero_f,
                      NEG + zero_f)

            # --- row 0 ---
            posle_m = mk(pos <= FORCE_MAXGAP_LEN)
            posgtfm_m = mk(pos > FORCE_MAXGAP_LEN)
            # force_start lanes also bound pos < a_len (the reference
            # throws out_of_range there; see ops/bsw_ref.py)
            cond_a_m = (fs_m * posle_m * valid_pos_m
                        + (1 - fs_m) * valid_pos_m)
            cond_b_m = fs_m * posgtfm_m * mk(pos < a_len)
            allow0_m = mk(pos > 0) * (1 - first_m)
            base_0 = sel(cond_b_m, sc, jnp.maximum(sc, GAP))
            valid_0_m = jnp.maximum(cond_a_m, cond_b_m) * in_band_m
            s_0 = sel(valid_0_m * allow0_m, zero_f, NEG + zero_f)

            base = sel(row0_m, base_0, base_g)
            valid_m = sel(row0_m, valid_0_m, valid_g_m)
            s = sel(row0_m, s_0, s_g)

            c = base * valid_m
            row = left_scan(c, s) * valid_m

            # --- traceback directions (DIAG=0, UP=1, LEFT=2) ---
            left_blocked_m = fs_m * (1 - fm_le_m)
            inner_m = jnp.maximum(last_m,
                                  mk(row == GAP) * (1 - left_blocked_m))
            d_pos0 = (1 - mk(row == sc)) * sel(inner_m, 2 + zero_f,
                                               1 + zero_f)
            nz_m = 1 - row0_m                      # scalar: i > 0
            diag_t = prev * nz_m + sc
            up_t = sel(nz_m * (1 - last_m), prev_up + GAP, GAP + zero_f)
            adj_m = fs_m * row0_m                  # (B, 1)
            up_t = up_t + (sel(posge0_m * posle_m, GAP + zero_f,
                               NEG + zero_f) - up_t) * adj_m
            mid_m = (1 - first_m) * (1 - last_m)
            inner2 = sel(mid_m * mk(row == up_t), 1 + zero_f,
                         sel(mid_m, 2 + zero_f, 1 + last_m))
            d_gen = (1 - mk(row == diag_t)) * inner2
            dirs = sel(pos0_m, d_pos0, d_gen)
            return row, dirs

        packed = jnp.zeros((B, YP), jnp.int32)
        for r in range(tile_x):  # static unroll: shifts stay constants
            i = tx * tile_x + r
            prev = prev_ref[:]
            row, dirs = compute_row(i, prev)
            packed = packed | (dirs << (2 * r))
            # deposit this row's pos_a == end_a diagonal cell in lane jd
            jd = (jd_base - i) + zero_f           # (B, YP), unique per row
            hit_m = mk(j_idx == jd) * mk(jd >= 0) * mk(jd < YP)
            dvacc_ref[:] = dvacc_ref[:] + (row - dvacc_ref[:]) * hit_m
            # final row of each problem (x_size varies inside the batch)
            keep_m = mk((x_size - 1) + zero_f == i)
            lastrow_ref[:] = (lastrow_ref[:]
                              + (row - lastrow_ref[:]) * keep_m)
            prev_ref[:] = row
        dirs_ref[0, :, :] = packed

    return kernel


def _build_lean_kernel(B: int, XW: int, AW: int, band: int, tile_x: int,
                       row_offset: int):
    """Kernel for rows i >= row_offset where row_offset > band and
    begin_a >= 0 batch-wide: pos = begin_a - band + i + j > 0 on every
    lane, so the pos==0 / row-0 / force-fresh branches of the full body
    are statically dead, the valid set is a lane PREFIX (in-band ∩
    pos<a_len, both suffix cuts), and the in-row scan collapses to the
    constant-slope form row[j] = max over k<=j of (base[k] - 8(j-k)) —
    propagation through the invalid suffix only ever feeds other suffix
    lanes, which the final valid mask zeroes, so dropping the per-lane
    slope track of the (value, slope) composition is exact.  ~2.5x
    fewer VPU ops per row than the full body; it runs as its OWN
    pallas_call (an unpredicated body keeps Mosaic's grid pipelining —
    a pl.when split of one kernel measured SLOWER than no split at
    all: 2.99 ms vs 2.61 ms vs this design's 1.63 ms per
    128x1024-row batch).

    Carries (prev row, last-row accumulator, diagonal accumulator) come
    in as inputs from the full-prefix call and are re-emitted as
    outputs.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    YS = 2 * band + 1
    YP = -(-(YS + 1) // 128) * 128
    ymax = YS - 1
    n_scan = max(1, int(np.ceil(np.log2(YP))))

    def kernel(begin_ref, end_ref, alen_ref, xsize_ref,
               a_ref, b_ref, prev_in, lastrow_in, dvacc_in,
               dirs_ref, lastrow_ref, dvacc_ref, prev_ref):
        tx = pl.program_id(0)

        j_idx = jax.lax.broadcasted_iota(jnp.int32, (B, YP), 1)
        zero_f = j_idx * 0

        begin_a = begin_ref[:]          # (B, 1) int32
        end_a = end_ref[:]
        a_len = alen_ref[:]
        x_size = xsize_ref[:]
        jd_base = end_a - begin_a + band

        @pl.when(tx == 0)
        def _():
            prev_ref[:] = prev_in[:]
            lastrow_ref[:] = lastrow_in[:]
            dvacc_ref[:] = dvacc_in[:]

        def lane_window(ref, start, width):
            i_al = pl.multiple_of((start // 128) * 128, 128)
            wide = ref[:, pl.ds(i_al, width + 128)]
            return pltpu.roll(wide, i_al - start, axis=1)[:, :width]

        last_b = j_idx == ymax
        first_b = j_idx == 0
        mid_b = (~first_b) & (~last_b)
        in_band_b = j_idx < YS
        edge_dir = jnp.where(last_b, jnp.int32(_DIR_LEFT),
                             jnp.int32(_DIR_UP))
        jd_f = jd_base + zero_f             # (B, YP)
        xs1_f = (x_size - 1) + zero_f
        lim_f = (a_len - begin_a) + band + zero_f  # pos < a_len bound

        packed = jnp.zeros((B, YP), jnp.int32)
        for r in range(tile_x):
            i = row_offset + tx * tile_x + r
            prev = prev_ref[:]
            ac = lane_window(a_ref, i, YP)
            b_al = pl.multiple_of((i // 128) * 128, 128)
            bw = b_ref[:, pl.ds(b_al, 128)]
            bc = pltpu.roll(bw, b_al - i, axis=1)[:, :1] + zero_f
            eq = ac == bc
            an = ac == 4
            bn = bc == 4
            sc = jnp.where(
                an & bn, jnp.int32(5),
                jnp.where(an | bn, jnp.int32(0),
                          jnp.where(eq, jnp.int32(5), jnp.int32(-4))))
            prev_up = jnp.roll(prev, -1, axis=1)
            up = jnp.where(last_b, jnp.int32(GAP), prev_up + GAP)
            diag_acc = prev + sc
            base = jnp.where(last_b, diag_acc, jnp.maximum(diag_acc, up))
            j_plus_i = j_idx + i
            valid = in_band_b & (j_plus_i < lim_f)
            c = jnp.where(valid, base, jnp.int32(0))
            for k in range(n_scan):
                d = 1 << k
                if d >= YP:
                    break
                c_sh = jnp.roll(c, d, axis=1)
                c_sh = jnp.where(j_idx < d, NEG, c_sh)
                c = jnp.maximum(c, c_sh + GAP * d)
            row = jnp.where(valid, c, jnp.int32(0))
            # traceback dirs, reference tie-break order
            is_up = row == up
            inner = jnp.where(mid_b,
                              jnp.where(is_up, jnp.int32(_DIR_UP),
                                        jnp.int32(_DIR_LEFT)),
                              edge_dir)
            dirs = jnp.where(row == diag_acc, jnp.int32(_DIR_DIAG), inner)
            packed = packed | (dirs << (2 * r))
            dvacc_ref[:] = jnp.where(j_plus_i == jd_f, row, dvacc_ref[:])
            lastrow_ref[:] = jnp.where(xs1_f == i, row, lastrow_ref[:])
            prev_ref[:] = row
        dirs_ref[0, :, :] = packed

    return kernel


PACK = 16  # DP rows per packed int32 direction plane


def pallas_forward_raw(B: int, XW: int, AW: int, band: int,
                       tile_x: int = PACK, interpret: bool = False,
                       all_full: bool = False):
    """Compiled Pallas forward, same inputs as
    ops.bsw_batch.forward_builder: fn(a_win, b_win, begin_a, end_a,
    a_len, x_size, force_start) -> (packed_dirs, last_row, diag_vals)
    where packed_dirs is (XW // 16, B, YP) int32 — problem t's direction
    at row i, band offset j is
    (packed_dirs[i // 16, t, j] >> (2 * (i % 16))) & 3."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if XW % tile_x != 0:
        raise ValueError(f"XW={XW} not a multiple of tile_x={tile_x}")
    if XW % 128 != 0:
        raise ValueError(f"XW={XW} must be lane-aligned (128)")
    YS = 2 * band + 1
    YP = -(-(YS + 1) // 128) * 128
    if AW < XW + YP:
        raise ValueError(f"AW={AW} must be >= XW+YP={XW + YP}")
    n_tiles = XW // tile_x
    # tiles 0..full_tiles-1 cover every row that can contain a pos==0
    # lane (i <= band, for begin_a >= 0); the rest run the lean kernel.
    # all_full=True forces every tile through the exact row body — the
    # engine selects it when a batch contains begin_a < 0 (reference
    # tail alignments may pass negative begins, PctgBuilder.cc:1549),
    # which would re-enable pos==0 lanes at arbitrary depths.
    full_tiles = n_tiles if all_full else min(n_tiles, band // tile_x + 1)
    lean_tiles = n_tiles - full_tiles

    kernel = _build_kernel(B, XW, AW, band, tile_x)

    scalar_spec = pl.BlockSpec((B, 1), lambda tx: (0, 0),
                               memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((B, YP), lambda tx: (0, 0),
                            memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((B, AW), lambda tx: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((B, XW), lambda tx: (0, 0),
                          memory_space=pltpu.VMEM)
    dirs_spec = pl.BlockSpec((1, B, YP), lambda tx: (tx, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((B, YP), jnp.int32)

    if lean_tiles == 0:
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[scalar_spec] * 5 + [a_spec, b_spec],
            out_specs=[dirs_spec, acc_spec, acc_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, B, YP), jnp.int32),
                acc_shape, acc_shape,
            ],
            scratch_shapes=[pltpu.VMEM((B, YP), jnp.int32)],
            interpret=interpret,
        )
    else:
        # full-prefix call: the prev-row carry becomes a 4th output so
        # the lean-suffix call (its own pallas_call — an unpredicated
        # body keeps Mosaic's grid pipelining) can resume from it
        call_full = pl.pallas_call(
            kernel,
            grid=(full_tiles,),
            in_specs=[scalar_spec] * 5 + [a_spec, b_spec],
            out_specs=[dirs_spec, acc_spec, acc_spec, acc_spec],
            out_shape=[
                jax.ShapeDtypeStruct((full_tiles, B, YP), jnp.int32),
                acc_shape, acc_shape, acc_shape,
            ],
            interpret=interpret,
        )
        lean_kernel = _build_lean_kernel(B, XW, AW, band, tile_x,
                                         full_tiles * tile_x)
        call_lean = pl.pallas_call(
            lean_kernel,
            grid=(lean_tiles,),
            in_specs=[scalar_spec] * 4
            + [a_spec, b_spec, acc_spec, acc_spec, acc_spec],
            out_specs=[dirs_spec, acc_spec, acc_spec],
            out_shape=[
                jax.ShapeDtypeStruct((lean_tiles, B, YP), jnp.int32),
                acc_shape, acc_shape,
            ],
            scratch_shapes=[pltpu.VMEM((B, YP), jnp.int32)],
            interpret=interpret,
        )

    def fn(a_win, b_win, begin_a, end_a, a_len, x_size, force_start):
        to_col = lambda v: jnp.asarray(v, jnp.int32).reshape(B, 1)
        begin_c, end_c = to_col(begin_a), to_col(end_a)
        alen_c, xs_c = to_col(a_len), to_col(x_size)
        a32 = jnp.asarray(a_win, jnp.int32)
        b32 = jnp.asarray(b_win, jnp.int32)
        if lean_tiles == 0:
            dirs, last_row, dvacc = call(
                begin_c, end_c, alen_c, xs_c, to_col(force_start),
                a32, b32)
        else:
            dirs_f, lr1, dv1, prev1 = call_full(
                begin_c, end_c, alen_c, xs_c, to_col(force_start),
                a32, b32)
            dirs_l, last_row, dvacc = call_lean(
                begin_c, end_c, alen_c, xs_c, a32, b32, prev1, lr1, dv1)
            dirs = jnp.concatenate([dirs_f, dirs_l], axis=0)
        # the diagonal accumulator stays in its compact (B, YP) lane
        # layout (each lane jj is written by exactly one row,
        # i = jd_base - jj): the host reads dvacc[t, jj] directly, and
        # the download is YP lanes instead of an XW-wide expansion —
        # 40x fewer bytes at XW=32768 (decisive on thin D2H links)
        return dirs, last_row, dvacc

    return fn


@functools.lru_cache(maxsize=64)
def pallas_forward(B: int, XW: int, AW: int, band: int,
                   tile_x: int = PACK, interpret: bool = False,
                   all_full: bool = False):
    import jax

    return jax.jit(pallas_forward_raw(B, XW, AW, band, tile_x, interpret,
                                      all_full))


# ---------------------------------------------------------------------------
# Anti-diagonal (skewed-band) kernel — the production promotion of
# bench/antidiag_probe.py (measured 1.57x over the row form: the
# 9-round in-row max-plus scan is 69% of lean-row time, and stepping
# along t = 2i + j removes ALL intra-step dependencies).
#
# Coordinate map (band storage sw[i][j] of the reference,
# banded_smith_waterman.cc:95-214; i = B row, j = band diagonal,
# A-pos = begin_a + i + j - band):
#
#   step t = 2i + j;  lane k = t//2 - i  =>  i = t//2 - k,
#   j = (t & 1) + 2k  (cells of one step share j-parity, <= band+1 of
#   them, so lanes shrink 384 -> 256 at band=150).
#
# Dependency lanes (base(t) = t//2 advances by exactly 1 every 2 steps,
# uniformly — no regime change):
#   diag (i-1, j)   -> prev2 SAME lane          (always)
#   up   (i-1, j+1) -> prev1[k]   (t even) / prev1[k+1] (t odd)
#   left (i,   j-1) -> prev1[k-1] (t even) / prev1[k]   (t odd)
# i.e. ONE parity-static roll of prev1 per step, no scan.
#
# Character loads: A-pos = (begin_a - band + ceil(t/2)) + k — an
# ASCENDING sliding window of the band-aligned a_win (no host-side
# reversal needed); b char b[i] = b[t//2 - k] — a sliding window of the
# REVERSED b (the wrapper flips b in XLA and pads the front).
#
# Row-0 / pos==0 / force_start semantics are per-lane masks here (i is
# a lane quantity, not a grid row).  Like the row form, the kernel
# splits into a full prefix (exact masks, t <= 2*band+2 — the only
# steps that can hold row-0/pos==0 lanes when begin_a >= 0) and a lean
# suffix with no special-case masks; begin_a < 0 batches (reference
# tail windows, PctgBuilder.cc:1549) run the exact body on every step.
#
# Outputs: step-major packed direction planes (T/16, B, KW) — dir of
# cell (x, y) lives at plane (2x+y)//16, lane (2x+y)//2 - x, bit
# 2*((2x+y) & 15) — plus last-row and pos_a==end_a diagonal
# accumulators deposited in k-space per parity and interleaved to the
# j-space layout (B, 2*KW) by an XLA epilogue, so the device find-max
# (_find_max_builder) is reused unchanged.
# ---------------------------------------------------------------------------


def antidiag_dims(XW: int, band: int) -> tuple[int, int, int, int]:
    """(KW, T, AW, BW) for the anti-diagonal kernel.

    KW: lane width (cells per step <= band+1, padded to 128);
    T:  step count = 2*(XW-1) + YS - 1 + 1, padded to the 16-step plane;
    AW: a_win width — max window start ceil(t_max/2) plus the WIDE
        aligned-read span of the lane rotation;
    BW: flipped-b buffer width — front pad ANTI_BPAD covers starts down
        to XW-1-base_max (= -(YS-1)//2) plus the WIDE span.

    WIDE (the aligned superset each dynamic lane rotation reads) must
    hold a POWER-OF-TWO number of 128-lane vregs: pltpu.roll with a
    traced shift silently miscompiles on 3-vreg (384-lane) arrays —
    measured on a v5e chip (interpret mode is exact, compiled output is
    the unrotated window), so KW+128 alone is not a safe span.
    """
    YS = 2 * band + 1
    KW = -(-(band + 1) // 128) * 128
    WIDE = 256
    while WIDE < KW + 128:
        WIDE *= 2
    T = -(-(2 * (XW - 1) + YS) // 16) * 16
    AW = XW + -(-((YS + 17) // 2 + WIDE) // 128) * 128
    BW = ANTI_BPAD + XW + WIDE
    return KW, T, AW, BW


def _antidiag_wide(KW: int) -> int:
    w = 256
    while w < KW + 128:
        w *= 2
    return w


ANTI_BPAD = 384  # front pad of the flipped-b buffer (>= (YS-1)//2 + 127)



def _build_antidiag_kernel(B: int, XW: int, band: int, tile_t: int,
                           lean: bool, tile0: int):
    """One anti-diagonal call body.

    lean=False: the exact per-cell case analysis of fill_matrix
    (bsw_ref.py:48-106) — row-0 branches, pos==0 fresh/forced starts,
    force_start gating — as per-lane masks.

    lean=True: steps t >= 2*band+3 with begin_a >= 0 batch-wide.  There
    chalf = ceil(t/2) > band+1, so pos = begin_a - band + chalf + k >= 2
    on every lane (no pos==0 / row-0 cells), and j < YS already caps
    k <= band < base (no i < 0 lanes): the body drops ALL special-case
    masks — `pos` itself is never materialized (validity and deposits
    reduce to lane-index compares against hoisted (B, 1) thresholds).
    Mirrors the row form's full/lean split — pl.when predication inside
    one kernel was measured SLOWER than no split (PERF.md §2).

    tile0: global tile offset of this call's grid (lean call resumes at
    the full prefix's end).

    Measured-cost notes (v5e):
      * carries (prev1/prev2 + 4 deposit accumulators) are VALUE-carried
        through the 16-step unroll, refs written once per tile — the
        first cut read+wrote 6 VMEM refs per step and ran SLOWER than
        the row kernel (16.9 vs 24.7 GCUPS) for that reason alone;
      * steps 2m and 2m+1 share base = m, so ONE dynamic a-window and
        ONE dynamic b-window serve each step PAIR (the odd step's
        a chars are a static +1 lane shift; its b chars are identical) —
        dynamic lane rotations are the dominant per-step cost;
      * deposits are single lane-index compares (k == jdb - chalf for
        the pos_a==end_a diagonal, k == base - (x_size-1) for the last
        row): each (parity, lane) pair is hit by exactly one step, rows
        are already 0 on invalid lanes, and the device find-max masks
        out-of-range candidates, so no validity AND is needed.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    YS = 2 * band + 1
    ymax = YS - 1
    KW = -(-(band + 1) // 128) * 128
    WIDE = _antidiag_wide(KW)  # pow2-vreg span: see antidiag_dims
    assert tile_t % 2 == 0  # parity(t) == parity(r): static roll choice
    # window-load grouping: GP step-PAIRS share one dynamic a-window
    # and one dynamic b-window load; pairs inside the group shift by
    # SMALL STATIC lane offsets (<= GP).  Dynamic lane rotations were
    # 44% of the lean step (measured ablation); the group turns 2 per
    # pair into 2 per GP pairs.  GP is bounded by the WIDE slack
    # (alignment 127 + GP extra lanes must fit) and must divide the
    # tile's pair count.
    slack = WIDE - KW - 127
    GP = tile_t // 2
    while GP > 1 and (GP > slack or (tile_t // 2) % GP):
        GP //= 2

    def kernel(begin_ref, end_ref, alen_ref, xsize_ref, fs_ref,
               a_ref, b_ref, *rest):
        if lean:
            (p1_in, p2_in, lre_in, lro_in, dve_in, dvo_in) = rest[:6]
            rest = rest[6:]
        (dirs_ref, lre_ref, lro_ref, dve_ref, dvo_ref,
         p1_ref, p2_ref) = rest
        tt = pl.program_id(0)

        k_idx = jax.lax.broadcasted_iota(jnp.int32, (B, KW), 1)

        begin_a = begin_ref[:]          # (B, 1) int32
        end_a = end_ref[:]
        a_len = alen_ref[:]
        x_size = xsize_ref[:]

        @pl.when(tt == 0)
        def _():
            if lean:
                p1_ref[:] = p1_in[:]
                p2_ref[:] = p2_in[:]
                lre_ref[:] = lre_in[:]
                lro_ref[:] = lro_in[:]
                dve_ref[:] = dve_in[:]
                dvo_ref[:] = dvo_in[:]
            else:
                z = jnp.zeros((B, KW), jnp.int32)
                p1_ref[:] = z
                p2_ref[:] = z
                lre_ref[:] = z
                lro_ref[:] = z
                dve_ref[:] = z
                dvo_ref[:] = z

        def lane_wide(ref, start):
            i_al = pl.multiple_of((start // 128) * 128, 128)
            wide = ref[:, pl.ds(i_al, WIDE)]
            return pltpu.roll(wide, i_al - start, axis=1)

        prev1 = p1_ref[:]
        prev2 = p2_ref[:]
        lre, lro = lre_ref[:], lro_ref[:]
        dve, dvo = dve_ref[:], dvo_ref[:]
        if not lean:
            fs_m = fs_ref[:] + k_idx * 0       # 0/1 broadcast (B, KW)
            fsb = fs_m == 1
        # static per-parity lane masks (j = parity + 2k; ymax is even,
        # so odd-parity steps never touch j == 0 or j == ymax)
        jlt_e = (2 * k_idx) < YS
        jlt_o = (1 + 2 * k_idx) < YS
        jmax_e = (2 * k_idx) == ymax
        j0_e = k_idx == 0
        # hoisted per-problem lane thresholds
        klim = a_len - begin_a + band   # pos < a_len  <=> k < klim - chalf
        jdb = end_a - begin_a + band    # pos == end_a <=> k == jdb - chalf
        xs1 = x_size - 1

        def sl(wide, s):
            # static small-shift window extraction from a loaded span
            return (wide[:, :KW] if s == 0
                    else jnp.roll(wide, -s, axis=1)[:, :KW])

        packed = jnp.zeros((B, KW), jnp.int32)
        wide_a = wide_b = base0 = None
        for r in range(tile_t):
            t = (tt + tile0) * tile_t + r
            base = t // 2                       # traced scalar
            par = r & 1                         # static: parity(t)
            chalf = base + par                  # ceil(t/2)
            g = (r >> 1) % GP                   # pair index in group

            if par == 0 and g == 0:
                base0 = base
                # a chars ascend with chalf = base0 + g + par: one load
                # at base0 serves the group via static shifts 0..GP
                wide_a = lane_wide(a_ref, base0)
                # b[i] = b[base-k] = fb[XW-1-base+k]: starts DESCEND
                # with g, so load at the group's smallest start and
                # shift back up by GP-1-g
                wide_b = lane_wide(
                    b_ref, ANTI_BPAD + (XW - 1) - (base0 + GP - 1))
            ac = sl(wide_a, g + par)
            bc = sl(wide_b, GP - 1 - g)
            eq = ac == bc
            an = ac == 4
            bn = bc == 4
            sc = jnp.where(
                an & bn, jnp.int32(5),
                jnp.where(an | bn, jnp.int32(0),
                          jnp.where(eq, jnp.int32(5), jnp.int32(-4))))

            if par == 0:
                up_raw = prev1                       # sw[i-1][j+1]
                left_raw = jnp.roll(prev1, 1, axis=1)   # sw[i][j-1]
            else:
                up_raw = jnp.roll(prev1, -1, axis=1)
                left_raw = prev1

            dv = prev2 + sc
            if lean:
                # NO validity mask: an out-of-range cell (pos >= a_len,
                # i >= x_size, j >= YS) is never read by an in-range
                # cell — up is excluded at j==ymax, left at j==0,
                # row i never feeds rows <= i, and pos >= a_len deps
                # only reach other pos >= a_len cells — and both the
                # find-max and the traceback walk stay inside the valid
                # region, so garbage lanes cost nothing (saves the
                # 2 threshold compares + 2 ANDs + select per step; the
                # drift is bounded: <= +5/step keeps |values| << 2^31)
                if par == 0:
                    uv = jnp.where(jmax_e, NEG, up_raw + GAP)
                    lv = jnp.where(j0_e, NEG, left_raw + GAP)
                else:
                    uv = up_raw + GAP
                    lv = left_raw + GAP
                row = jnp.maximum(dv, jnp.maximum(uv, lv))
                # traceback dirs, reference tie-break order (:222-303)
                if par == 0:
                    mid = (~j0_e) & ~jmax_e
                    dirs = jnp.where(
                        row == dv, jnp.int32(_DIR_DIAG),
                        jnp.where(mid & (row == uv), jnp.int32(_DIR_UP),
                                  jnp.where(mid, jnp.int32(_DIR_LEFT),
                                            jnp.where(~jmax_e,
                                                      jnp.int32(_DIR_UP),
                                                      jnp.int32(_DIR_LEFT)
                                                      ))))
                else:
                    dirs = jnp.where(
                        row == dv, jnp.int32(_DIR_DIAG),
                        jnp.where(row == uv, jnp.int32(_DIR_UP),
                                  jnp.int32(_DIR_LEFT)))
            else:
                i_f = base - k_idx              # row index (lane map)
                pos = (begin_a - band + chalf) + k_idx
                if par == 0:
                    m_jmax, m_j0, m_jlt = jmax_e, j0_e, jlt_e
                else:
                    false_v = k_idx < 0
                    m_jmax, m_j0, m_jlt = false_v, false_v, jlt_o
                valid_b = (m_jlt & (i_f >= 0) & (i_f < x_size)
                           & (pos >= 0) & (pos < a_len))
                m_i0 = i_f == 0
                m_pos0 = pos == 0
                # branch classification (fill_matrix, bsw_ref.py:48-106)
                m_i0B = m_i0 & fsb & (pos > FORCE_MAXGAP_LEN)
                m_forced = ((~m_i0) & m_pos0 & fsb
                            & (i_f > FORCE_MAXGAP_LEN))
                m_fresh = (~m_i0) & m_pos0 & ~m_forced
                m_gen = (~m_i0) & ~m_pos0
                # diag: prev2 + sc everywhere — fresh/forced/row-0 cells
                # read a prev2 lane that was invalid (pos-1 < 0 or
                # i-1 < 0), stored 0, so it degenerates to sc exactly
                inc_up = (m_i0 & ~m_i0B) | ((~m_i0) & ~m_jmax)
                uv = jnp.where(inc_up, up_raw + GAP, NEG)
                # left: row 0 takes sw[0][j-1] UNPENALIZED (the
                # reference's row-0 quirk, :120/:128); fresh cells take
                # constant GAP; general row[j-1] + GAP; forced none
                lv = jnp.where(m_i0 & (pos > 0) & ~m_j0, left_raw,
                               jnp.where(m_fresh, jnp.int32(GAP),
                                         jnp.where(m_gen & ~m_j0,
                                                   left_raw + GAP, NEG)))
                row = jnp.where(valid_b,
                                jnp.maximum(dv, jnp.maximum(uv, lv)),
                                jnp.int32(0))
                # traceback dirs, reference tie-break order (:222-303)
                left_blocked = fsb & (i_f > FORCE_MAXGAP_LEN)
                d_pos0 = jnp.where(
                    row == sc, jnp.int32(_DIR_DIAG),
                    jnp.where(m_jmax | ((row == GAP) & ~left_blocked),
                              jnp.int32(_DIR_LEFT), jnp.int32(_DIR_UP)))
                up_t = jnp.where((i_f > 0) & ~m_jmax, up_raw + GAP,
                                 jnp.int32(GAP))
                up_t = jnp.where(
                    fsb & m_i0,
                    jnp.where((pos >= 0) & (pos <= FORCE_MAXGAP_LEN),
                              jnp.int32(GAP), NEG), up_t)
                mid = (~m_j0) & ~m_jmax
                d_gen = jnp.where(
                    row == dv, jnp.int32(_DIR_DIAG),
                    jnp.where(mid & (row == up_t), jnp.int32(_DIR_UP),
                              jnp.where(mid, jnp.int32(_DIR_LEFT),
                                        jnp.where(~m_jmax,
                                                  jnp.int32(_DIR_UP),
                                                  jnp.int32(_DIR_LEFT)))))
                dirs = jnp.where(m_pos0, d_pos0, d_gen)
            packed = packed | (dirs << (2 * r))

            # deposits (k-space, per parity; epilogue interleaves to j)
            dg_hit = k_idx == (jdb - chalf)
            lr_hit = k_idx == (base - xs1)
            if par == 0:
                dve = jnp.where(dg_hit, row, dve)
                lre = jnp.where(lr_hit, row, lre)
            else:
                dvo = jnp.where(dg_hit, row, dvo)
                lro = jnp.where(lr_hit, row, lro)
            prev2 = prev1
            prev1 = row
        dirs_ref[0, :, :] = packed
        p1_ref[:] = prev1
        p2_ref[:] = prev2
        lre_ref[:] = lre
        lro_ref[:] = lro
        dve_ref[:] = dve
        dvo_ref[:] = dvo

    return kernel




def pallas_forward_antidiag_raw(B: int, XW: int, band: int,
                                tile_t: int = PACK,
                                interpret: bool = False,
                                all_full: bool = False):
    """Anti-diagonal forward: fn(a_win, b_win, begin_a, end_a, a_len,
    x_size, force_start) -> (packed_dirs, last_row, diag_vals).

    a_win is (B, AW) band-aligned as in forward_builder (AW from
    antidiag_dims); b_win is (B, XW) in NATURAL order — the wrapper
    flips and front-pads it in XLA.  packed_dirs is (T//16, B, KW)
    int32, step-major: the direction of band cell (x, y) is
    (packed_dirs[(2x+y)//16, t, (2x+y)//2 - x] >> (2*((2x+y) & 15))) & 3.
    last_row/diag_vals come back in the j-space (B, 2*KW) layout of the
    row kernel (lane j = band diagonal), so find-max code is shared.

    all_full=True runs the exact body on every step — required when the
    batch has begin_a < 0 (reference tail windows, PctgBuilder.cc:1549:
    pos==0 lanes then appear at arbitrary depth).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    KW, T, AW, BW = antidiag_dims(XW, band)
    n_tiles = T // tile_t
    # full prefix covers every step that can hold a row-0 or pos==0
    # lane when begin_a >= 0 batch-wide: t <= 2*band + 2
    full_tiles = n_tiles if all_full else min(
        n_tiles, -(-(2 * band + 3) // tile_t))
    lean_tiles = n_tiles - full_tiles

    scalar_spec = pl.BlockSpec((B, 1), lambda tt: (0, 0),
                               memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((B, KW), lambda tt: (0, 0),
                            memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((B, AW), lambda tt: (0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((B, BW), lambda tt: (0, 0),
                          memory_space=pltpu.VMEM)
    dirs_spec = pl.BlockSpec((1, B, KW), lambda tt: (tt, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((B, KW), jnp.int32)

    call_full = pl.pallas_call(
        _build_antidiag_kernel(B, XW, band, tile_t, lean=False, tile0=0),
        grid=(full_tiles,),
        in_specs=[scalar_spec] * 5 + [a_spec, b_spec],
        out_specs=[dirs_spec] + [acc_spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((full_tiles, B, KW), jnp.int32)]
        + [acc_shape] * 6,
        interpret=interpret,
    )
    if lean_tiles > 0:
        call_lean = pl.pallas_call(
            _build_antidiag_kernel(B, XW, band, tile_t, lean=True,
                                   tile0=full_tiles),
            grid=(lean_tiles,),
            in_specs=[scalar_spec] * 5 + [a_spec, b_spec]
            + [acc_spec] * 6,
            out_specs=[dirs_spec] + [acc_spec] * 6,
            out_shape=[jax.ShapeDtypeStruct((lean_tiles, B, KW),
                                            jnp.int32)]
            + [acc_shape] * 6,
            interpret=interpret,
        )

    def interleave(even, odd):
        # j = 2k + parity  ->  j-space row of width 2*KW
        return jnp.stack([even, odd], axis=2).reshape(B, 2 * KW)

    def fn(a_win, b_win, begin_a, end_a, a_len, x_size, force_start):
        to_col = lambda v: jnp.asarray(v, jnp.int32).reshape(B, 1)
        a32 = jnp.asarray(a_win, jnp.int32)
        b32 = jnp.asarray(b_win, jnp.int32)
        bbuf = jnp.zeros((B, BW), jnp.int32)
        bbuf = jax.lax.dynamic_update_slice_in_dim(
            bbuf, b32[:, ::-1], ANTI_BPAD, axis=1)
        scalars = (to_col(begin_a), to_col(end_a), to_col(a_len),
                   to_col(x_size), to_col(force_start))
        dirs_f, lre, lro, dve, dvo, p1, p2 = call_full(
            *scalars, a32, bbuf)
        if lean_tiles > 0:
            dirs_l, lre, lro, dve, dvo, p1, p2 = call_lean(
                *scalars, a32, bbuf, p1, p2, lre, lro, dve, dvo)
            dirs = jnp.concatenate([dirs_f, dirs_l], axis=0)
        else:
            dirs = dirs_f
        return dirs, interleave(lre, lro), interleave(dve, dvo)

    return fn
