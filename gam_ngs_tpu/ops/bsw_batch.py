"""Batched banded Smith-Waterman — the device engine.

The reference kernel (banded_smith_waterman.cc:70) is an O(x_size × 301)
DP whose band row i depends on row i-1 (diag/up) and on the same row's
previous column (left).  TPU mapping:

  * rows become steps of a `lax.scan`; the in-row left dependency
    `row[j] = max(base[j], row[j-1] - 8)` is a max-plus affine prefix
    composition, computed with `lax.associative_scan` over the lane axis
    (functions f(x)=max(c, s+x) compose associatively);
  * every cell's traceback decision (diag / up / left with the
    reference's exact tie-break order) is derived at fill time from the
    current and previous rows and stored as a byte in HBM; the traceback
    itself is a short host walk over the decision matrix;
  * problems are bucketed by padded (x, band-window) shape and batched
    along the leading axis; the row scan is vectorized over the batch.

Cell values and traceback are bit-identical to ops.bsw_ref (validated in
tests/test_bsw_batch.py).  `BswEngine.align_many` is the public batched
API; the wavefront scheduler (merge.scheduler) feeds it.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np

from .bsw_ref import (
    BSW_MAX_ALIGNMENT,
    DEFAULT_BAND_SIZE,
    FORCE_MAXGAP_LEN,
    GAP,
)
from .editops import GAP_A, GAP_B, MATCH, MISMATCH, Alignment

NEG = -(1 << 29)

_DIR_DIAG, _DIR_UP, _DIR_LEFT = 0, 1, 2


_cache_enabled = False


def _machine_cache_key() -> str:
    """Cache-dir suffix keying executables to this machine's ISA.

    XLA:CPU AOT-compiles with `-march=native`-like machine features and
    reloading another host's executables can SIGILL; keying the
    directory by platform + CPU feature fingerprint makes the cache
    machine-local without giving up cross-process reuse."""
    import hashlib
    import platform as _plat

    parts = [_plat.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "flags", "Features")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        pass
    # Mitigation status (e.g. Downfall/GDS) flips LLVM's
    # prefer-no-gather/scatter tuning pseudo-features, which the AOT
    # loader treats as a machine mismatch even on identical ISAs.
    try:
        vul = "/sys/devices/system/cpu/vulnerabilities"
        for name in sorted(os.listdir(vul)):
            try:
                with open(os.path.join(vul, name)) as fh:
                    parts.append(f"{name}={fh.read().strip()}")
            except OSError:
                pass
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache() -> None:
    """Persist compiled executables across processes.

    TPU compiles go through a slow remote-compile path in some
    deployments (minutes per shape); the persistent cache makes every
    shape a one-time cost per machine.  The directory is keyed by the
    machine's CPU fingerprint (XLA:CPU AOT executables embed machine
    features and may SIGILL on a different host).  Directory override:
    GAM_COMPILE_CACHE (empty string disables)."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    d = os.environ.get("GAM_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/gam_ngs_tpu/xla"))
    if not d:
        return
    import jax

    try:
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT-compiles with resolved LLVM machine features
            # that the loader validates only with a warning
            # (cpu_aot_loader "doesn't match ... could lead to
            # execution errors such as SIGILL") — the CPU-fingerprint
            # key below proved insufficient (mitigation-dependent
            # pseudo-features like prefer-no-gather/scatter still
            # slipped through and mismatched executables kept
            # loading).  CPU compiles are cheap; the persistent cache
            # is worth the risk only for the minutes-per-shape remote
            # TPU compiles, so it is TPU-only now.
            return
        d = os.path.join(d, _machine_cache_key())
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _base_score(ac, bc):
    """SCORING_MATRIX via masks (A,T,C,G,N codes; N==4)."""
    import jax.numpy as jnp

    s = jnp.where(ac == bc, 5, -4)
    s = jnp.where((ac == 4) | (bc == 4), 0, s)
    s = jnp.where((ac == 4) & (bc == 4), 5, s)
    return s.astype(jnp.int32)


def forward_builder(B: int, XW: int, AW: int, band: int):
    """Build the (unjitted) batched forward-DP function for fixed shapes.

    Exposed so parallel.step can wrap it in a sharded jit and
    __graft_entry__ can compile-check it; BswEngine uses the cached
    jitted version below.
    """
    import jax
    import jax.numpy as jnp

    YS = 2 * band + 1      # logical band width
    YP = -(-(YS + 1) // 128) * 128  # padded lanes (one extra for shifts)

    j_idx = jnp.arange(YP, dtype=jnp.int32)          # lane index
    in_band = j_idx < YS
    ymax = YS - 1

    def scan_combine(a, b):
        c1, s1 = a
        c2, s2 = b
        c = jnp.maximum(c2, jnp.maximum(s2 + c1, NEG))
        s = jnp.maximum(s1 + s2, NEG)
        return c, s

    def forward(a_win, b_win, begin_a, end_a, a_len, x_size,
                force_start):
        """Shapes: a_win (B, AW) uint8, b_win (B, XW) uint8, rest (B,) int32.

        a_win is the band-ALIGNED window: a_win[t, k] = a[begin_a-band+k]
        (sentinel 255 out of range), so row i's band characters are the
        contiguous slice a_win[:, i:i+YP] — a dynamic slice, no gather.
        Requires AW >= XW + YP.

        Returns dirs (B, XW, YP) uint8, last_row (B, YP) int32, and
        dvacc (B, YP) int32 — the pos_a==end_a diagonal accumulator in
        compact lane layout: lane jj holds the band cell of row
        i = end_a-begin_a+band - jj (each lane has exactly one writer
        row, so no overwrites; the host indexes dvacc[t, jj] directly).
        Only the 1-byte direction matrix is materialized per cell;
        score rows live in the scan carry, so HBM writes are ~1
        byte/cell instead of 5.
        """
        fs = force_start.astype(bool)
        jd_base = end_a - begin_a + band  # (B,) diag lane at row 0
        lane = jnp.arange(YP, dtype=jnp.int32)[None, :]

        def dv_update(i, row, dvacc):
            hit = lane == (jd_base[:, None] - i)
            return jnp.where(hit, row, dvacc)

        def a_char_at(i):
            # row i band chars = aligned-window slice [i, i+YP)
            return jax.lax.dynamic_slice_in_dim(a_win, i, YP, axis=1)

        def row0():
            pos = begin_a[:, None] - band + j_idx[None, :]
            bc = b_win[:, 0][:, None]
            ac = a_char_at(0)
            diag = _base_score(ac, bc)
            valid_pos = (pos >= 0) & (pos < a_len[:, None])
            # force_start lanes also bound pos < a_len (the reference
            # throws out_of_range there; see ops/bsw_ref.py)
            cond_a = jnp.where(fs[:, None],
                               (pos >= 0) & (pos <= FORCE_MAXGAP_LEN)
                               & (pos < a_len[:, None]),
                               valid_pos)
            cond_b = fs[:, None] & (pos > FORCE_MAXGAP_LEN) & (pos < a_len[:, None])
            allow_left = (pos > 0) & (j_idx[None, :] > 0)
            base_a = jnp.where(allow_left, jnp.maximum(diag, GAP),
                               jnp.maximum(GAP, diag))
            base_b = jnp.where(allow_left, diag, diag)
            base = jnp.where(cond_b, base_b, base_a)
            valid = (cond_a | cond_b) & in_band[None, :]
            c = jnp.where(valid, base, 0)
            # row-0 quirk: left is UNPENALIZED (sw[0][j-1], no gap; :120/:128)
            s = jnp.where(valid & allow_left, jnp.int32(0), jnp.int32(NEG))
            c, _ = jax.lax.associative_scan(scan_combine, (c, s), axis=1)
            row = jnp.where(valid, c, 0).astype(jnp.int32)
            return row, pos, diag, valid_pos

        def row_general(i, prev):
            pos = begin_a[:, None] + i + j_idx[None, :] - band
            bc = jax.lax.dynamic_slice_in_dim(b_win, i, 1, axis=1)
            ac = a_char_at(i)
            sc = _base_score(ac, bc)
            valid_pos = (pos >= 0) & (pos < a_len[:, None])

            prev_up = jnp.roll(prev, -1, axis=1)  # prev[j+1]
            is_last = j_idx[None, :] == ymax
            up = jnp.where(is_last, GAP, prev_up + GAP)

            pos0 = pos == 0
            fresh = jnp.where(fs[:, None], pos0 & (i <= FORCE_MAXGAP_LEN), pos0)
            fresh_forced = fs[:, None] & pos0 & (i > FORCE_MAXGAP_LEN)

            base_fresh = jnp.where(is_last, jnp.maximum(sc, GAP),
                                   jnp.maximum(jnp.maximum(sc, up), GAP))
            base_forced = jnp.where(is_last, sc, jnp.maximum(sc, up))
            diag_acc = prev + sc
            is_first = j_idx[None, :] == 0
            base_gen = jnp.where(is_last, diag_acc,
                                 jnp.maximum(diag_acc, up))
            allow_left_gen = ~is_first

            base = jnp.where(fresh, base_fresh,
                             jnp.where(fresh_forced, base_forced, base_gen))
            allow_left = jnp.where(fresh | fresh_forced, False, allow_left_gen)
            valid = valid_pos & in_band[None, :]

            c = jnp.where(valid, base, 0)
            s = jnp.where(valid & allow_left, jnp.int32(GAP), jnp.int32(NEG))
            c, _ = jax.lax.associative_scan(scan_combine, (c, s), axis=1)
            row = jnp.where(valid, c, 0).astype(jnp.int32)
            return row, pos, sc, diag_acc, up, fresh | fresh_forced, valid_pos

        def dirs_for_row(i, row, prev, pos, sc):
            """Traceback decisions for all cells of row i (x==i)."""
            x_pos = i  # scalar traced
            bcmp = row
            # pos == 0 branch
            left_blocked = fs[:, None] & (x_pos > FORCE_MAXGAP_LEN)
            is_last = j_idx[None, :] == ymax
            d_pos0 = jnp.where(
                bcmp == sc, _DIR_DIAG,
                jnp.where(is_last | ((bcmp == GAP) & ~left_blocked),
                          _DIR_LEFT, _DIR_UP))
            # general branch
            diag_t = jnp.where(x_pos > 0, prev, 0) + sc
            prev_up = jnp.roll(prev, -1, axis=1)
            up_t = jnp.where((x_pos > 0) & ~is_last, prev_up + GAP, GAP)
            up_t = jnp.where(
                fs[:, None] & (x_pos == 0),
                jnp.where((pos >= 0) & (pos <= FORCE_MAXGAP_LEN), GAP, NEG),
                up_t)
            is_first = j_idx[None, :] == 0
            mid = ~is_first & ~is_last
            d_gen = jnp.where(
                bcmp == diag_t, _DIR_DIAG,
                jnp.where(mid & (bcmp == up_t), _DIR_UP,
                          jnp.where(mid, _DIR_LEFT,
                                    jnp.where(~is_last, _DIR_UP, _DIR_LEFT))))
            return jnp.where(pos == 0, d_pos0, d_gen).astype(jnp.uint8)

        # row 0
        row0_val, pos0_, diag0, _vp0 = row0()
        dirs0 = dirs_for_row(0, row0_val, jnp.zeros_like(row0_val), pos0_,
                             diag0)

        def step(carry, i):
            prev, last_row, dvacc = carry
            row, pos, sc, _diag_acc, _up, _fresh, _vp = row_general(i, prev)
            d = dirs_for_row(i, row, prev, pos, sc)
            last_row = jnp.where((i == x_size - 1)[:, None], row, last_row)
            return (row, last_row, dv_update(i, row, dvacc)), d

        init_last = jnp.where((x_size == 1)[:, None], row0_val,
                              jnp.zeros_like(row0_val))
        dvacc0 = dv_update(0, row0_val, jnp.zeros_like(row0_val))
        (final_row, last_row, dvacc), dirs_rest = jax.lax.scan(
            step, (row0_val, init_last, dvacc0),
            jnp.arange(1, XW, dtype=jnp.int32))

        dirs = jnp.concatenate([dirs0[:, None, :],
                                jnp.moveaxis(dirs_rest, 0, 1)], axis=1)
        return dirs, last_row, dvacc

    return forward


@functools.lru_cache(maxsize=64)
def _compiled_forward(B: int, XW: int, AW: int, band: int):
    import jax

    return jax.jit(forward_builder(B, XW, AW, band))


@dataclass
class _Prep:
    """Host-side preprocessed problem."""
    empty: bool
    a: np.ndarray = None
    b: np.ndarray = None
    begin_a: int = 0
    end_a: int = 0
    begin_b: int = 0
    x_size: int = 0
    a_win: np.ndarray = None
    b_win: np.ndarray = None
    force_start: bool = False
    force_end: bool = False
    # resident-arena coordinates (ofs, length, rev) when both sequences
    # live in the engine's device sequence arena — the dispatch then
    # ships ~13 ints instead of the packed windows
    a_arena: tuple | None = None
    b_arena: tuple | None = None


def _prepare(a, begin_a, end_a, b, begin_b, end_b, force_start, force_end,
             band) -> _Prep:
    if end_b < begin_b:
        return _Prep(empty=True)
    if end_b >= len(b):
        end_b = len(b) - 1
    x_size = end_b - begin_b + 1
    x_size = min(x_size, len(a) + band - begin_a)
    x_size = min(x_size, BSW_MAX_ALIGNMENT)
    if x_size <= 0:
        return _Prep(empty=True)
    # band-ALIGNED window: a_win[k] = a[begin_a - band + k], sentinel 255
    start = begin_a - band
    width = x_size + 2 * band
    a_win = np.full(width, 255, np.uint8)
    lo = max(0, start)
    hi = min(len(a), start + width)
    if hi > lo:
        a_win[lo - start:hi - start] = a[lo:hi]
    b_win = np.ascontiguousarray(b[begin_b:begin_b + x_size])
    return _Prep(False, a, b, begin_a, end_a, begin_b, x_size, a_win,
                 b_win, force_start, force_end)


def _find_max_from(last_row, diag_vals, diag_is, p: _Prep, band: int):
    """Reference find-max over last row + pos_a==end_a diagonal."""
    y_size = 2 * band + 1
    found = False
    max_i = max_j = 0
    max_score = 0

    if not p.force_end:
        base = p.begin_a + (p.x_size - 1) - band
        for j in range(y_size):
            pos = base + j
            if 0 <= pos <= p.end_a:
                v = int(last_row[j])
                if not found or v > max_score:
                    found, max_i, max_j, max_score = True, p.x_size - 1, j, v

    # unsigned-underflow quirk: see ops/bsw_ref.py find_max
    fe_low_ok = p.x_size - 1 - FORCE_MAXGAP_LEN >= 0
    for k in range(len(diag_is)):
        i = int(diag_is[k])
        if (not p.force_end) or (fe_low_ok and
                                 p.x_size - 1 - FORCE_MAXGAP_LEN <= i < p.x_size):
            v = int(diag_vals[k])
            if not found or v > max_score:
                j = p.end_a - p.begin_a - i + band
                found, max_i, max_j, max_score = True, i, j, v
    return found, max_i, max_j, max_score


def _device_traceback_raw(B: int, XW: int, band: int, LMAX: int,
                          lean: bool = False, antidiag: bool = False,
                          plain_chars: bool = False):
    """Lockstep vectorized traceback walk over PACKED device dirs.

    Replaces the ~0.25 B/cell direction download with a ~2 B/edit edit
    string download — decisive when device->host bandwidth is scarce
    (e.g. a tunneled PJRT client).  One lax.scan step = one walk step
    for every problem: a 3-element gather + arithmetic.

    lean=True drops the edit string from the output entirely and ships
    only the walk SUMMARY (final x/y, length, match/gap counts, first/
    last-match walk coordinates) — 13 ints per problem instead of
    LMAX/4 packed bytes.  The merge pipeline only ever consumes
    homology, length and first/last match positions (merge/align.py),
    so this is lossless for it and cuts the d2h payload ~400x.
    """
    import jax
    import jax.numpy as jnp

    assert LMAX % 4 == 0

    def walk(dirs, a_pk, b_pk, begin_a, x0, y0):
        # a_pk/b_pk are the 4-bit-packed windows the forward uploaded
        # (two codes per byte): chars gather as byte >> nibble
        tb = jnp.arange(B, dtype=jnp.int32)
        n_planes = dirs.shape[0]
        awp = a_pk.shape[1]

        def step(carry, _):
            (x, y, active, cnt, matches, gapa, gapb, hasm, fmx, fmy,
             lmx, lmy) = carry
            if antidiag:
                # step-major planes (ops/bsw_pallas.py antidiag): cell
                # (x, y) lives at step t = 2x+y, lane t//2 - x
                t = 2 * x + y
                plane = dirs[jnp.clip(t >> 4, 0, n_planes - 1), tb,
                             jnp.clip((t >> 1) - x, 0,
                                      dirs.shape[2] - 1)]
                d = (plane >> ((t & 15) * 2)) & 3
            else:
                plane = dirs[jnp.clip(x >> 4, 0, n_planes - 1), tb,
                             jnp.clip(y, 0, dirs.shape[2] - 1)]
                d = (plane >> ((x & 15) * 2)) & 3
            if plain_chars:
                # arena mode: a_pk/b_pk are the UNPACKED (B, AW)/(B, XW)
                # int32 windows the fused jit gathered from the arena
                ca = a_pk[tb, jnp.clip(x + y, 0, a_pk.shape[1] - 1)]
                cb = b_pk[tb, jnp.clip(x, 0, XW - 1)]
            else:
                pa = a_pk[tb, jnp.clip((x + y) >> 1, 0, awp - 1)].astype(
                    jnp.int32)
                ca = (pa >> (((x + y) & 1) * 4)) & 15
                pb = b_pk[tb, jnp.clip(x >> 1, 0, XW // 2 - 1)].astype(
                    jnp.int32)
                cb = (pb >> ((x & 1) * 4)) & 15
            is_match = (ca == cb) | (ca == 4) | (cb == 4)
            edit = jnp.where(d == _DIR_DIAG,
                             jnp.where(is_match, MATCH, MISMATCH),
                             jnp.where(d == _DIR_UP, GAP_A, GAP_B))
            edit = jnp.where(active, edit, 0).astype(jnp.uint8)
            # walk order is reverse alignment order: the first match
            # seen is the alignment's LAST match, the last one seen is
            # its FIRST — latch both (walk coords; host converts)
            is_m = active & (d == _DIR_DIAG) & is_match
            fmx = jnp.where(is_m, x, fmx)
            fmy = jnp.where(is_m, y, fmy)
            lmx = jnp.where(is_m & ~hasm, x, lmx)
            lmy = jnp.where(is_m & ~hasm, y, lmy)
            hasm = hasm | is_m
            matches = matches + is_m.astype(jnp.int32)
            gapa = gapa + (active & (d == _DIR_UP)).astype(jnp.int32)
            gapb = gapb + (active & (d == _DIR_LEFT)).astype(jnp.int32)
            nx = jnp.where(active & (d != _DIR_LEFT), x - 1, x)
            ny = jnp.where(active,
                           jnp.where(d == _DIR_UP, y + 1,
                                     jnp.where(d == _DIR_LEFT, y - 1, y)),
                           y)
            npos = begin_a + nx + ny - band
            nactive = active & (nx >= 0) & (ny >= 0) & (npos >= 0)
            return (nx, ny, nactive, cnt + active.astype(jnp.int32),
                    matches, gapa, gapb, hasm, fmx, fmy, lmx, lmy), edit

        active0 = (x0 >= 0) & (y0 >= 0) & (begin_a + x0 + y0 - band >= 0)
        z = jnp.zeros(B, jnp.int32)
        (xf, yf, _, cnt, matches, gapa, gapb, hasm, fmx, fmy, lmx,
         lmy), edits = jax.lax.scan(
            step, (x0, y0, active0, z, z, z, z,
                   jnp.zeros(B, bool), z, z, z, z), None, length=LMAX)
        summary = jnp.stack([xf, yf, cnt, matches, gapa, gapb,
                             hasm.astype(jnp.int32), fmx, fmy, lmx, lmy])
        if lean:
            return summary  # (11, B) int32 — the fused wrapper bitcasts
        # single-download layout (each device->host fetch costs a full
        # round-trip on tunneled PJRT clients): edit codes are 2-bit,
        # so pack 4 per byte (inactive steps are 0; the per-problem
        # step count rides along) + the final (x, y) and counts
        # bitcast to 4 uint8 rows each -> one (LMAX/4 + 12, B) fetch,
        # ~4x smaller than the byte-per-edit layout
        e4 = edits.reshape(LMAX // 4, 4, B)
        packed = (e4[:, 0] | (e4[:, 1] << 2) | (e4[:, 2] << 4)
                  | (e4[:, 3] << 6)).astype(jnp.uint8)
        xyb = jax.lax.bitcast_convert_type(summary[:3], jnp.uint8)
        tail = jnp.transpose(xyb, (0, 2, 1)).reshape(12, B)
        return jnp.concatenate([packed, tail], axis=0)

    return walk


def _find_max_builder(band: int, YP: int):
    """Device find-max over last row + pos_a==end_a diagonal.

    Vectorized replica of _find_max_from with the reference's exact
    candidate order (banded_smith_waterman.cc:175-214): last-row cells
    j ascending first (skipped under force_end), then diagonal cells i
    ascending (force_end keeps only the trailing FORCE_MAXGAP_LEN+1
    rows).  Ties resolve to the FIRST candidate in that order — the
    argmax picks the minimum priority among max-value candidates.
    """
    import jax.numpy as jnp

    ys = 2 * band + 1
    BIG = jnp.int32(1 << 30)
    NEGB = jnp.int32(-(1 << 30))  # below every reachable cell score

    def findmax(last_row, dvacc, begin_a, end_a, x_size, fend):
        j = jnp.arange(YP, dtype=jnp.int32)[None, :]
        ba = begin_a[:, None]
        ea = end_a[:, None]
        xs = x_size[:, None]
        fe = fend[:, None] != 0
        # last-row candidates (priority j)
        posj = ba + (xs - 1) - band + j
        ok_lr = (~fe) & (j < ys) & (posj >= 0) & (posj <= ea)
        # diagonal candidates: lane jj holds row i = end_a-begin_a+band-jj
        i0 = jnp.maximum(ea - ba - band, 0)
        i_of = (ea - ba + band) - j
        # unsigned-underflow quirk (see ops/bsw_ref.py find_max): for
        # x_size <= FORCE_MAXGAP_LEN the reference's force_end window
        # bound wraps and excludes EVERY diagonal candidate
        ok_dg = ((j < ys) & (i_of >= i0) & (i_of < xs)
                 & ((~fe) | ((i_of >= xs - 1 - FORCE_MAXGAP_LEN)
                             & (xs - 1 - FORCE_MAXGAP_LEN >= 0))))
        v = jnp.concatenate([jnp.where(ok_lr, last_row, NEGB),
                             jnp.where(ok_dg, dvacc, NEGB)], axis=1)
        p = jnp.concatenate([jnp.where(ok_lr, j, BIG),
                             jnp.where(ok_dg, ys + i_of - i0, BIG)], axis=1)
        m = jnp.max(v, axis=1)
        found = jnp.any(jnp.concatenate([ok_lr, ok_dg], axis=1), axis=1)
        pw = jnp.min(jnp.where(v == m[:, None], p, BIG), axis=1)
        is_lr = pw < ys
        i_dg = i0[:, 0] + (pw - ys)
        max_i = jnp.where(is_lr, x_size - 1, i_dg)
        max_j = jnp.where(is_lr, pw, (end_a - begin_a + band) - i_dg)
        return (max_i.astype(jnp.int32), max_j.astype(jnp.int32), m,
                found)

    return findmax


def _traceback_native(dirs: np.ndarray, packed: bool, t: int, p: "_Prep",
                      band: int, max_i: int, max_j: int):
    """C++ traceback walk (gamio_traceback); None -> Python fallback."""
    if os.environ.get("GAM_NO_NATIVE"):
        return None
    from ..native.loader import traceback_native

    yp = dirs.shape[2]
    if packed:  # (XW/16, B, YP) int32 planes
        off = t * yp
        stride = dirs.shape[1] * yp
    else:       # (B, XW, YP) uint8
        off = t * dirs.shape[1] * yp
        stride = yp
    a = np.ascontiguousarray(p.a, np.uint8)
    b = np.ascontiguousarray(p.b, np.uint8)
    res = traceback_native(dirs, off, stride, packed, band, max_i, max_j,
                           p.begin_a, p.begin_b, a, b)
    if res is None:
        return None
    edits, matches, x, pos = res
    return list(edits), matches, x, pos


class _PackedDirs:
    """Accessor for the Pallas kernel's packed directions: 16 rows of
    2-bit codes per int32 plane (see ops.bsw_pallas.PACK)."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, xy):
        x, y = xy
        return (int(self.arr[x >> 4, y]) >> ((x & 15) * 2)) & 3


def _traceback_from_dirs(dirs, p: _Prep, band: int, max_i: int, max_j: int
                         ) -> tuple[list[int], int, int, int]:
    a, b = p.a, p.b
    x, y = max_i, max_j
    pos = p.begin_a + x + y - band
    edits: list[int] = []
    matches = 0
    y_size = 2 * band + 1
    while x >= 0 and y >= 0 and pos >= 0:
        d = int(dirs[x, y])
        if d == _DIR_DIAG:
            ca = int(a[pos])
            cb = int(b[p.begin_b + x])
            if ca == cb or ca == 4 or cb == 4:
                edits.append(MATCH)
                matches += 1
            else:
                edits.append(MISMATCH)
            x -= 1
        elif d == _DIR_UP:
            edits.append(GAP_A)
            x -= 1
            y += 1
        else:
            edits.append(GAP_B)
            y -= 1
        pos = p.begin_a + x + y - band
    edits.reverse()
    return edits, matches, x, pos


class BswEngine:
    """Batched banded-SW with shape-bucketed compilation caching.

    backend: "xla" = the lax.scan forward; "pallas" = the Pallas TPU
    kernel (interpret mode off-TPU); "auto" = pallas on TPU, xla
    elsewhere.

    mesh: optional jax.sharding.Mesh — problem batches are sharded over
    every mesh device with shard_map (each device runs the forward
    kernel on its slice; there is no cross-chip traffic because
    alignment problems are independent, SURVEY.md §2.7).
    """

    def __init__(self, band: int = DEFAULT_BAND_SIZE, max_batch: int = 64,
                 hbm_budget_bytes: int = 2 << 30, backend: str = "auto",
                 mesh=None, traceback: str = "auto", fetch: str = "auto",
                 kernel: str = "auto"):
        self.band = band
        self.fetch = fetch  # "lean" | "edits" | "auto"
        # kernel: "antidiag" (skewed-band stepping, no in-row scan —
        # the production default for the fused device path) | "row"
        # (full/lean row split — kept as the fallback and for host-
        # traceback paths) | "auto".  GAM_KERNEL=row forces the row
        # form without code changes.
        self.kernel = os.environ.get("GAM_KERNEL", kernel) \
            if kernel == "auto" else kernel
        self.mesh = mesh
        if mesh is not None and max_batch == 64:
            max_batch *= int(mesh.devices.size)
        self.max_batch = max_batch
        self.hbm_budget = hbm_budget_bytes
        self.backend = backend
        self.traceback = traceback  # "host" | "device" | "auto"
        self._traceback_resolved: str | None = None
        self._mesh_cache: dict = {}
        # resident sequence arena (register_contigs): id(arr) ->
        # (ofs, len, rev); _seq_keep pins arena writers, _seq_refs pins
        # rev-view registrations (id-keyed caches must keep keys alive)
        self._seq_map: dict[int, tuple[int, int, int]] = {}
        self._seq_keep: list = []
        self._seq_refs: list = []
        self._arena_len = 0
        self._arena_dev = None
        self.cells_aligned = 0  # logical band cells processed (metrics)
        self.bytes_up = 0       # host->device payload bytes (metrics)
        self.dispatches = 0
        # ragged-batching utilization (SURVEY §7): live problems vs
        # padded batch rows, and live DP rows vs padded xw*B rows
        self.util = {"live": 0, "batch": 0, "rows_live": 0,
                     "rows_padded": 0}
        enable_compilation_cache()

    def _resolve_traceback(self) -> str:
        """On any accelerator the fused device walk wins: it keeps the
        direction planes on-device entirely (no 0.25 B/cell download)
        and collapses dispatch+find-max+walk to one round-trip — on a
        tunneled link that's decisive, and on local hardware it's still
        cheaper than shipping directions.  On CPU the host/C++ walk is
        faster than interpreting the pallas kernel.  (Do NOT key on the
        platform NAME: the tunneled chip used to report 'axon' and now
        reports 'tpu' — keying on it silently disabled this path.)"""
        if self._traceback_resolved is None:
            if self.traceback != "auto":
                self._traceback_resolved = self.traceback
            else:
                import jax

                self._traceback_resolved = (
                    "device" if jax.default_backend() != "cpu"
                    else "host")
        return self._traceback_resolved

    def _use_pallas(self) -> bool:
        if self.backend == "xla":
            return False
        if self.backend == "pallas":
            return True
        import jax

        return jax.default_backend() != "cpu"

    def _use_antidiag(self) -> bool:
        """Anti-diagonal kernel: fused device path only (its step-major
        direction planes are consumed by the on-device walk; host/C++
        traceback walkers keep the row-major layout)."""
        if self.kernel == "row":
            return False
        return self._use_pallas() and self._resolve_traceback() == "device"

    # ---- resident sequence arena -------------------------------------
    # The align phase's wire cost is the packed window uploads (66 MB
    # at 50 Mbp; chained windows re-ship overlapping contig regions
    # every round).  Registering the assemblies ONCE puts a 4-bit
    # packed arena of all contigs in HBM; arena-resident problems then
    # dispatch ~13 scalars each and the fused jit gathers/complements
    # the windows on device (SURVEY §2.7 "HBM region tables" applied to
    # the sequences themselves; the PERF.md §6 'device-resident contig
    # arena' follow-up).

    def register_contigs(self, arrays) -> None:
        """Add contig code arrays to the device sequence arena.  Reverse
        orientations are served from the same bytes (io.fasta's
        memoized reverse_complement maps an rc array to its base; the
        kernel-side gather flips index + complements the code).

        Callers decide whether to register: a measured 50 Mbp A/B on
        the v5e (PERF.md §10c) showed the on-device window gather from
        a large arena LOSES to pipelined 4-bit window uploads there, so
        run_merge registers only under GAM_ARENA=1."""
        added = False
        for a in arrays:
            if len(a) == 0 or id(a) in self._seq_map:
                continue
            self._seq_map[id(a)] = (self._arena_len, len(a), 0)
            self._seq_keep.append(a)
            self._arena_len += int(len(a))
            added = True
        if added:
            self._arena_dev = None  # rebuild (shape pads to pow2)

    def _seq_lookup(self, arr):
        ent = self._seq_map.get(id(arr))
        if ent is not None:
            return ent
        from ..io.fasta import rc_source

        src = rc_source(arr)
        if src is not None:
            base = self._seq_map.get(id(src))
            if base is not None:
                ent = (base[0], base[1], base[2] ^ 1)
                self._seq_map[id(arr)] = ent
                self._seq_refs.append(arr)
                return ent
        return None

    def _arena_packed(self):
        if self._arena_dev is None:
            import jax.numpy as jnp

            # pad to 1 MB multiples: arena size differs per corpus
            # anyway (one compile set per corpus, persistent-cached),
            # and a pow2 pad wasted up to ~2x upload bytes (the arena
            # IS the upload — 67 MB vs 50 MB at a 100 Mb assembly pair)
            tp = max(1 << 20, -(-self._arena_len // (1 << 20)) << 20)
            flat = np.zeros(tp, np.uint8)
            for a in self._seq_keep:
                ofs, ln, _rev = self._seq_map[id(a)]
                flat[ofs:ofs + ln] = a
            pk = (flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)
            self.bytes_up += pk.nbytes  # one-time upload
            self._arena_dev = jnp.asarray(pk)
        return self._arena_dev

    def _resolve_lean(self) -> bool:
        """Lean fetch (walk summary only, no edit strings) is the
        default on accelerators: the merge consumes only the summary
        fields, and the measured tunnel d2h (~1 MB/s) makes edit-string
        downloads the align-phase bottleneck.  On CPU (tests) edits
        stay materialized."""
        if self.fetch == "lean":
            return True
        if self.fetch == "edits":
            return False
        import jax

        return jax.default_backend() != "cpu"

    def _fused_align(self, B: int, xw: int, aw: int, lmax: int,
                     all_full: bool, lean: bool = False,
                     arena: bool = False):
        """ONE dispatch / ONE fetch per chunk: 4-bit unpack -> Pallas
        forward -> device find-max -> lockstep traceback walk, all in a
        single jit.  The packed direction planes never leave the device
        (they are consumed by the walk inside the same XLA program, so
        they are transient — pipelined chunks don't accumulate HBM),
        and the host downloads one (LMAX/4 + 20, B) uint8 buffer:
        packed edit codes + final (x, y), step count, max score and a
        found flag per problem.  This collapses the align phase's
        per-chunk host round-trips from 3 (dispatch, fused fetch,
        host-find-max -> walk fetch) to 1 — the fix PERF.md §6 names
        for multi-second-RTT links.

        arena=True builds the RESIDENT-ARENA variant: instead of packed
        window payloads the dispatch takes (ofs, len, rev) coordinates
        per problem plus the one-time 4-bit contig arena, and the jit
        gathers the windows on device (reverse orientations flip the
        index and complement codes 0..3 via XOR 1) — the upload drops
        from ~2 MB to ~100 B per chunk."""
        anti = self._use_antidiag() and xw >= self.ANTI_MIN_XW
        tpk = int(self._arena_packed().shape[0]) if arena else 0
        key = ("fusedtb", B, xw, aw, lmax, all_full, lean, anti, tpk,
               arena)
        fn = self._mesh_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        from .bsw_pallas import (antidiag_dims, pallas_forward_antidiag_raw,
                                 pallas_forward_raw)

        on_cpu = jax.default_backend() == "cpu"
        band = self.band
        YP = (2 * antidiag_dims(xw, band)[0] if anti
              else -(-(2 * band + 2) // 128) * 128)

        def build_local(Bl):
            if anti:
                fwd = pallas_forward_antidiag_raw(Bl, xw, band,
                                                  interpret=on_cpu,
                                                  all_full=all_full)
            else:
                fwd = pallas_forward_raw(Bl, xw, aw, band,
                                         interpret=on_cpu,
                                         all_full=all_full)
            walk = _device_traceback_raw(Bl, xw, band, lmax, lean=lean,
                                         antidiag=anti,
                                         plain_chars=arena)
            findmax = _find_max_builder(band, YP)

            def unpack(pk, width):
                p = pk.astype(jnp.int32)
                return jnp.stack([p & 15, p >> 4], axis=2).reshape(
                    Bl, width)

            def tail_of(buf, score, found):
                if lean:
                    # (13, Bl) int32: walk summary + score + found
                    return jnp.concatenate(
                        [buf, score[None], found.astype(jnp.int32)[None]],
                        axis=0)
                sb = jax.lax.bitcast_convert_type(
                    jnp.stack([score, found.astype(jnp.int32)]),
                    jnp.uint8)  # (2, Bl, 4)
                tail = jnp.transpose(sb, (0, 2, 1)).reshape(8, Bl)
                return jnp.concatenate([buf, tail], axis=0)

            def fused(a_pk, b_pk, begin_a, end_a, a_len, x_size, fstart,
                      fend):
                dirs, last_row, dvacc = fwd(
                    unpack(a_pk, aw), unpack(b_pk, xw), begin_a, end_a,
                    a_len, x_size, fstart)
                x0, y0, score, found = findmax(last_row, dvacc, begin_a,
                                               end_a, x_size, fend)
                buf = walk(dirs, a_pk, b_pk, begin_a,
                           jnp.where(found, x0, -1), y0)
                return tail_of(buf, score, found)

            def fused_arena(arena_pk, a_ofs, a_len, a_rev, begin_a,
                            end_a, b_ofs, b_len, b_rev, begin_b, x_size,
                            fstart, fend):
                flat = arena_pk.astype(jnp.int32)

                def win(ofs, ln, rev, start, width, fill):
                    k = jnp.arange(width, dtype=jnp.int32)[None, :]
                    p = start[:, None] + k
                    rv = (rev[:, None] == 1)
                    idx = jnp.where(rv, ofs[:, None] + ln[:, None] - 1 - p,
                                    ofs[:, None] + p)
                    idxc = jnp.clip(idx, 0, 2 * tpk - 1)
                    c = (flat[idxc >> 1] >> ((idxc & 1) * 4)) & 15
                    c = jnp.where(rv & (c < 4), c ^ 1, c)
                    return jnp.where((p >= 0) & (p < ln[:, None]), c,
                                     fill)

                a32 = win(a_ofs, a_len, a_rev, begin_a - band, aw, 15)
                bfull = win(b_ofs, b_len, b_rev, begin_b, xw, 0)
                xi = jnp.arange(xw, dtype=jnp.int32)[None, :]
                b32 = jnp.where(xi < x_size[:, None], bfull, 0)
                dirs, last_row, dvacc = fwd(a32, b32, begin_a, end_a,
                                            a_len, x_size, fstart)
                x0, y0, score, found = findmax(last_row, dvacc, begin_a,
                                               end_a, x_size, fend)
                buf = walk(dirs, a32, b32, begin_a,
                           jnp.where(found, x0, -1), y0)
                return tail_of(buf, score, found)

            return fused_arena if arena else fused

        if self.mesh is None:
            fn = jax.jit(build_local(B))
        else:
            from jax.sharding import PartitionSpec as P

            n = int(self.mesh.devices.size)
            axes = self.mesh.axis_names
            local = build_local(B // n)
            bspec = P(axes)
            if arena:
                # arena replicated to every device, problem axis sharded
                in_specs = (P(None),) + (bspec,) * 12
            else:
                in_specs = (bspec,) * 8
            fn = jax.jit(jax.shard_map(
                local, mesh=self.mesh, in_specs=in_specs,
                out_specs=P(None, axes), check_vma=False))
        self._mesh_cache[key] = fn
        return fn

    def _forward_fused(self, B: int, xw: int, aw: int,
                       all_full: bool = False):
        """Forward taking 4-BIT-PACKED sequence windows (two base
        codes per byte, sentinel 255→15 — halves the host->device
        upload, the dominant align-phase cost on thin links; a cheap
        XLA unpack feeds the kernel) and returning (last_row, dvacc)
        concatenated into one (B, 2*YP) array so the host pays a
        single SMALL fetch (two band-width rows per problem — the old
        (B, YP+XW) layout downloaded an XW-wide diagonal expansion,
        40x the bytes at XW=32768)."""
        key = ("fused", B, xw, aw, self._use_pallas(), all_full)
        fn = self._mesh_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        inner = self._forward(B, xw, aw, all_full)

        def unpack(pk, width):
            p = pk.astype(jnp.int32)
            return jnp.stack([p & 15, p >> 4], axis=2).reshape(
                pk.shape[0], width)

        def fused(a_pk, b_pk, *rest):
            dirs, last_row, dvals = inner(unpack(a_pk, aw),
                                          unpack(b_pk, xw), *rest)
            return dirs, jnp.concatenate([last_row, dvals], axis=1)

        fn = jax.jit(fused)
        self._mesh_cache[key] = fn
        return fn

    @staticmethod
    def _pack4(win: np.ndarray) -> np.ndarray:
        """Two 4-bit base codes per byte; the 255 out-of-range
        sentinel becomes 15 (still != every real code and != 4/N)."""
        w = np.minimum(win, 15)
        return (w[:, 0::2] | (w[:, 1::2] << 4)).astype(np.uint8)

    def _forward(self, B: int, xw: int, aw: int, all_full: bool = False):
        import jax

        on_cpu = jax.default_backend() == "cpu"
        use_pallas = self._use_pallas()
        if self.mesh is None:
            if use_pallas:
                from .bsw_pallas import pallas_forward

                return pallas_forward(B, xw, aw, self.band,
                                      interpret=on_cpu,
                                      all_full=all_full)
            return _compiled_forward(B, xw, aw, self.band)

        key = (B, xw, aw, use_pallas, all_full)
        fn = self._mesh_cache.get(key)
        if fn is not None:
            return fn
        from jax.sharding import PartitionSpec as P

        n = int(self.mesh.devices.size)
        axes = self.mesh.axis_names
        if use_pallas:
            from .bsw_pallas import pallas_forward_raw

            local = pallas_forward_raw(B // n, xw, aw, self.band,
                                       interpret=on_cpu,
                                       all_full=all_full)
            dirs_spec = P(None, axes, None)  # (XW/16, B, YP) packed
        else:
            local = forward_builder(B // n, xw, aw, self.band)
            dirs_spec = P(axes)
        bspec = P(axes)
        fn = jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(bspec,) * 7,
            out_specs=(dirs_spec, bspec, bspec),
            check_vma=False))  # pallas out_shapes carry no vma info
        self._mesh_cache[key] = fn
        return fn

    @staticmethod
    def _pad_dim(n: int) -> int:
        """Window buckets {128, 256, 384, 512, 768, 1024, ...}: a 128
        floor (the kernels' lane-alignment minimum), then 1x/1.5x per
        octave.  The 1.5x intermediate sizes bound padding waste to
        <= 1.5x (worst-case row-fill 67% vs the pure-pow2 scheme's 50%
        — measured 47% and 22% on real corpora, SURVEY §7 "ragged
        batching"); ~16 distinct shapes to 32k, each a one-time compile
        per machine (persistent cache)."""
        if n <= 128:
            return 128
        p = 256
        while True:
            if n <= p:
                return p
            if n <= p * 3 // 2:
                return p * 3 // 2
            p *= 2

    # anti-diagonal kernel pays a ~2*band step tail per dispatch, which
    # once made the row form faster at tiny windows; with grouped
    # window loads the anti form wins at EVERY bucket (measured v5e,
    # band=150, B=128: 1.08x at XW=128 up to 2.03x at XW=1024), so the
    # threshold sits at the lane-alignment floor
    ANTI_MIN_XW = 128

    def align_one(self, a, begin_a, end_a, b, begin_b, end_b,
                  force_start=False, force_end=False) -> Alignment:
        return self.align_many(
            [(a, begin_a, end_a, b, begin_b, end_b, force_start, force_end)]
        )[0]

    def align_many(self, problems) -> list[Alignment]:
        preps = [_prepare(*pr[:6],
                          pr[6] if len(pr) > 6 else False,
                          pr[7] if len(pr) > 7 else False,
                          self.band) for pr in problems]
        out: list[Alignment | None] = [None] * len(preps)

        # bucket live problems by padded shapes
        live = [i for i, p in enumerate(preps) if not p.empty]
        for i, p in enumerate(preps):
            if p.empty:
                out[i] = Alignment()

        YP = -(-(2 * self.band + 2) // 128) * 128
        use_anti = self._use_antidiag()
        if use_anti:
            from .bsw_pallas import antidiag_dims
        fused_path = (self._use_pallas()
                      and self._resolve_traceback() == "device")
        buckets: dict[tuple[int, int, bool], list[int]] = {}
        for i in live:
            p = preps[i]
            if fused_path and self._seq_map:
                p.a_arena = self._seq_lookup(p.a)
                p.b_arena = self._seq_lookup(p.b)
            arena_ok = p.a_arena is not None and p.b_arena is not None
            xw = self._pad_dim(p.x_size)
            # aligned window incl. slice slack (128-aligned); the
            # anti-diagonal kernel's sliding window reads deeper.
            # Kernel choice is PER BUCKET (row form below ANTI_MIN_XW)
            anti = use_anti and xw >= self.ANTI_MIN_XW
            aw = antidiag_dims(xw, self.band)[2] if anti else xw + YP
            buckets.setdefault((xw, aw, arena_ok), []).append(i)
        chunks: list[tuple[list[int], int, int, bool]] = []
        for (xw, aw, arena_ok), idxs in buckets.items():
            per_problem = xw * YP + aw + 5 * xw  # dirs + wins + diag
            bmax = max(1, min(self.max_batch, self.hbm_budget // max(per_problem, 1)))
            for k in range(0, len(idxs), bmax):
                chunks.append((idxs[k:k + bmax], xw, aw, arena_ok))

        if fused_path:
            # pipeline: dispatch EVERY chunk before fetching any result —
            # executions queue on device, transfers overlap, and a round
            # of N chunks pays ~one link round-trip instead of N
            pending = [self._dispatch_fused(chunk, preps, xw, aw, arena)
                       for chunk, xw, aw, arena in chunks]
            for pend in pending:
                self._collect_fused(pend, preps, out)
        else:
            for chunk, xw, aw, _arena in chunks:
                self._run_chunk(chunk, preps, out, xw, aw)

        return out  # type: ignore[return-value]

    def _pad_batch(self, n: int) -> int:
        """Quantize batch sizes to {8,16,32,64,...} (per device when a
        mesh is set) so compile caches hit — each distinct B costs a
        fresh TPU compile via the remote tunnel; dummy rows are empty
        problems the host ignores."""
        n_dev = 1 if self.mesh is None else int(self.mesh.devices.size)
        per = -(-n // n_dev)
        b = 8
        while b < per:
            b *= 2
        return b * n_dev

    def _pack_chunk(self, chunk, preps, xw, aw):
        B = self._pad_batch(len(chunk))
        a_win = np.full((B, aw), 255, np.uint8)
        b_win = np.zeros((B, xw), np.uint8)
        begin_a = np.zeros(B, np.int32)
        end_a = np.zeros(B, np.int32)
        a_len = np.zeros(B, np.int32)
        x_size = np.zeros(B, np.int32)
        fstart = np.zeros(B, np.int32)
        fend = np.zeros(B, np.int32)
        for t, i in enumerate(chunk):
            p = preps[i]
            a_win[t, :len(p.a_win)] = p.a_win
            b_win[t, :len(p.b_win)] = p.b_win
            begin_a[t] = p.begin_a
            end_a[t] = p.end_a
            a_len[t] = len(p.a)
            x_size[t] = p.x_size
            fstart[t] = int(p.force_start)
            fend[t] = int(p.force_end)
        self.cells_aligned += int(x_size.sum()) * (2 * self.band + 1)
        self.util["live"] += len(chunk)
        self.util["batch"] += B
        self.util["rows_live"] += int(x_size.sum())
        self.util["rows_padded"] += B * xw
        return B, a_win, b_win, begin_a, end_a, a_len, x_size, fstart, fend

    def _pack_chunk_arena(self, chunk, preps, xw):
        """Scalar columns of an arena-resident chunk (no window
        payloads — the fused jit gathers them from the device arena)."""
        B = self._pad_batch(len(chunk))
        names = ("a_ofs", "a_len", "a_rev", "begin_a", "end_a", "b_ofs",
                 "b_len", "b_rev", "begin_b", "x_size", "fstart", "fend")
        cols = {k: np.zeros(B, np.int32) for k in names}
        for t, i in enumerate(chunk):
            p = preps[i]
            ao, al, ar = p.a_arena
            bo, bl, br = p.b_arena
            cols["a_ofs"][t] = ao
            cols["a_len"][t] = al
            cols["a_rev"][t] = ar
            cols["begin_a"][t] = p.begin_a
            cols["end_a"][t] = p.end_a
            cols["b_ofs"][t] = bo
            cols["b_len"][t] = bl
            cols["b_rev"][t] = br
            cols["begin_b"][t] = p.begin_b
            cols["x_size"][t] = p.x_size
            cols["fstart"][t] = int(p.force_start)
            cols["fend"][t] = int(p.force_end)
        self.cells_aligned += int(cols["x_size"].sum()) * (2 * self.band + 1)
        self.util["live"] += len(chunk)
        self.util["batch"] += B
        self.util["rows_live"] += int(cols["x_size"].sum())
        self.util["rows_padded"] += B * xw
        return B, [cols[k] for k in names]

    def _dispatch_fused(self, chunk, preps, xw, aw, arena: bool = False):
        """Upload + launch the single fused forward/find-max/traceback
        dispatch for one chunk; returns everything _collect_fused needs
        WITHOUT forcing the device result (the fetch happens at collect
        time, after every chunk is in flight)."""
        lmax = -(-(2 * xw + 2 * self.band + 8) // 4) * 4
        lean = self._resolve_lean()
        if arena:
            B, cols = self._pack_chunk_arena(chunk, preps, xw)
            fn = self._fused_align(B, xw, aw, lmax,
                                   all_full=bool(cols[3].min() < 0),
                                   lean=lean, arena=True)
            self.bytes_up += 12 * 4 * B
            self.dispatches += 1
            buf = fn(self._arena_packed(), *cols)
            return chunk, buf, lmax, B, lean
        (B, a_win, b_win, begin_a, end_a, a_len, x_size, fstart,
         fend) = self._pack_chunk(chunk, preps, xw, aw)
        # begin_a < 0 (reference tail windows) re-enables pos==0 lanes
        # at arbitrary depth: both kernel forms fall back to their
        # exact all-step body for such batches
        fn = self._fused_align(B, xw, aw, lmax,
                               all_full=bool(begin_a.min() < 0),
                               lean=lean)
        a_pk, b_pk = self._pack4(a_win), self._pack4(b_win)
        self.bytes_up += a_pk.nbytes + b_pk.nbytes + 8 * 4 * B
        self.dispatches += 1
        buf = fn(a_pk, b_pk, begin_a, end_a,
                 a_len, x_size, fstart, fend)
        return chunk, buf, lmax, B, lean

    def _collect_fused(self, pend, preps, out):
        chunk, buf, lmax, B, lean = pend
        buf = np.asarray(buf)  # the one device->host fetch per chunk
        band = self.band
        if lean:
            (xf, yf, cnt, matches, gapa, gapb, hasm, fmx, fmy, lmx, lmy,
             score, found) = (buf[k] for k in range(13))
            for t, i in enumerate(chunk):
                p = preps[i]
                if not found[t]:
                    out[i] = Alignment()
                    continue
                n = int(cnt[t])
                ba = int(p.begin_a + xf[t] + yf[t] - band) + 1
                bb = int(p.begin_b + xf[t]) + 1
                hom = 0.0 if n == 0 else int(matches[t]) * 100.0 / n
                if hasm[t]:
                    fm = (True, (int(p.begin_a + fmx[t] + fmy[t] - band),
                                 int(p.begin_b + fmx[t])))
                    lm = (True, (int(p.begin_a + lmx[t] + lmy[t] - band),
                                 int(p.begin_b + lmx[t])))
                else:
                    # reference no-match fallbacks (my_alignment.cc:168/
                    # :229): first -> fully-advanced position, last ->
                    # the alignment begin
                    fm = (False, (ba + n - int(gapa[t]),
                                  bb + n - int(gapb[t])))
                    lm = (False, (ba, bb))
                out[i] = Alignment(
                    begin_a=ba, begin_b=bb, a_size=len(p.a),
                    b_size=len(p.b), score=int(score[t]), homology=hom,
                    lean=(n, int(matches[t]), fm, lm))
            return
        lp = lmax // 4
        pk = buf[:lp]                # (LMAX/4, B) 2-bit-packed codes
        tail = buf[lp:]
        xf = tail[0:4].T.copy().view(np.int32).ravel()
        yf = tail[4:8].T.copy().view(np.int32).ravel()
        cnt = tail[8:12].T.copy().view(np.int32).ravel()
        score = tail[12:16].T.copy().view(np.int32).ravel()
        found = tail[16:20].T.copy().view(np.int32).ravel()
        band = self.band
        for t, i in enumerate(chunk):
            p = preps[i]
            if not found[t]:
                out[i] = Alignment()
                continue
            n = int(cnt[t])
            nb = (n + 3) // 4
            col = pk[:nb, t]
            codes = np.empty(nb * 4, np.uint8)
            codes[0::4] = col & 3
            codes[1::4] = (col >> 2) & 3
            codes[2::4] = (col >> 4) & 3
            codes[3::4] = (col >> 6) & 3
            edits = codes[:n][::-1]
            matches = int((edits == MATCH).sum())
            x = int(xf[t])
            pos = p.begin_a + x + int(yf[t]) - band
            homology = 0.0 if n == 0 else matches * 100.0 / n
            out[i] = Alignment(
                begin_a=pos + 1, begin_b=p.begin_b + x + 1,
                a_size=len(p.a), b_size=len(p.b), score=int(score[t]),
                homology=homology, edits=np.ascontiguousarray(edits))

    def _run_chunk(self, chunk, preps, out, xw, aw):
        band = self.band
        (B, a_win, b_win, begin_a, end_a, a_len, x_size, fstart,
         _fend) = self._pack_chunk(chunk, preps, xw, aw)
        # negative begins (reference tail alignments) re-enable pos==0
        # lanes at arbitrary row depth: force the exact row body
        fwd = self._forward_fused(B, xw, aw,
                                  all_full=bool(begin_a.min() < 0))
        a_pk = self._pack4(a_win)
        b_pk = self._pack4(b_win)
        dirs, fused = fwd(a_pk, b_pk, begin_a, end_a, a_len,
                          x_size, fstart)
        fused = np.asarray(fused)  # one fetch: (B, 2*YP)
        last_rows = fused[:, :fused.shape[1] // 2]
        dvacc = fused[:, fused.shape[1] // 2:]
        # pallas forward returns packed (XW/16, B, YP) planes, the XLA
        # forward (B, XW, YP) bytes — decide by BACKEND, not by shape
        # (XW=128 planes with a padded batch of 8 collide: both axes 8)
        packed = self._use_pallas()
        dirs = np.asarray(dirs)
        # (pallas + device-traceback batches go through the fused
        # single-dispatch path in align_many, never through here)

        y_size = 2 * band + 1
        finds = []  # (t, i, p, max_i, max_j, max_score) of found problems
        for t, i in enumerate(chunk):
            p = preps[i]
            lr = last_rows[t, :y_size]
            # pos_a == end_a diagonal cells (device gathered one per row)
            if p.end_a >= p.begin_a + band:
                i0 = p.end_a - (p.begin_a + band)
            else:
                i0 = 0
            diag_is = []
            diag_vals = []
            ii = i0
            jj = p.end_a - p.begin_a - ii + band
            while ii < p.x_size and jj >= 0:
                if 0 <= jj < y_size:
                    diag_is.append(ii)
                    diag_vals.append(dvacc[t, jj])
                ii += 1
                jj -= 1
            found, max_i, max_j, max_score = _find_max_from(
                lr, diag_vals, diag_is, p, band)
            if not found:
                out[i] = Alignment()
                continue
            finds.append((t, i, p, max_i, max_j, max_score))

        for t, i, p, max_i, max_j, max_score in finds:
            res = _traceback_native(dirs, packed, t, p, band, max_i, max_j)
            if res is not None:
                edits, matches, x, pos = res
            else:
                dview = _PackedDirs(dirs[:, t, :]) if packed else dirs[t]
                edits, matches, x, pos = _traceback_from_dirs(
                    dview, p, band, max_i, max_j)
            homology = 0.0 if not edits else matches * 100.0 / len(edits)
            out[i] = Alignment(
                begin_a=pos + 1, begin_b=p.begin_b + x + 1,
                a_size=len(p.a), b_size=len(p.b), score=max_score,
                homology=homology, edits=np.array(edits, np.uint8))


_default_engine: BswEngine | None = None


def bsw_align_device(a, begin_a, end_a, b, begin_b, end_b,
                     force_start=False, force_end=False) -> Alignment:
    """Drop-in aligner callable backed by the batched device engine."""
    global _default_engine
    if _default_engine is None:
        _default_engine = BswEngine()
    return _default_engine.align_one(a, begin_a, end_a, b, begin_b, end_b,
                                     force_start, force_end)
