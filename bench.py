#!/usr/bin/env python
"""Benchmark: banded-SW forward DP throughput on the accelerator.

Prints ONE JSON line:
  {"metric": "bsw_forward_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": N / <8-thread CPU DP cells/s>, "parity": "ok",
   "method": "...", "platform": "..."}

The baseline is bench/cpu_baseline.cc — an independent C++
implementation of the reference's DP recurrence
(lib/src/alignment/banded_smith_waterman.cc:70) run with 8 threads,
standing in for 8-thread gam-merge (the reference itself needs Boost /
sparsehash, which this image lacks).  GCUPS counts logical band cells
(x_size × 301 per problem).

Measurement method (tunnel-safe).  Through the remote-PJRT "axon"
tunnel the pathology is NOT steady per-dispatch RTT; measured behavior
(2026-08-21): compiles can be fast or minutes (remote-compile queue),
and the FIRST device->host copy of a process can stall for minutes,
after which dispatch+drain are sub-millisecond.  Host-side loops of
chained executes in fresh subprocesses (the round-2 method) pay that
unpredictable first-copy stall per child and timed out (BENCH_r02
rc=1).  Honest kernel time here:

  * ONE process; one warmup drain absorbs the first-copy stall;
  * the timed unit is a single dispatch running K forward kernels
    back-to-back ON DEVICE via lax.fori_loop (data-dependent carry so
    iterations cannot be CSE'd/overlapped), drained by one scalar;
  * GCUPS = cells*(K2-K1) / (T(K2)-T(K1)): upload, RTT, drain and
    dispatch costs cancel in the difference; min-of-repeats rejects
    tunnel hiccups.  Fallback when the slope is degenerate: the
    amortized rate cells*K2/T(K2) (a strict lower bound).

Stage order puts `pallas_parity` FIRST — the one check that validates
the COMPILED Mosaic kernel on real hardware (tests only run interpret
mode) must be captured even if timing later fails.  A watchdog thread
prints the JSON line and exits rc=0 at the deadline no matter which
stage is stuck (GAM_BENCH_DEADLINE seconds, default 1500).
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BAND = 150
YS = 2 * BAND + 1
B = 128
XW = 1024
AW = 1536  # >= XW + YP (YP=384), padded
K_SMALL, K_LARGE = 64, 576
REPEATS = 3

_report = {
    "metric": "bsw_forward_gcups",
    "value": 0.0,
    "unit": "GCUPS",
    "vs_baseline": 0.0,
    "parity": "not-run",
    "method": "none",
    "platform": "unknown",
}
_printed = threading.Event()


def _emit():
    if not _printed.is_set():
        _printed.set()
        print(json.dumps(_report), flush=True)


def _watchdog(deadline: float):
    def run():
        left = deadline - time.monotonic()
        if left > 0:
            time.sleep(left)
        if not _printed.is_set():
            _report["method"] += "+deadline-hit"
            _emit()
            os._exit(0)

    t = threading.Thread(target=run, daemon=True)
    t.start()


def _problem_args(aw=AW):
    rng = np.random.default_rng(0)
    a_win = rng.integers(0, 4, size=(B, aw)).astype(np.uint8)
    b_win = np.empty((B, XW), np.uint8)
    b_win[:] = a_win[:, BAND:BAND + XW]
    noise = rng.random(b_win.shape) < 0.05
    b_win[noise] = (b_win[noise] + 1) % 4
    return (a_win, b_win,
            np.full(B, BAND, np.int32), np.full(B, BAND + XW - 1, np.int32),
            np.full(B, aw, np.int32), np.full(B, XW, np.int32),
            np.zeros(B, np.int32))


def _build_loop(kernel: str = "antidiag"):
    """jit((K, args...) -> scalar) running K chained forwards on device.

    The carry feeds each iteration's b characters from the previous
    iteration's scores (values stay in 0..3), so XLA cannot hoist,
    dedupe, or reorder the kernel executions; K is traced, so the
    whole sweep costs ONE compile.

    kernel: "antidiag" (the production skewed-band kernel — no in-row
    scan, measured 1.6x the row form) or "row" (the full/lean row
    split, kept as the fallback and reported as a secondary rate).
    """
    import jax
    import jax.numpy as jnp

    from gam_ngs_tpu.ops import bsw_pallas
    from gam_ngs_tpu.ops.bsw_batch import forward_builder

    use_pallas = jax.devices()[0].platform != "cpu"
    if use_pallas and kernel == "antidiag":
        raw = bsw_pallas.pallas_forward_antidiag_raw(B, XW, BAND)
        kind = "pallas-antidiag"
    elif use_pallas:
        raw = bsw_pallas.pallas_forward_raw(B, XW, AW, BAND)
        kind = "pallas-row"
    else:
        raw = forward_builder(B, XW, AW, BAND)
        kind = "xla"

    def loop(K, a_win, b0, begin_a, end_a, a_len, x_size, fstart):
        def body(_, carry):
            b, acc = carry
            _dirs, last_row, _dv = raw(a_win, b, begin_a, end_a, a_len,
                                       x_size, fstart)
            t = last_row[0, :1] & 1
            b = (b + t) & 3  # data-dependent: serializes iterations
            return b, acc + last_row[0, 0]

        _, acc = jax.lax.fori_loop(0, K, body, (jnp.asarray(b0, jnp.int32),
                                                jnp.int32(0)))
        return acc

    return jax.jit(loop), kind


def _time_loop(fn, K, args) -> float:
    t0 = time.perf_counter()
    acc = fn(np.int32(K), *args)
    float(np.asarray(acc))  # D2H drain forces completion
    return time.perf_counter() - t0


def _time_kernel(kernel: str):
    from gam_ngs_tpu.ops.bsw_pallas import antidiag_dims

    aw = antidiag_dims(XW, BAND)[2] if kernel == "antidiag" else AW
    loop, kind = _build_loop(kernel)
    args = _problem_args(aw)

    t0 = time.time()
    _time_loop(loop, 1, args)  # compile + first-copy stall absorbed here
    print(f"[bench] {kind} compile+first-drain {time.time() - t0:.1f}s",
          file=sys.stderr)

    ts = min(_time_loop(loop, K_SMALL, args) for _ in range(REPEATS))
    tl = min(_time_loop(loop, K_LARGE, args) for _ in range(REPEATS))
    per_iter = (tl - ts) / (K_LARGE - K_SMALL)
    print(f"[bench] {kind}: T({K_SMALL})={ts:.4f}s T({K_LARGE})={tl:.4f}s "
          f"-> {per_iter * 1e3:.3f} ms/kernel", file=sys.stderr)
    cells = float(B) * XW * YS
    if per_iter > 0:
        return kind + "-fori-slope", round(cells / per_iter / 1e9, 4)
    # degenerate slope: amortized lower bound
    return kind + "-fori-amortized", round(cells * K_LARGE / tl / 1e9, 4)


def stage_timing() -> None:
    import jax

    _report["platform"] = jax.devices()[0].platform
    _report["method"], _report["value"] = _time_kernel("antidiag")
    if _report["platform"] != "cpu":
        try:  # fallback row kernel as a secondary rate (comparability)
            _m, _report["row_gcups"] = _time_kernel("row")
        except Exception as e:
            print(f"[bench] row-kernel timing failed: {e}", file=sys.stderr)


def cpu_baseline_cells_per_sec() -> float:
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench")
    binary = os.path.join(here, "cpu_baseline")
    src = os.path.join(here, "cpu_baseline.cc")
    if (not os.path.exists(binary)
            or os.path.getmtime(binary) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O3", "-march=native", "-pthread",
                        "-o", binary, src], check=True)
    best = 0.0
    for _ in range(2):  # best-of-2: host-load dips would flatter us
        out = subprocess.run([binary, "8", "200"], check=True,
                             capture_output=True, text=True,
                             timeout=300).stdout
        for line in out.splitlines():
            if line.startswith("CELLS_PER_SEC"):
                best = max(best, float(line.split()[1]))
    if best <= 0:
        raise RuntimeError("baseline produced no measurement")
    return best


def _parity_problems():
    """64-problem quirk-lane set, all in ONE padded shape bucket
    (XW=256 — each extra shape risks a slow remote compile):

      * mixed force_start / force_end / N chars / indels;
      * x_size <= FORCE_MAXGAP_LEN force_end windows — the reference's
        unsigned-underflow quirk (banded_smith_waterman.cc:201) must
        null the alignment;
      * force_start lanes crossing the FORCE_MAXGAP_LEN fresh/forced
        boundary (:116);
      * short windows (x_size 11..40).

    begin_a < 0 tail batches (PctgBuilder.cc:1549) come separately:
    mixing them into the main set would flip the whole chunk to the
    all-full kernel variant and un-test the full/lean split.
    """
    rng = np.random.default_rng(7)
    main, neg = [], []
    for k in range(48):
        n = int(rng.integers(180, 250))
        a = rng.integers(0, 5, size=n).astype(np.uint8)
        b = a.copy()
        noise = rng.random(n) < 0.08
        b[noise] = (b[noise] + 1 + rng.integers(0, 3, noise.sum())) % 4
        if k % 3 == 0:  # indel
            cut = n // 2
            b = np.concatenate([b[:cut], b[cut + 7:]]).astype(np.uint8)
        fs, fe = k % 4 == 1, k % 4 == 2
        eb = len(b) - 1
        if k % 6 == 5:  # force_end underflow window (x_size <= 10)
            eb = int(rng.integers(1, 10))
            fe = True
        elif k % 6 == 4:  # short window
            eb = int(rng.integers(11, 40))
        main.append((a, 0, n - 1, b, 0, eb, fs, fe))
    for k in range(16):
        n = int(rng.integers(150, 240))
        a = rng.integers(0, 4, size=n).astype(np.uint8)
        b = np.concatenate([rng.integers(0, 4, 40).astype(np.uint8),
                            a[:170].copy()])
        ba = -int(rng.integers(5, 80))
        neg.append((a, ba, n - 1, b, 0, len(b) - 1, False, k % 2 == 0))
    return main, neg


def pallas_parity() -> str:
    """Value-check the compiled device kernels against the cell-exact
    host oracle ON THE REAL DEVICE (tests run the Pallas kernels only in
    interpret mode; a Mosaic lowering bug would otherwise ship
    silently).  Raises on any mismatch."""
    from gam_ngs_tpu.ops.bsw_batch import BswEngine
    from gam_ngs_tpu.ops.bsw_ref import bsw_align
    from gam_ngs_tpu.ops.editops import first_match_pos, last_match_pos

    main, neg = _parity_problems()

    def check(eng, problems, label):
        got = eng.align_many(problems)
        lean = eng._resolve_lean() if eng.fetch == "auto" \
            else eng.fetch == "lean"
        for i, pr in enumerate(problems):
            want = bsw_align(*pr)
            g = got[i]
            same = (g.score == want.score and g.begin_a == want.begin_a
                    and g.begin_b == want.begin_b
                    and abs(g.homology - want.homology) < 1e-9
                    and g.length == want.length)
            if lean:
                same = (same
                        and first_match_pos(g) == first_match_pos(want)
                        and last_match_pos(g) == last_match_pos(want))
            elif want.edits is not None and g.edits is not None:
                same = same and list(g.edits) == list(want.edits)
            if not same:
                raise AssertionError(
                    f"device/oracle mismatch ({label}) on problem "
                    f"{i}: score {g.score}!={want.score} begin_a "
                    f"{g.begin_a}!={want.begin_a} begin_b {g.begin_b}!="
                    f"{want.begin_b}")
        print(f"[bench] pallas parity ({label}): "
              f"{len(problems)} problems ok", file=sys.stderr)

    # host traceback (direction download + C++ walk, row kernel),
    # device/edits and device/lean (fused anti-diagonal dispatch:
    # forward + find-max + lockstep walk); the negative-begin batch
    # exercises both kernels' all-full fallback on hardware
    check(BswEngine(traceback="host", fetch="edits"), main, "host/edits")
    for fetch in ("edits", "lean"):
        eng = BswEngine(traceback="device", fetch=fetch)
        check(eng, main, f"device/{fetch}/antidiag")
        check(eng, neg, f"device/{fetch}/antidiag-negbegin")
    eng_row = BswEngine(traceback="device", fetch="lean", kernel="row")
    check(eng_row, main, "device/lean/row-fallback")
    return "ok"


def main():
    deadline = time.monotonic() + float(
        os.environ.get("GAM_BENCH_DEADLINE", "1500"))
    _watchdog(deadline)

    try:  # parity FIRST: must be captured even if timing fails
        t0 = time.time()
        _report["parity"] = pallas_parity()
        print(f"[bench] parity stage {time.time() - t0:.1f}s",
              file=sys.stderr)
    except Exception as e:
        _report["parity"] = f"failed: {e}"[:300]
        print(f"[bench] parity FAILED: {e}", file=sys.stderr)

    try:
        stage_timing()
    except Exception as e:
        _report["method"] = f"timing-failed: {e}"[:300]
        print(f"[bench] timing failed: {e}", file=sys.stderr)

    try:
        cpu_cps = cpu_baseline_cells_per_sec()
    except Exception as e:  # keep the bench alive without a toolchain
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
        cpu_cps = 4.97e8  # last measured value (8 threads, this host)
    if _report["value"]:
        _report["vs_baseline"] = round(_report["value"] * 1e9 / cpu_cps, 3)
    print(f"[bench] device {_report['value']} GCUPS "
          f"({_report['platform']}, {_report['method']}); "
          f"cpu-8t {cpu_cps / 1e9:.3f} GCUPS; parity={_report['parity']}",
          file=sys.stderr)
    _emit()


if __name__ == "__main__":
    main()
