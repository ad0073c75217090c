"""On-chip randomized parity soak: 256 problems spanning random
begins (incl. negative tail-window begins), force_start/force_end
combinations, N characters, end_b clipping and indels, checked against
the exact host oracle through BOTH fused fetch modes (lean + edits) on
the real chip.  Usage: python bench/parity_soak.py
"""
import sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
from gam_ngs_tpu.ops.bsw_batch import BswEngine
from gam_ngs_tpu.ops.bsw_ref import bsw_align

rng = np.random.default_rng(2026)
problems = []
for k in range(256):
    n = int(rng.integers(30, 500))
    hi = 5 if rng.random() < 0.3 else 4
    a = rng.integers(0, hi, size=n).astype(np.uint8)
    b = a.copy()
    noise = rng.random(n) < rng.uniform(0.02, 0.15)
    b[noise] = (b[noise] + 1 + rng.integers(0, 3, noise.sum())) % 4
    if rng.random() < 0.4:
        cut = int(rng.integers(1, n))
        dl = int(rng.integers(1, 30))
        b = np.concatenate([b[:cut], b[cut + dl:]]).astype(np.uint8)
    if len(b) < 2:
        continue
    ba = 0
    if rng.random() < 0.2:
        ba = -int(rng.integers(1, 120))
    elif rng.random() < 0.3:
        ba = int(rng.integers(0, n // 2))
    ea = int(rng.integers(max(ba, 0), n))
    bb = int(rng.integers(0, max(1, len(b) // 3)))
    eb = int(rng.integers(bb, len(b) + 40))  # may exceed len(b): clip path
    fs, fe = rng.random() < 0.25, rng.random() < 0.25
    problems.append((a, ba, ea, b, bb, eb, fs, fe))

for fetch in ("lean", "edits"):
    eng = BswEngine(traceback="device", fetch=fetch)
    got = eng.align_many(problems)
    bad = 0
    for i, pr in enumerate(problems):
        want = bsw_align(*pr)
        g = got[i]
        ok = (g.score == want.score and g.begin_a == want.begin_a
              and g.begin_b == want.begin_b and g.length == want.length
              and abs(g.homology - want.homology) < 1e-9)
        if fetch == "edits" and want.edits is not None and g.edits is not None:
            ok = ok and list(g.edits) == list(want.edits)
        if not ok:
            bad += 1
            print(f"  MISMATCH {fetch} #{i}: pr=(len_a={len(pr[0])}, ba={pr[1]}, ea={pr[2]}, len_b={len(pr[3])}, bb={pr[4]}, eb={pr[5]}, fs={pr[6]}, fe={pr[7]}) got score {g.score} want {want.score}")
    print(f"[soak {fetch}] {len(problems)-bad}/{len(problems)} ok "
          f"(dispatches {eng.dispatches})")
    assert bad == 0
print("SOAK_OK")
