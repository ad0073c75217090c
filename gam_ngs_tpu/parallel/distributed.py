"""Multi-host runtime: partition sharding + result regathering.

The merge workload's unit of distribution is the graph partition
(independent by construction, SURVEY.md §2.7): hosts take disjoint
partition subsets, run the batched build locally on their own chips,
and host 0 reassembles results in canonical graph order so output files
stay byte-identical to the single-host run.  The create phase shards by
BAM file / contig range with psum'd statistics (parallel.step).

Collectives ride jax.distributed (ICI within a slice, DCN across):
  * library statistics — psum of (count, sum, sumsq) moments;
  * paired contigs — allgather of pickled per-partition results;
  * configuration — broadcast from process 0 (implicit: every host
    parses the same inputs deterministically).

Single-process runs short-circuit every collective, so the same code
path works from one chip to a pod slice.
"""

from __future__ import annotations

import os
import pickle
import sys
import threading
import time

# Set after any BarrierTimeout: jax.distributed requires every process to
# issue collectives in the same program order, and a timed-out collective
# is still in flight on the abandoned worker thread — any further
# collective from this process would pair with the orphan and corrupt or
# hang the pod.  Once poisoned, the process must terminate.
_poisoned: str | None = None


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when configured; returns
    (process_id, num_processes).  With no coordinator (or env config)
    it is a single-process no-op."""
    import jax

    if coordinator:
        try:  # CPU backend needs gloo for cross-process collectives
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def proc_info() -> tuple[int, int]:
    """(process_id, num_processes) of the current jax runtime — (0, 1)
    when jax.distributed was never initialized (single host)."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_partitions(sizes: list[int], num_hosts: int, host_id: int
                     ) -> list[int]:
    """Deterministic size-balanced assignment: graphs sorted by
    descending size go round-robin to the least-loaded host (greedy
    LPT).  Returns the canonical indices owned by `host_id`; every host
    computes the same assignment, so no coordination is needed."""
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    load = [0] * num_hosts
    own: list[list[int]] = [[] for _ in range(num_hosts)]
    for i in order:
        h = min(range(num_hosts), key=lambda k: (load[k], k))
        own[h].append(i)
        load[h] += max(1, sizes[i])
    return sorted(own[host_id])


class BarrierTimeout(RuntimeError):
    """A cross-host collective did not complete within the deadline —
    some peer host is hung or dead.  The reference has no distributed
    mode and thus no detector (SURVEY.md §5); here a silent pod-wide
    hang is converted into a loud, attributable failure.

    **Unrecoverable.**  The timed-out collective is still in flight on
    an abandoned worker thread; issuing any further collective from
    this process would mismatch program order across the pod.  The
    process is poisoned (every later allgather_obj raises immediately)
    and must exit.  Set GAM_BARRIER_FATAL=1 to have the process
    os._exit(1) instead of raising.
    """


def _poison(msg: str):
    global _poisoned
    _poisoned = msg
    if os.environ.get("GAM_BARRIER_FATAL", "") not in ("", "0"):
        print(f"[distributed] fatal: {msg}", file=sys.stderr, flush=True)
        os._exit(1)


def _reset_poison():
    """Clear the poisoned state (tests only — a real process must exit)."""
    global _poisoned
    _poisoned = None


def _with_deadline(fn, timeout_s: float, what: str):
    """Run `fn` in a worker thread; raise BarrierTimeout (poisoning the
    process — see BarrierTimeout) if it does not finish within
    `timeout_s` seconds (<=0 disables the deadline)."""
    if timeout_s <= 0:
        return fn()
    box: list = []
    err: list = []

    def worker():
        try:
            box.append(fn())
        except BaseException as e:  # propagate to the caller thread
            err.append(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        msg = (f"{what} did not complete within {timeout_s:.0f}s — "
               f"a peer host is likely hung or dead")
        _poison(msg)
        raise BarrierTimeout(msg)
    if err:
        raise err[0]
    return box[0]


def barrier_timeout_s() -> float:
    """Collective deadline in seconds (env GAM_BARRIER_TIMEOUT,
    default 600; 0 disables).  Malformed or negative values are
    rejected loudly rather than silently disabling the deadline."""
    raw = os.environ.get("GAM_BARRIER_TIMEOUT", "600")
    try:
        v = float(raw)
    except ValueError:
        raise ValueError(
            f"invalid GAM_BARRIER_TIMEOUT={raw!r}: expected a number of "
            f"seconds (0 disables the deadline)") from None
    if v < 0:
        raise ValueError(
            f"invalid GAM_BARRIER_TIMEOUT={raw!r}: must be >= 0 "
            f"(0 disables the deadline)")
    return v


def allgather_obj(local_obj, timeout_s: float | None = None,
                  _gather=None) -> list:
    """All-gather an arbitrary picklable object across processes
    (returns [obj] single-process).  Uses the jax multihost utils'
    process_allgather over a padded uint8 buffer; the whole exchange
    (size + payload collectives) shares ONE `timeout_s` deadline,
    raising BarrierTimeout on expiry.  A BarrierTimeout is
    **unrecoverable** (see its docstring): this process is poisoned and
    every later call raises immediately — the caller must terminate the
    process, not retry.  `_gather` overrides the collective (tests)."""
    import jax

    if _poisoned is not None:
        raise BarrierTimeout(
            f"process poisoned by an earlier barrier timeout "
            f"({_poisoned}); collectives are no longer safe — exit")

    if jax.process_count() == 1 and _gather is None:
        return [local_obj]

    import numpy as np

    if _gather is None:
        from jax.experimental import multihost_utils

        _gather = multihost_utils.process_allgather
    if timeout_s is None:
        timeout_s = barrier_timeout_s()

    # one deadline for the whole exchange, not one per collective
    deadline = time.monotonic() + timeout_s if timeout_s > 0 else 0.0

    def remaining() -> float:
        if timeout_s <= 0:
            return 0.0
        return max(deadline - time.monotonic(), 1e-3)

    payload = pickle.dumps(local_obj)
    n = np.array([len(payload)], np.int64)
    sizes = _with_deadline(lambda: _gather(n),
                           remaining(), "size allgather").reshape(-1)
    cap = int(sizes.max())
    buf = np.zeros(cap, np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = _with_deadline(lambda: _gather(buf),
                              remaining(), "payload allgather")
    out = []
    for k in range(len(sizes)):
        out.append(pickle.loads(gathered[k, :int(sizes[k])].tobytes()))
    return out


def distributed_build_pctgs(graphs, master_ref, slave_ref, master_bam,
                            slave_bam, engine, no_mult_filter=False,
                            debug=False, log=None):
    """Partition-sharded merge across jax processes.

    Each host builds its shard with the batched scheduler; results are
    allgathered and reassembled in canonical graph order.  Returns the
    full pctg list (identical on every host; the caller on host 0
    writes outputs).
    """
    from ..merge.builder import build_pctgs_batched

    pid, n = (0, 1)
    import jax

    try:
        pid, n = jax.process_index(), jax.process_count()
    except Exception:
        pass

    sizes = [g.n for g in graphs]
    mine = shard_partitions(sizes, n, pid)
    local_graphs = [graphs[i] for i in mine]
    local_pctgs: list = []
    per_graph: dict[int, list] = {}
    import time as _time

    t0 = _time.time()
    cells0 = getattr(engine, "cells_aligned", 0)
    build_pctgs_batched(local_graphs, master_ref, slave_ref, master_bam,
                        slave_bam, local_pctgs, engine, no_mult_filter,
                        debug, log=log, per_graph_out=per_graph)
    if log is not None and n > 1:
        # per-host align COMPUTE seconds (before the allgather wait)
        # plus per-host aligned CELLS — the wall seconds are polluted
        # by core contention when all processes share one machine, so
        # the cells (work units actually dispatched by this host) are
        # the direct division evidence
        log(f"[dist] host {pid}: align compute seconds = "
            f"{_time.time() - t0:.2f} over {len(local_graphs)} owned "
            f"graphs ({sum(g.n for g in local_graphs)} vertices)")
        log(f"[dist] host {pid}: aligned cells = "
            f"{getattr(engine, 'cells_aligned', 0) - cells0}")

    # allgather per-graph contributions; splice in canonical graph
    # order (cg_id keys), so the result equals the sequential run
    all_parts = allgather_obj(per_graph)
    combined: dict[int, list] = {}
    for part in all_parts:
        combined.update(part)
    merged: list = []
    for g in graphs:
        merged.extend(combined.get(g.cg_id, []))
    return merged
