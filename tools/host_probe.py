"""Host-state probe: quantifies co-tenant contention before/after a bench.

The sandbox shares a physical host; rounds 15-16 repeatedly saw uniform
1.3-2x multiplicative drift across EVERY query with zero local processes
running (OPTIMIZATION_r15.md "host-state drift", OPTIMIZATION_r16.md
Baseline).  This probe measures the two observable components so a bench
window can be gated and the drift claim audited:

- **steal%** — from the 8th field of ``/proc/stat``'s ``cpu`` line,
  sampled over ``--secs``: CPU the hypervisor gave to a co-tenant while
  this VM had runnable work.  Nonzero steal is direct evidence of a
  neighbor; but steal only counts cycles *taken*, not shared-LLC /
  memory-bandwidth pressure, so a loaded neighbor can cost 1.5x with
  single-digit steal.
- **spin_1t / spin_mt** — wall seconds for a fixed single-thread and a
  32-process integer-arithmetic workload (pure CPU, no allocation after
  warmup).  Compare against the committed quiet-window reference in the
  round log: a ratio >1.15 on either means the window is NOT comparable
  to the quiet baseline and a full-artifact bench should wait.

Usage::

    python tools/host_probe.py [--secs 10] [--json]

Prints one human line (or one JSON line with ``--json``):
``steal_pct``, ``spin_1t_sec``, ``spin_mt_sec``, ``loadavg_1m``.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

SPIN_N = 2_000_000  # fixed work unit: deterministic integer loop


def _spin(n: int = SPIN_N) -> int:
    acc = 1469598103934665603  # FNV offset basis; arbitrary
    for i in range(n):
        acc = (acc ^ i) * 1099511628211 % (1 << 64)
    return acc


def _cpu_fields() -> list[int]:
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu "):
                return [int(x) for x in line.split()[1:]]
    raise RuntimeError("no cpu line in /proc/stat")


def probe(secs: float = 10.0) -> dict:
    # steal sample brackets the spin workloads so it reflects the same
    # window the timings came from
    before = _cpu_fields()
    t0 = time.perf_counter()
    _spin()  # warm the loop (bytecode cache, CPU frequency step-up)
    t1 = time.perf_counter()
    _spin()
    spin_1t = time.perf_counter() - t1

    ncpu = os.cpu_count() or 1
    t2 = time.perf_counter()
    with mp.Pool(ncpu) as pool:
        pool.map(_spin, [SPIN_N] * ncpu)
    spin_mt = time.perf_counter() - t2

    remaining = secs - (time.perf_counter() - t0)
    if remaining > 0:
        time.sleep(remaining)
    after = _cpu_fields()
    deltas = [a - b for a, b in zip(after, before)]
    total = sum(deltas) or 1
    steal_pct = 100.0 * deltas[7] / total if len(deltas) > 7 else 0.0

    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    return {
        "steal_pct": round(steal_pct, 2),
        "spin_1t_sec": round(spin_1t, 3),
        "spin_mt_sec": round(spin_mt, 3),
        "loadavg_1m": load1,
        "ncpu": ncpu,
        "window_sec": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    secs = 10.0
    if "--secs" in sys.argv:
        secs = float(sys.argv[sys.argv.index("--secs") + 1])
    out = probe(secs)
    if "--json" in sys.argv:
        print(json.dumps(out))
    else:
        print(f"steal {out['steal_pct']}%  spin_1t {out['spin_1t_sec']}s  "
              f"spin_mt {out['spin_mt_sec']}s  load1 {out['loadavg_1m']}  "
              f"({out['ncpu']} cpus, {out['window_sec']}s window)")


if __name__ == "__main__":
    main()
