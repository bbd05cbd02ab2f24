"""Host-characterization helpers shared by bench.py and bench_scaling.py.

Single home for the measurement discipline so both benchmarks stay in
lockstep.  Two measured host regimes: a warm-up regime where the first
~60-90s of sustained wide CPU load runs 2-3x slow (hypervisor frequency /
credit ramp — round 2) and a credit-exhaustion regime where sustained
burning STARVES the runs that follow (round 5).  ramp_cpu is therefore
adaptive: burn only until a wide probe stops improving, bounded by the
caller's budget.  Transient steal windows additionally slow single runs
up to 5x — record steal alongside every run and report best-of-K.
"""

from __future__ import annotations

import time


def _probe_once(procs: int, reps: int = 40) -> float:
    """Wall seconds for a fixed-size wide matmul burn: ``procs`` threads,
    each ``reps`` 400x400 matmuls.  numpy releases the GIL inside dot, so
    threads occupy all cores without any process spawn."""
    import threading

    import numpy as np

    a = np.random.default_rng(0).random((400, 400))

    def work():
        for _ in range(reps):
            a @ a

    t0 = time.time()
    ts = [threading.Thread(target=work) for _ in range(procs)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return time.time() - t0


def ramp_cpu(seconds: float, procs: int) -> None:
    """Bring the virtualized host up to full speed before timing anything —
    ADAPTIVELY (round 5, sixth session).  ``seconds`` is now a MAXIMUM
    budget, not a fixed burn.

    Two host regimes were measured on this VM and they want opposite
    behavior: the round-2 "slow first 60-90 s of wide load" regime (burn
    until fast) and a round-5 credit-exhaustion regime where a fixed 60 s
    all-core burn CONSUMED the budget the timed runs needed — every
    fixed-ramp bench landed 1.5-3x slow while rampless probes ran at
    full speed, and the old 32-process spawn pool itself stalled for
    minutes.  So: probe with a fixed-size wide burn and stop as soon as
    two consecutive probes stop improving on the best (warm host: ~2
    probes, a few seconds; cold host: keeps burning toward the budget).
    In-process threads (numpy releases the GIL), zero process spawns."""
    deadline = time.time() + seconds
    best = None
    steady = 0
    while time.time() < deadline and steady < 2:
        t = _probe_once(procs)
        if best is None or t < best * 0.93:
            best = t if best is None else min(best, t)
            steady = 0
        else:
            best = min(best, t)
            steady += 1


def cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — Linux-only, (0, 1) elsewhere."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except OSError:
        return 0, 1
