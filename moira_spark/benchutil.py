"""Host-characterization helpers shared by bench.py and bench_scaling.py.

Single home for the measurement discipline so both benchmarks stay in
lockstep: this firecracker VM runs identical workloads 2-3x slower until
~60-90s of sustained wide CPU load has elapsed (hypervisor frequency /
credit ramp), and transient steal windows slow individual runs up to 5x —
so burn the cores before timing, and record steal alongside every run.
"""

from __future__ import annotations

import time


def _burn(args: tuple[float, int]) -> float:
    """One process of the all-core busy loop (module-level: picklable)."""
    seconds, seed = args
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.random((400, 400))
    t_end = time.time() + seconds
    s = 0.0
    while time.time() < t_end:
        s += float((a @ a).sum())
    return s


def ramp_cpu(seconds: float, procs: int) -> None:
    """Bring the virtualized host up to full speed before timing anything.

    Spawn (not fork) context: bench.py calls this AFTER the Spark JVM and
    its py4j threads are up, and forking a multithreaded process is a known
    intermittent-deadlock source (a thread holding a lock at fork time
    leaves the child's copy locked forever).  The burn workers only need
    numpy, so the spawn startup cost is noise."""
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(procs) as p:
        p.map(_burn, [(seconds, i) for i in range(procs)])


def cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — Linux-only, (0, 1) elsewhere."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)
    except OSError:
        return 0, 1
