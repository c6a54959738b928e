"""Hardware-envelope control for the scaling bench (no Spark, no JVM).

Runs W independent np.sort tasks (3M int64 each) under plain
multiprocessing and reports wall-clock per worker count. This measures
the MACHINE's parallel-scaling ceiling for sort-like, memory-bandwidth
bound work — the same resource profile as the index build's lexsort.
Interpreting tools/scaling_bench.py results requires this number: if the
host throttles or hits its bandwidth wall, the engine cannot measure
above it on a single box.

Usage: python tools/hw_control.py [workers ...]   (default: 1 2 4 8)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _task(seed: int) -> int:
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 62, size=3_000_000, dtype=np.int64)
    a.sort()
    return int(a[0])


def run(workers: int, tasks: int = 32) -> float:
    t0 = time.time()
    with mp.Pool(workers) as pool:
        pool.map(_task, range(tasks))
    return round(time.time() - t0, 3)


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    wall = {w: run(w) for w in counts}
    out = {"metric": "hw_control_np_sort", "wall_sec": wall}
    for w in counts:
        if w * 4 in wall:
            # speedup = T_w / T_4w ; efficiency = speedup / 4
            out[f"eff_{w}x4"] = round((wall[w] / wall[w * 4]) / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
