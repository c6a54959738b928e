"""Noop-sink timing of EVERY declared query in __spark_entry__
(guide §1.4): each DataFrame is computed column-complete via
``write.format("noop")`` so the numbers time the computation, not a
sink or driver collect. Jobs are labeled per query for the UI.

Usage: SPARK_GRAFT_SF_DIR=... python tools/entry_noop_bench.py [reps]
Prints one JSON line {"queries": {name: best_sec}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry
    from codebased_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    out: dict = {}
    for name, fn in entry.queries().items():
        times = []
        err = None
        for _ in range(reps):
            try:
                sc.setJobDescription(f"noop:{name}")
                t = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.time() - t)
            except Exception as e:  # keep sweeping; record the failure
                err = str(e)[:200]
                break
            finally:
                sc.setJobDescription(None)
        out[name] = {"best_sec": round(min(times), 3)} if times else {}
        if err:
            out[name]["err"] = err
        if len(times) > 1:
            out[name]["samples"] = [round(x, 3) for x in times]
    print(json.dumps({
        "metric": "entry_noop_queries",
        "sf_dir": sf_dir,
        "reps": reps,
        "cpus": cpus,
        "queries": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
