"""Interleaved batch-latency A/B across block counts (VERDICT r06 #3:
"batch6_per_query 0.146 s at 32 blocks vs 0.199 s at 160 blocks —
settle whether the drift is the engine or the host").

Opens two ALREADY-BUILT indexes (tools/scale_demo.py leaves them under
/tmp) and alternates search_batch calls between them, best-of-N per
arm, with numpy probes bracketing the window — so both block counts
see the same host state and the comparison is engine-only.

Usage: python tools/batch_blocks_ab.py [idx_a] [idx_b] [reps]
Defaults: /tmp/scale_idx_200000 /tmp/scale_idx_1000000 5
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = {
    "q1_common_words": "table merge",
    "q2_rare_phrase": '"customer query"',
    "q3_conjunctive3": "spark stream window",
    "q4_clamped_common": "value",
    "q5_code_hello": "hello world",
    "q6_special_chars": "print('print(\"Hello world\");');",
}


def _probe() -> float:
    import numpy as np

    a = np.random.RandomState(0).rand(8_000_000)
    t = time.time()
    np.sort(a)
    return round(time.time() - t, 3)


def main() -> None:
    idx_a = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_idx_200000"
    idx_b = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_idx_1000000"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from codebased_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from codebased_spark.plans.engine import FtsIndex

    arms = {}
    for label, d in (("a", idx_a), ("b", idx_b)):
        ix = FtsIndex(spark, d)
        ix.driver_direct = False
        ix.phrase_dfs = {}  # uncovered path — same arm the bench times
        ix.search("warmup", 10).collect()
        arms[label] = ix

    probe_before = _probe()
    qs = list(QUERIES.values())
    times = {"a": [], "b": []}
    for _ in range(reps):
        for label, ix in arms.items():
            ix._search_cache.clear()
            t = time.time()
            ix.search_batch(qs, 32).count()
            times[label].append(round(time.time() - t, 3))
    probe_after = _probe()

    out = {"metric": "batch_blocks_ab", "reps": reps, "cpus": cpus,
           "hw_np_sort8M_before_sec": probe_before,
           "hw_np_sort8M_after_sec": probe_after}
    for label, d in (("a", idx_a), ("b", idx_b)):
        ix = arms[label]
        out[label] = {
            "index_dir": d,
            "files": ix.n_docs,
            "n_blocks": len(ix.posting_files),
            "batch6_samples": times[label],
            "batch6_best": min(times[label]),
            "batch6_per_query_best": round(min(times[label]) / len(qs), 3),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
