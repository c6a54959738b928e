"""Scale demonstration (VERDICT r03 #3): build + query at 10x-50x the
bench corpus (200k and ~1M files), recording build throughput, per-query
latency (cold path and phrase-df-covered path), WHICH tail each query
took (driver vs JVM), and the candidate-row count the driver pulled —
the honest sandbox proxy for "would these plans survive 100x".

Hot-vs-cold comparison is INTERLEAVED per query (hot first, then cold,
3 reps each, best-of per arm) rather than sequential passes: this VM's
throughput drifts monotonically within a session (BENCH.md "host
collapse"), so sequential pass ordering confounds path cost with host
drift — r04's artifact showed the covered path "losing" at 1M purely
because the hot pass ran second (VERDICT r04 #1). numpy probes bracket
each scale so the window's health is in the artifact.

Usage: python tools/scale_demo.py [n_files ...]   (default: 200000 1000000)
Env:   SPARK_GRAFT_CPUS (default 32)

Prints one JSON line per scale. The corpus is materialized to parquet
BEFORE the build timer (the engine's job is indexing an existing table,
not generating synthetic data).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
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


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from codebased_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import codebased_spark.operators.query as q
    from codebased_spark.functions.fts5 import query_phrases
    from codebased_spark.operators.phrasedf import build_phrase_df
    from codebased_spark.plans.engine import build_index
    from codebased_spark.sources.corpus import documents_as_corpus, gen_corpus

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # tail instrumentation: record (tail, candidate_rows) per search
    tails: list[tuple[str, int | None]] = []
    orig_fd, orig_fj = q._finish_driver, q._finish_jvm

    def fd(rows, *a, **k):
        tails.append(("driver", len(rows)))
        return orig_fd(rows, *a, **k)

    def fj(cand, *a, **k):
        tails.append(("jvm", None))
        return orig_fj(cand, *a, **k)

    q._finish_driver, q._finish_jvm = fd, fj

    for n_files in sizes:
        # same corpus mix as bench.py: the driver's documents table (so
        # every bench query shape has real hits) + deterministic
        # synthetic code files up to n_files
        corpus_dir = os.path.join(tempfile.gettempdir(), f"scale_corpus_{n_files}")
        if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
            shutil.rmtree(corpus_dir, ignore_errors=True)
            docs = documents_as_corpus(spark, sf_dir)
            synth = gen_corpus(
                spark, n_repos=max(1, (n_files - docs.count()) // 10),
                files_per_repo=10,
            )
            docs.unionByName(synth).write.mode("overwrite").parquet(corpus_dir)
        corpus = spark.read.parquet(corpus_dir)

        # blocks scale with corpus so per-block posting shards stay
        # row-group-prunable (~6k docs/block at every size)
        num_blocks = max(32, n_files // 6250)
        idx_dir = os.path.join(tempfile.gettempdir(), f"scale_idx_{n_files}")
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        index = build_index(spark, corpus, idx_dir, num_blocks=num_blocks)
        build_sec = time.time() - t0

        index.search("warmup", 10).collect()
        index.search("warm once more", 10).collect()

        hot_phrases = sorted(
            {p for qq in QUERIES.values() for p in query_phrases(qq)})
        tp = time.time()
        build_phrase_df(spark, index, hot_phrases)
        phrase_df_sec = round(time.time() - tp, 3)
        saved_dfs = dict(index.phrase_dfs)

        def probe() -> float:
            import numpy as np

            a = np.random.default_rng(0).integers(
                0, 1 << 62, size=8_000_000, dtype=np.int64)
            t = time.time()
            np.sort(a)
            return round(time.time() - t, 3)

        def timed(qq: str) -> tuple[float, tuple[str, int | None]]:
            index._search_cache.clear()
            tails.clear()
            t = time.time()
            index.search(qq, 32).collect()
            return round(time.time() - t, 3), (
                tails[-1] if tails else ("none", None))

        probe_before = probe()
        reps = 3
        cold, hot = {}, {}
        for name, qq in QUERIES.items():
            hot_secs, cold_secs = [], []
            hot_meta = cold_meta = ("none", None)
            for _ in range(reps):
                index.phrase_dfs = saved_dfs          # hot arm first
                sec, hot_meta = timed(qq)
                hot_secs.append(sec)
                index.phrase_dfs = {}                 # cold arm
                sec, cold_meta = timed(qq)
                cold_secs.append(sec)
            hot[name] = {"sec": min(hot_secs), "reps": hot_secs,
                         "tail": hot_meta[0], "cand_rows": hot_meta[1]}
            cold[name] = {"sec": min(cold_secs), "reps": cold_secs,
                          "tail": cold_meta[0], "cand_rows": cold_meta[1]}
        probe_after = probe()

        index.phrase_dfs = saved_dfs
        index._search_cache.clear()
        tails.clear()
        tb = time.time()
        index.search_batch(list(QUERIES.values()), 32).count()
        batch_sec = round(time.time() - tb, 3)

        # presence pruning at this block count (driver-side, free):
        # shards each query would schedule vs the total
        presence = {}
        if index.term_blocks is not None:
            from codebased_spark.functions.fts5 import phrase_terms

            shards = {}
            for name, qq in QUERIES.items():
                tids = [phrase_terms(p) for p in query_phrases(qq)]
                shards[name] = len(q._prune_posting_files(
                    index.posting_files, tids, None, index.term_blocks))
            presence = {"presence": {
                "n_shards_total": len(index.posting_files),
                "shards_scanned": shards}}

        lat = sorted(v["sec"] for v in cold.values())
        lat_hot = sorted(v["sec"] for v in hot.values())
        print(json.dumps({
            "metric": "scale_demo",
            "files": int(index.n_docs),
            "num_blocks": num_blocks,
            "cpus": cpus,
            "build_sec": round(build_sec, 3),
            "build_files_per_sec": round(index.n_docs / build_sec, 1),
            "p50_query_sec": lat[len(lat) // 2],
            "p50_hot_sec": lat_hot[len(lat_hot) // 2],
            "phrase_df_build_sec": phrase_df_sec,
            "batch6_per_query_sec": round(batch_sec / len(QUERIES), 3),
            "interleaved_reps": reps,
            "hw_np_sort8M_before_sec": probe_before,
            "hw_np_sort8M_after_sec": probe_after,
            "queries": cold,
            "queries_hot": hot,
            **presence,
        }), flush=True)

    q._finish_driver, q._finish_jvm = orig_fd, orig_fj
    spark.stop()


if __name__ == "__main__":
    main()
