"""Headline benchmark: index-build throughput + query latency.

Builds the full posting-list index over the sf corpus (driver documents
table mapped to corpus shape + a 3x deterministic synthetic code corpus)
and times the reference query shapes against it. Prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Scaling-efficiency evidence (north_rule N vs 4N) is produced by
tools/scaling_bench.py and recorded in BASELINE.md / BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = {
    "q1_common_words": "table merge",
    "q2_rare_phrase": '"customer query"',
    "q3_conjunctive3": "spark stream window",
    "q4_clamped_common": "value",
    "q5_code_hello": "hello world",
    "q6_special_chars": "print('print(\"Hello world\");');",
}


def _hw_probe() -> dict:
    """Self-calibration: the numpy hardware control (tools/hw_control.py,
    no Spark) at 1 and 8 workers, run BEFORE the bench. This VM
    throttles sustained load monotonically through a session (BENCH.md
    'host collapse' sections), so a bench artifact is only
    interpretable next to the host's state at measurement time —
    embed it in the same JSON line."""
    import json as _json
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "hw_control.py"), "1", "8"],
            capture_output=True, text=True, timeout=300,
        )
        wall = _json.loads(out.stdout.strip().splitlines()[-1])["wall_sec"]
        return {"hw_np_sort_1w_sec": wall.get("1"),
                "hw_np_sort_8w_sec": wall.get("8")}
    except Exception:
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    hw = _hw_probe()

    from codebased_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from codebased_spark.plans.engine import build_index
    from codebased_spark.sources.corpus import documents_as_corpus, gen_corpus

    docs_corpus = documents_as_corpus(spark, sf_dir)
    n_docs = docs_corpus.count()
    # synthetic-corpus size is env-overridable so the scaling harness
    # (tools/scaling_bench.py) can use a compute-dominated workload
    synth_files = int(os.environ.get("SPARK_GRAFT_SYNTH_FILES", 3 * n_docs))
    synth = gen_corpus(spark, n_repos=max(1, synth_files // 10), files_per_repo=10)

    # Materialize the corpus BEFORE the timer: index-build throughput
    # measures the engine reading an existing table (as on a cluster),
    # not synthetic-data generation. This also warms the executor
    # python workers, so files/sec is the steady-state rate a long job
    # amortizes to, not JVM+worker cold-start.
    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_sf{sf}_{synth_files}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        docs_corpus.unionByName(synth).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    idx_dir = os.path.join(tempfile.gettempdir(), f"bench_idx_sf{sf}")
    shutil.rmtree(idx_dir, ignore_errors=True)

    # num_blocks is intentionally FIXED (not cpus-derived): doc ids,
    # shards, and scores are identical at any parallelism — scaling the
    # cluster never changes results, only wall-clock.
    t0 = time.time()
    index = build_index(spark, corpus, idx_dir, num_blocks=32)
    build_sec = time.time() - t0
    n_files = index.n_docs  # file-level docs: 1 doc == 1 file
    # primary metrics measure the DISTRIBUTED engine (r1-r5 comparable);
    # the sf0.1 store is small enough for the zero-job direct path, which
    # gets its own section below
    index.driver_direct = False

    # warm the posting scan + executor python workers once so query
    # timings measure the engine, not first-touch costs. (Each phrase
    # must be >= 3 chars per trigram semantics or no job runs at all;
    # both the single- and multi-phrase shapes get a first touch.)
    index.search("warmup", 10).collect()
    index.search("warm once more", 10).collect()

    # Primary queries run best-of-REPS (VERDICT r05 #7: the scale-demo
    # measurement discipline — single-shot numbers on this drifting
    # host conflate engine and window). The search cache is cleared per
    # rep so every rep is a real scan, never a cache hit.
    reps = int(os.environ.get("SPARK_GRAFT_QUERY_REPS", "3"))
    q_times: dict[str, float] = {}
    for name, q in QUERIES.items():
        times = []
        for _rep in range(reps):
            index._search_cache.clear()
            t = time.time()
            index.search(q, 32).collect()
            times.append(time.time() - t)
        q_times[name] = round(min(times), 3)

    # batched execution: one shared scan + two jobs for the whole set
    batch_times = []
    for _rep in range(min(reps, 2)):
        index._search_cache.clear()
        tb = time.time()
        index.search_batch(list(QUERIES.values()), 32).count()
        batch_times.append(time.time() - tb)
    batch_sec = round(min(batch_times), 3)

    # total keeps its r1-r5 meaning — build + 6 uncovered queries +
    # batch — as the SUM of the recorded components (a wall-clock diff
    # would now include the extra reps; comparability note in BENCH.md)
    total = round(build_sec + sum(q_times.values()) + batch_sec, 3)

    # SPARK_GRAFT_BENCH_LITE=1 stops here (primary metrics only): the
    # scaling harness compares build throughput across core counts and
    # the hot/mined sections below would only stretch its 1-core legs
    lite = os.environ.get("SPARK_GRAFT_BENCH_LITE") == "1"

    # term->block presence pruning (operators/presence.py) is ON in all
    # of the above (it's the engine default); record how many shards
    # each query actually scheduled vs the total — driver-side only,
    # costs nothing
    extra: dict = {}
    if index.term_blocks is not None:
        from codebased_spark.functions.fts5 import phrase_terms as _pt
        from codebased_spark.functions.fts5 import query_phrases as _qp
        from codebased_spark.operators.query import _prune_posting_files

        shards = {}
        for name, q in QUERIES.items():
            tids = [_pt(p) for p in _qp(q)]
            shards[name] = len(_prune_posting_files(
                index.posting_files, tids, None, index.term_blocks))
        extra["presence"] = {
            "n_shards_total": len(index.posting_files),
            "shards_scanned": shards,
        }

    # hot-phrase df side table (operators/phrasedf.py): build it for
    # the bench phrases (the operational model: a query log's hot set),
    # then time the same queries on the covered multi-trigram-WAND
    # path. Primary metrics above stay uncovered-path for r1-r3
    # comparability; this section measures the lever's delta.
    from codebased_spark.functions.fts5 import query_phrases
    from codebased_spark.operators.phrasedf import build_phrase_df

    if not lite:
        hot = sorted({p for q in QUERIES.values() for p in query_phrases(q)})
        tp = time.time()
        build_phrase_df(spark, index, hot)
        phrase_df_sec = round(time.time() - tp, 3)
        q_hot: dict[str, float] = {}
        for name, q in QUERIES.items():
            times = []
            for _rep in range(reps):
                index._search_cache.clear()
                t = time.time()
                index.search(q, 32).collect()
                times.append(time.time() - t)
            q_hot[name] = round(min(times), 3)
        batch_times = []
        for _rep in range(min(reps, 2)):
            index._search_cache.clear()
            tb = time.time()
            index.search_batch(list(QUERIES.values()), 32).count()
            batch_times.append(time.time() - tb)
        batch_hot_sec = round(min(batch_times), 3)
        hot_lat = sorted(q_hot.values())
        extra.update({
            "queries_hot_phrase_df": q_hot,
            "p50_hot_sec": hot_lat[len(hot_lat) // 2],
            "phrase_df_build_sec": phrase_df_sec,
            "batch6_hot_total_sec": batch_hot_sec,
        })

        # operational mining costs (VERDICT r05 #1). Two sources:
        # (a) the QUERY LOG — the steady-state loop: the searches above
        #     filled index.query_log, so mining it is a driver-side
        #     frequency count (no Spark job at all);
        # (b) the corpus bootstrap (before traffic exists), now with
        #     sampled candidate generation (pass 1 over a 25% doc
        #     sample, pass 2 re-counts candidates exactly — one full
        #     n-gram expansion instead of two).
        from codebased_spark.operators.phrasedf import (
            hot_phrases_from_corpus,
            hot_phrases_from_query_log,
        )

        tq = time.time()
        log_mined = hot_phrases_from_query_log(index.query_log, top_n=64)
        log_mine_sec = round(time.time() - tq, 4)

        tm = time.time()
        mined = hot_phrases_from_corpus(corpus, top_n=64,
                                        sample_fraction=0.25)
        mine_sec = round(time.time() - tm, 3)
        tp = time.time()
        build_phrase_df(spark, index, mined)
        mined_table_sec = round(time.time() - tp, 3)
        mined_covered = sorted(
            name for name, q in QUERIES.items()
            if index._covering_dfs(q) is not None)
        # INTERLEAVED covered-vs-uncovered A/B (the discipline VERDICT
        # r04/r05 demanded: sequential sections on this drifting host
        # are not comparable). Per query: alternate mined-covered and
        # uncovered reps back-to-back, best-of-2 each.
        from codebased_spark.plans.engine import FtsIndex

        cold_idx = FtsIndex(spark, idx_dir)
        cold_idx.driver_direct = False
        cold_idx.phrase_dfs = {}
        q_mined: dict[str, float] = {}
        q_mined_cold: dict[str, float] = {}
        for name, q in QUERIES.items():
            hots, colds = [], []
            for _rep in range(2):
                index._search_cache.clear()
                cold_idx._search_cache.clear()
                t = time.time()
                index.search(q, 32).collect()
                hots.append(time.time() - t)
                t = time.time()
                cold_idx.search(q, 32).collect()
                colds.append(time.time() - t)
            q_mined[name] = round(min(hots), 3)
            q_mined_cold[name] = round(min(colds), 3)
        extra["mined_hot_phrases"] = {
            "query_log_mine_sec": log_mine_sec,
            "query_log_covers_all_bench_queries": all(
                p in set(log_mined)
                for q in QUERIES.values() for p in query_phrases(q)),
            "mine_sec": mine_sec,
            "mine_sample_fraction": 0.25,
            "table_build_sec": mined_table_sec,
            "n_phrases": len(mined),
            "covered_queries": mined_covered,
            "queries": q_mined,
            "queries_uncovered_interleaved": q_mined_cold,
        }

        # zero-job driver-direct path (engages automatically for stores
        # under the byte gate — the embedded single-repo regime); runs
        # with the mined table loaded, i.e. the engine as it would serve
        from codebased_spark.plans.engine import FtsIndex

        direct_idx = FtsIndex(spark, idx_dir)
        if direct_idx.driver_direct:
            direct_idx.search("warmup", 10).collect()
            q_direct: dict[str, float] = {}
            for name, q in QUERIES.items():
                t = time.time()
                direct_idx.search(q, 32).collect()
                q_direct[name] = round(time.time() - t, 3)
            tb = time.time()
            direct_idx.search_batch(list(QUERIES.values()), 32).count()
            d_lat = sorted(q_direct.values())
            extra["driver_direct"] = {
                "postings_bytes": direct_idx.postings_bytes,
                "queries": q_direct,
                "p50_sec": d_lat[len(d_lat) // 2],
                "batch6_total_sec": round(time.time() - tb, 3),
            }

    lat = sorted(q_times.values())
    p50 = lat[len(lat) // 2]

    # trailing probe closes the bracket: hw state before AND after the
    # measured sections (skipped in lite mode to keep scaling legs
    # cheap — their control runs in the same window via the harness)
    hw_post = {} if lite else {
        k + "_post": v for k, v in _hw_probe().items()}

    # The session's FIRST-CONTACT official run (captured as the very
    # first Spark job, before any other load) is the interpretable
    # record on this monotonically-degrading host (BENCH.md "host
    # collapse"); embed it so a late-window driver artifact carries
    # the healthy-window numbers alongside its own.
    first_contact = {}
    fc_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_first_contact.json")
    try:
        with open(fc_path) as f:
            fc = json.load(f)
        if "first_contact" in fc:  # never nest a prior embed
            fc.pop("first_contact")
        first_contact = {"first_contact": fc}
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "index_build_plus_queries",
                "value": total,
                "unit": "sec",
                "queries": q_times,
                "sf": sf,
                "files": n_files,
                "build_sec": round(build_sec, 3),
                "build_files_per_sec": round(n_files / build_sec, 1),
                "p50_query_sec": p50,
                "query_reps_best_of": reps,
                "batch6_total_sec": batch_sec,
                "batch6_per_query_sec": round(batch_sec / len(QUERIES), 3),
                **extra,
                "cpus": cpus,
                **hw,
                **hw_post,
                **first_contact,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
