"""Presence-pruning POSITIVE-case demo (VERDICT r06 "Next round" #1).

Every prior artifact showed hit-producing queries scanning ALL shards
(32/32, 160/160): the bench's synthetic corpus is trigram-uniform, so
every block contains every query trigram and only the no-hit query
pruned. This demo builds the corpus shape real repositories have —
rare content concentrated in FEW files, hence few doc-blocks — and
captures a hit-producing rare-phrase query scheduling
``shards_scanned ~ df-bearing blocks << n_shards_total``, with
interleaved pruned-vs-unpruned latency and bit-identity.

Corpus: ``n_files`` uniform synthetic files across ``num_blocks`` doc
blocks, plus ``n_rare`` files (one extra repo) whose content embeds a
sentinel identifier built from trigrams that appear NOWHERE else.
Doc-blocks are hash(repo, path) partitions, so the rare files land in
at most ``n_rare`` distinct blocks — the presence manifest proves the
other blocks cannot match and the scan list shrinks accordingly.

Usage: python tools/presence_demo.py [n_files] [num_blocks] [n_rare]
Prints one JSON line (saved by the caller as BENCH_presence_demo_r07).
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

RARE_PHRASE = "zqvx_kw sentinel_jqzz"  # trigrams absent from gen_corpus
MID_PHRASE = "half_rare_qxj marker"    # planted in ~25% of blocks


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    num_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_rare = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from codebased_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from codebased_spark.functions.fts5 import phrase_terms, query_phrases
    from codebased_spark.operators.query import _prune_posting_files
    from codebased_spark.plans.engine import FtsIndex, build_index
    from codebased_spark.sources.corpus import CORPUS_SCHEMA, gen_corpus

    base = gen_corpus(spark, n_repos=max(1, n_files // 10), files_per_repo=10)
    rare_rows = [
        ("rare-repo", f"src/rare_{i}.py", "e" * 40, "python",
         f'"""{RARE_PHRASE} module."""\n\nRARE = "{RARE_PHRASE}"\n')
        for i in range(n_rare)
    ]
    # a mid-frequency marker planted in ~1/4 of the BASE files' repos
    # (deterministic): those files keep their content plus the marker
    mid_rows = [
        ("mid-repo-%03d" % i, "src/mid_%03d.py" % i, "f" * 40, "python",
         f'MID = "{MID_PHRASE} {i}"\n')
        for i in range(max(1, num_blocks // 2))
    ]
    corpus = base.unionByName(
        spark.createDataFrame(rare_rows + mid_rows, CORPUS_SCHEMA))

    idx_dir = os.path.join(tempfile.gettempdir(), f"presence_demo_{n_files}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    index = build_index(spark, corpus, idx_dir, num_blocks=num_blocks)
    build_sec = round(time.time() - t0, 3)
    index.driver_direct = False
    index.search("warmup", 10).collect()
    index.search("warm once more", 10).collect()

    unpruned = FtsIndex(spark, idx_dir)
    unpruned.driver_direct = False
    unpruned.term_blocks = None  # the control: scan every shard

    queries = {
        "rare_phrase": f'"{RARE_PHRASE}"',
        "mid_phrase": f'"{MID_PHRASE}"',
        "common_phrase": '"hello world"',
        "no_hit": '"zzz_never_anywhere_qqq"',
    }
    out: dict = {}
    for name, q in queries.items():
        tids = [phrase_terms(p) for p in query_phrases(q)]
        files = _prune_posting_files(
            index.posting_files, tids, None, index.term_blocks)
        pruned_t, unpruned_t = [], []
        hits_p = hits_u = None
        for _ in range(3):  # interleaved best-of-3 (BENCH.md discipline)
            index._search_cache.clear()
            unpruned._search_cache.clear()
            t = time.time()
            hp = index.search(q, 32).collect()
            pruned_t.append(time.time() - t)
            t = time.time()
            hu = unpruned.search(q, 32).collect()
            unpruned_t.append(time.time() - t)
            hits_p, hits_u = hp, hu
        ident = [(r["doc_id"], r["name_match"], r["rank"]) for r in hits_p] == \
                [(r["doc_id"], r["name_match"], r["rank"]) for r in hits_u]
        out[name] = {
            "shards_scanned": len(files),
            "n_shards_total": len(index.posting_files),
            "hits": len(hits_p),
            "pruned_sec_best": round(min(pruned_t), 3),
            "unpruned_sec_best": round(min(unpruned_t), 3),
            "pruned_samples": [round(x, 3) for x in pruned_t],
            "unpruned_samples": [round(x, 3) for x in unpruned_t],
            "bit_identical": bool(ident),
        }
        assert ident, f"{name}: pruned != unpruned"

    assert out["rare_phrase"]["hits"] > 0, "rare phrase must produce hits"
    assert out["rare_phrase"]["shards_scanned"] <= n_rare
    assert out["no_hit"]["shards_scanned"] == 0

    print(json.dumps({
        "metric": "presence_pruning_demo",
        "files": int(index.n_docs),
        "num_blocks": num_blocks,
        "n_rare_files": n_rare,
        "build_sec": build_sec,
        "queries": out,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
