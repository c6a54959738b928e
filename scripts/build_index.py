"""Cluster entrypoint: build (or resume) the inverted index.

    spark-submit --py-files codebased_spark.zip scripts/build_index.py \
        --corpus <iceberg-table-or-parquet-path> --index-dir /data/idx \
        --num-blocks 4096 --chunk

(`codebased_spark.session.make_pyfiles_zip()` produces the zip; when run
with plain `python` the session helper ships it automatically.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--corpus", help="Iceberg table name or parquet path")
    src.add_argument("--repo", help="path inside a git checkout: walk it "
                     "gitignore-aware (the reference's first-contact path)")
    src.add_argument("--synthetic", type=int, default=0,
                     help="index N generated files (demo)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--num-blocks", type=int, default=32,
                    help="doc blocks; size so a block's tokens fit a task (~1e8 max)")
    ap.add_argument("--chunk", action="store_true", help="emit per-definition docs")
    ap.add_argument("--resume", action="store_true", help="skip completed stages")
    ap.add_argument("--hot-phrases", default="",
                    help="comma-separated phrases for the phrase-df side "
                         "table (query-log hot set); prefix 'top:N' mines "
                         "the corpus's N hottest word bigrams instead")
    args = ap.parse_args()

    from codebased_spark.session import get_spark
    from codebased_spark.sources.corpus import gen_corpus, read_corpus

    spark = get_spark(app_name="codebased-build")
    if args.synthetic:
        corpus = gen_corpus(spark, max(1, args.synthetic // 10), 10)
    elif args.repo:
        from codebased_spark.sources.gitwalk import repo_corpus

        corpus = repo_corpus(spark, args.repo)
    else:
        corpus = read_corpus(spark, args.corpus)

    from codebased_spark.plans.engine import build_index

    t0 = time.time()
    index = build_index(
        spark, corpus, args.index_dir,
        num_blocks=args.num_blocks, chunk=args.chunk, resume=args.resume,
    )
    n_hot = 0
    if args.hot_phrases:
        from codebased_spark.operators.phrasedf import (
            build_phrase_df,
            hot_phrases_from_corpus,
        )

        if args.hot_phrases.startswith("top:"):
            phrases = hot_phrases_from_corpus(
                corpus, top_n=int(args.hot_phrases[4:]))
        else:
            phrases = [p.strip() for p in args.hot_phrases.split(",") if p.strip()]
        n_hot = len(build_phrase_df(spark, index, phrases))
    print(json.dumps({
        "index_dir": args.index_dir,
        "n_docs": index.n_docs,
        "avgdl": round(index.avgdl, 3),
        "blocks": len(index.posting_files),
        "build_sec": round(time.time() - t0, 2),
        "hot_phrases": n_hot,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
