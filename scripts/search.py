"""Cluster entrypoint: query an index.

    spark-submit --py-files codebased_spark.zip scripts/search.py \
        --index-dir /data/idx --query 'handleRequest "server started"' -k 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", "--top-k", type=int, default=32)
    ap.add_argument("--scores-only", action="store_true",
                    help="skip the metadata join (Q7)")
    args = ap.parse_args()

    from codebased_spark.plans.engine import FtsIndex
    from codebased_spark.session import get_spark

    spark = get_spark(app_name="codebased-search")
    spark.sparkContext.setLogLevel("ERROR")
    index = FtsIndex(spark, args.index_dir)
    t0 = time.time()
    if args.scores_only:
        rows = index.search(args.query, args.top_k).collect()
        for r in rows:
            print(f"{r['score']:+.9f}  nm={int(r['name_match'])}  doc={r['doc_id']}")
    else:
        rows = index.search_with_metadata(args.query, args.top_k).collect()
        for r in rows:
            print(
                f"{r['score']:+.9f}  nm={int(r['name_match'])}  "
                f"{r['repo']}/{r['path']}  {r['kind']}:{r['name']}"
            )
    print(f"# {len(rows)} results in {time.time() - t0:.3f}s "
          f"over {index.n_docs} docs")
    spark.stop()


if __name__ == "__main__":
    main()
