"""Index lifecycle: build, persist, load, search (SURVEY.md §3.4).

On-disk layout (<index_dir>/):
  doc_stats/    parquet — per-doc metadata + lengths (no content)
  postings/     parquet partitioned by pblock, rows sorted by (term, col)
  corpus_stats/ parquet — single row (n_docs, avgdl, num_blocks, version)
  _manifest/    one JSON per completed stage with lineage + metrics

Resumability (north_rule): each stage commits atomically (parquet
_SUCCESS + a manifest record written after). ``build_index(...,
resume=True)`` skips stages whose manifest records exist, so a killed
build re-runs only the missing stages; within a stage, partition-level
retry/commit is Spark's task-commit protocol. Manifest records carry
per-pblock row counts and byte sizes — the per-partition lineage +
metrics record. (Reference analogue: single SQLite transaction + fts
'optimize' at codebased/index.py:336,668-672; stats dump at
codebased/stats.py:59-69.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codebased_spark import DEFAULT_TOP_K, __version__
from codebased_spark.operators.build import build_postings_fused
from codebased_spark.operators.docs import build_docs

FORMAT_VERSION = 1


def _postings_footer_metrics(postings_dir: str) -> dict:
    """Per-block lineage metrics straight from parquet footers + the
    filesystem — zero Spark jobs (driver-side, O(#files))."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for root, _dirs, files in os.walk(postings_dir):
        base = os.path.basename(root)
        if not base.startswith("pblock="):
            continue
        pb = base.split("=", 1)[1]
        rows = 0
        size = 0
        for fn in files:
            if fn.endswith(".parquet"):
                full = os.path.join(root, fn)
                rows += pq.ParquetFile(full).metadata.num_rows
                size += os.path.getsize(full)
        out[pb] = {"rows": rows, "bytes": size}
    return out


def _manifest_path(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, "_manifest", f"{stage}.json")


def _stage_done(index_dir: str, stage: str) -> bool:
    return os.path.exists(_manifest_path(index_dir, stage))


def _write_manifest(index_dir: str, stage: str, payload: dict) -> None:
    os.makedirs(os.path.join(index_dir, "_manifest"), exist_ok=True)
    tmp = _manifest_path(index_dir, stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(index_dir, stage))


class FtsIndex:
    """A loaded index: handles to the three tables + broadcast scalars."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        stats = spark.read.parquet(os.path.join(index_dir, "corpus_stats")).collect()[0]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        d = stats.asDict()
        self.total_dl = int(d.get("total_dl", round(self.avgdl * self.n_docs)))
        self.num_blocks = int(stats["num_blocks"])
        from codebased_spark.operators.build import POSTING_SCHEMA

        # empty corpora leave the postings dir file-less; pin the schema
        # so loading never depends on footer inference
        self.postings = spark.read.schema(POSTING_SCHEMA).parquet(
            os.path.join(index_dir, "postings")
        )
        self.doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
        self.posting_files = self._list_posting_files()
        self.deleted = self._load_deleted()
        # Q13 search cache (codebased/index.py:186-209): per-(query, k)
        # memo of materialized results; a reload (incremental commit
        # returns a fresh FtsIndex) starts clean, mirroring the
        # clear-on-commit at codebased/index.py:668-669.
        self._search_cache: dict[tuple[str, int], DataFrame] = {}

    def _load_deleted(self):
        """Tombstoned doc_ids from incremental updates (sorted int64
        array, None when absent). Applied inside the candidate scan so
        deleted docs affect neither matches nor df/idf."""
        import numpy as np

        d = os.path.join(self.index_dir, "deletes")
        if not os.path.isdir(d):
            return None
        arr = (
            self.spark.read.parquet(d).select("doc_id").toPandas()["doc_id"].to_numpy()
        )
        return np.unique(arr.astype("int64")) if arr.size else None

    def _list_posting_files(self) -> list[tuple[int, str]]:
        out = []
        base = os.path.join(self.index_dir, "postings")
        for root, _dirs, files in os.walk(base):
            b = os.path.basename(root)
            if b.startswith("pblock="):
                pb = int(b.split("=", 1)[1])
                out.extend(
                    (pb, os.path.join(root, f))
                    for f in sorted(files)
                    if f.endswith(".parquet")
                )
        return sorted(out)

    def search(self, query: str, top_k: int = DEFAULT_TOP_K) -> DataFrame:
        """(doc_id, name_match, rank, score) best-first — rank-identical
        to the reference's search_once full-text path. Uses the pyarrow
        shard scan when the shard files are directly readable, else the
        generic DataFrame scan (same results by test)."""
        from codebased_spark.operators.query import search_index, search_index_files

        key = (query, top_k)
        hit = self._search_cache.get(key)
        if hit is not None:
            return hit
        if self.posting_files:
            out = search_index_files(
                self.spark, self.posting_files, query, self.n_docs, self.avgdl,
                top_k, deleted=self.deleted,
            )
        else:
            out = search_index(
                self.postings, query, self.n_docs, self.avgdl, top_k,
                deleted=self.deleted,
            )
        self._search_cache[key] = out
        return out

    def search_batch(self, queries: list[str], top_k: int = DEFAULT_TOP_K) -> DataFrame:
        """Batched search: one shared posting scan + two Spark jobs for
        the whole batch (the shape for offline batch scoring). Returns
        (qid, doc_id, name_match, rank, score); rank-identical per query
        to :meth:`search` (tested)."""
        from codebased_spark.operators.query import search_index_files_batch

        return search_index_files_batch(
            self.spark, self.posting_files, queries, self.n_docs, self.avgdl,
            top_k, deleted=self.deleted,
        )

    def search_with_metadata(self, query: str, top_k: int = DEFAULT_TOP_K) -> DataFrame:
        """Q7: join survivors to doc metadata (broadcast the tiny top-k
        side — reference joins object rows at codebased/search.py:278-296)."""
        hits = self.search(query, top_k)
        return (
            self.doc_stats.join(F.broadcast(hits), "doc_id")
            .orderBy(F.desc("name_match"), F.asc("rank"), F.asc("doc_id"))
        )

    def verify_against_corpus(self, hits: DataFrame, corpus: DataFrame) -> DataFrame:
        """Q11 staleness filter: drop hits whose stored sha256 no longer
        matches the current corpus content (search.py:440-442; the
        input_hint end-to-end sha256 invariant)."""
        current = corpus.select(
            "repo", "path", F.sha2(F.col("content").cast("binary"), 256).alias("cur_sha"),
        )
        meta = self.doc_stats.join(F.broadcast(hits), "doc_id")
        return (
            meta.join(current, ["repo", "path"], "left")
            .filter(F.col("cur_sha") == F.col("sha256"))
            .drop("cur_sha")
            .orderBy(F.desc("name_match"), F.asc("rank"), F.asc("doc_id"))
        )


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    num_blocks: int = 32,
    chunk: bool = False,
    resume: bool = False,
) -> FtsIndex:
    """Build (or resume building) the index from a corpus DataFrame."""
    docs = None

    def get_docs():
        nonlocal docs
        if docs is None:
            docs = build_docs(corpus, num_blocks=num_blocks, chunk=chunk).persist()
        return docs

    block_rows = None

    def get_block_rows():
        # one tiny agg yields BOTH the per-block lineage and the global
        # corpus stats (N, avgdl) — computed at most once per build
        nonlocal block_rows
        if block_rows is None:
            block_rows = (
                get_docs()
                .groupBy(F.shiftright("doc_id", 40).alias("pblock"))
                .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl"))
                .collect()
            )
        return block_rows

    if not (resume and _stage_done(index_dir, "doc_stats")):
        d = get_docs()
        d.drop("content").write.mode("overwrite").parquet(
            os.path.join(index_dir, "doc_stats")
        )
        _write_manifest(
            index_dir, "doc_stats",
            {"stage": "doc_stats", "version": FORMAT_VERSION,
             "num_blocks": num_blocks,
             "docs_per_block": {str(r["pblock"]): int(r["n"]) for r in get_block_rows()}},
        )

    if not (resume and _stage_done(index_dir, "corpus_stats")):
        rows = get_block_rows()
        n = sum(int(r["n"]) for r in rows)
        total_dl = sum(int(r["sdl"]) for r in rows)
        avgdl = (total_dl / n) if n else 0.0
        spark.createDataFrame(
            [(n, avgdl, total_dl, num_blocks, FORMAT_VERSION)],
            "n_docs long, avgdl double, total_dl long, num_blocks int, version int",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "corpus_stats")
        )
        _write_manifest(
            index_dir, "corpus_stats",
            {"stage": "corpus_stats", "n_docs": n, "avgdl": avgdl,
             "version": FORMAT_VERSION},
        )

    if not (resume and _stage_done(index_dir, "postings")):
        d = get_docs()
        build_postings_fused(d).write.mode("overwrite").partitionBy("pblock").parquet(
            os.path.join(index_dir, "postings")
        )
        _write_manifest(
            index_dir, "postings",
            {"stage": "postings", "version": FORMAT_VERSION,
             "per_block": _postings_footer_metrics(os.path.join(index_dir, "postings"))},
        )

    if docs is not None:
        docs.unpersist()
    return FtsIndex(spark, index_dir)
