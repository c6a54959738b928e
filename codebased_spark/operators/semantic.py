"""Spark-native semantic retrieval + hybrid search (operators Q8/Q9).

The reference's semantic side embeds objects with OpenAI and searches a
FAISS flat index (codebased/search.py:121-165) — network-bound and out
of rebuild scope (SURVEY.md §7.6). This module provides the same
*retrieval capability* with a deterministic, self-contained embedder so
the full hybrid pipeline (semantic top-k x full-text top-k -> 3-tier
merge) runs and is testable end-to-end on Spark:

- doc_features: trigram-histogram-projection embeddings (the same
  featurizer family as operators/multimodal.media_features) — cheap,
  deterministic, and computed JVM->Arrow batched. Any real embedding
  column (array<float>) can be swapped in; every downstream operator
  only sees (doc_id, embedding).
- semantic_topk: brute-force cosine against the (broadcast) query
  vector — exact, one scan, TakeOrderedAndProject. The reference quirk
  of returning range_search results unsorted-then-truncated
  (search.py:134-138) is NOT reproduced; we sort, which strictly
  improves recall for the same k.
- hybrid_search: semantic x fts merge via operators/render.merge_results
  (tier -1 leading name-matches, tier 0 in-both, tier 1 single-source).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 64
_PROJ_SEED = 987654321

# The reference's embedding-request scheduler contract
# (codebased/index.py:85-147, OpenAIRequestScheduler): batches flush
# BEFORE appending once they hold 2048 items or would exceed 400k
# tokens; any single document over 8192 tokens is skipped outright
# (counted, never embedded); requests run one at a time.
EMBED_BATCH_SIZE_LIMIT = 2048
EMBED_BATCH_TOKEN_LIMIT = 400_000
EMBED_MAX_DOC_TOKENS = 8192


def embed_token_count(text: str) -> int:
    """Deterministic token count standing in for the reference's
    tiktoken encoding (tiktoken is a network-fetched vocabulary, out of
    sandbox scope): words + standalone punctuation, the usual BPE upper
    bound shape. Only the batching arithmetic depends on it."""
    import re

    return len(re.findall(r"\w+|[^\w\s]", text or ""))


def plan_embed_batches(
    token_counts, max_doc_tokens: "int | None" = EMBED_MAX_DOC_TOKENS,
) -> tuple[list[list[int]], list[int]]:
    """Split request indices into embed batches under the reference
    scheduler's exact rules (codebased/index.py:108-121):

    - an item with more than ``max_doc_tokens`` tokens is skipped
      (``None`` disables the skip entirely);
    - before appending, the running batch is flushed if it already has
      EMBED_BATCH_SIZE_LIMIT items OR adding the item would push it
      past EMBED_BATCH_TOKEN_LIMIT tokens (so no batch ever exceeds
      either bound).

    Returns (batches, skipped) — lists of indices into the input."""
    batches: list[list[int]] = []
    skipped: list[int] = []
    cur: list[int] = []
    cur_tokens = 0
    for i, t in enumerate(token_counts):
        t = int(t)
        if max_doc_tokens is not None and t > max_doc_tokens:
            skipped.append(i)
            continue
        # flush only a NON-EMPTY running batch (ADVICE r03: with the
        # skip disabled, a single item above the token limit would
        # otherwise emit an empty batch and then ride alone anyway)
        if cur and (
            len(cur) >= EMBED_BATCH_SIZE_LIMIT
            or cur_tokens + t > EMBED_BATCH_TOKEN_LIMIT
        ):
            batches.append(cur)
            cur = []
            cur_tokens = 0
        cur.append(i)
        cur_tokens += t
    if cur:
        batches.append(cur)
    return batches, skipped


def _projection(dim: int) -> np.ndarray:
    rng = np.random.RandomState(_PROJ_SEED)
    return rng.standard_normal((4096, dim)).astype(np.float32)


def _embed_texts(texts, dim: int) -> np.ndarray:
    """Deterministic text embedding: bucketed trigram histogram (4096
    buckets via the packed trigram id) projected to ``dim``; L2 unit."""
    from codebased_spark.functions.fts5 import tokenize_packed

    proj = _projection(dim)
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        codes = tokenize_packed(t or "")
        if codes.size == 0:
            continue
        hist = np.bincount((codes % 4096).astype(np.int64), minlength=4096)
        v = hist.astype(np.float32) @ proj
        n = float(np.linalg.norm(v))
        if n > 0:
            out[i] = v / n
    return out


def doc_features(docs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(doc_id, embedding array<float>) for every doc (content text)."""

    def batches(it):
        for pdf in it:
            vecs = _embed_texts(list(pdf["content"]), dim)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].to_numpy(),
                 "embedding": [v.tolist() for v in vecs]}
            )

    return docs.select("doc_id", "content").mapInPandas(
        batches, "doc_id long, embedding array<float>"
    )


def doc_features_cached(
    spark,
    docs: DataFrame,
    cache_dir: str,
    dim: int = FEATURE_DIM,
    counter=None,
    skip_counter=None,
    max_tokens: "int | None" = EMBED_MAX_DOC_TOKENS,
) -> DataFrame:
    """(doc_id, embedding) with a persistent sha256-keyed cache — the
    reference's embedding cache (codebased/index.py:609-626: content
    hash -> embedding, survives deletes so re-added content is free).

    Only docs whose sha256 is NOT in the cache are embedded, and within
    the batch each distinct content embeds ONCE (identical files across
    repos share one row) — at 100 TB the embed step is the expensive
    one, so the cache join (a sha-keyed semi/anti join, never content)
    is what makes incremental rebuilds cheap. New (sha256, embedding)
    rows are appended to the cache afterwards.

    ``counter`` (an optional Spark accumulator) counts texts actually
    embedded — the test hook proving unchanged docs cost nothing.
    ``skip_counter`` counts documents skipped for exceeding
    ``max_tokens`` (they get NO embedding row, mirroring the reference
    scheduler's too_long skip, codebased/index.py:110-112 — this is a
    deliberate divergence from :func:`doc_features`, which embeds
    everything; pass ``max_tokens=None`` for full-coverage parity with
    the uncached path). The embed stage batches under the reference
    scheduler's exact rules via :func:`plan_embed_batches`, one
    request at a time per task (= max_concurrent_requests 1 per
    partition).

    The cache key is (dim, sha256): each dim gets its own subdirectory,
    so changing ``dim`` never serves stale vectors of another width
    (ADVICE r02). Reads dropDuplicates on sha256 — concurrent writers
    may append the same sha twice; dedup on read keeps the hits join
    from fanning out.
    """
    from codebased_spark.plans.fsio import IndexFS

    cache_dir = f"{cache_dir.rstrip('/')}/dim={int(dim)}"
    fs = IndexFS(spark, cache_dir)
    keyed = docs.select("doc_id", "sha256", "content")
    cache = None
    if fs.exists(cache_dir) and any(
        p.endswith(".parquet") for p, _ in fs.list_files(cache_dir)
    ):
        cache = spark.read.parquet(cache_dir).dropDuplicates(["sha256"])

    if cache is not None:
        hits = keyed.join(cache, "sha256").select("doc_id", "embedding")
        misses = keyed.join(cache.select("sha256"), "sha256", "left_anti")
    else:
        hits = None
        misses = keyed

    def batches(it):
        for pdf in it:
            texts = list(pdf["content"])
            shas = list(pdf["sha256"])
            plan, skipped = plan_embed_batches(
                [embed_token_count(t) for t in texts],
                max_doc_tokens=max_tokens,
            )
            if skip_counter is not None and skipped:
                skip_counter.add(len(skipped))
            # one request at a time, like the reference scheduler's
            # single-worker executor — per task, not per cluster: each
            # partition is an independent client of the embed service
            for idx in plan:
                if counter is not None:
                    counter.add(len(idx))
                vecs = _embed_texts([texts[i] for i in idx], dim)
                yield pd.DataFrame(
                    {"sha256": [shas[i] for i in idx],
                     "embedding": [v.tolist() for v in vecs]}
                )

    fresh = (
        misses.select("sha256", "content")
        .dropDuplicates(["sha256"])
        .mapInPandas(batches, "sha256 string, embedding array<float>")
        # materialize BEFORE touching the cache dir: writing to a path
        # invalidates cached plans reading it (refreshByPath), which
        # would silently re-run the embed against the mutated cache
        .localCheckpoint(eager=True)
    )
    out = misses.select("doc_id", "sha256").join(fresh, "sha256").select(
        "doc_id", "embedding"
    )
    if hits is not None:
        out = hits.unionByName(out)
    out = out.localCheckpoint(eager=True)  # cut cache-dir lineage pre-append

    if fresh.limit(1).count():
        fresh.write.mode("append").parquet(cache_dir)
    return out


def semantic_topk(
    features: DataFrame, query_text: str, k: int, dim: int = FEATURE_DIM
) -> DataFrame:
    """Exact cosine top-k of the embedded query against the feature
    table. Returns (doc_id, distance) — distance = 1 - cosine, ascending
    (FAISS-L2-flavored ordering on unit vectors)."""
    qv = _embed_texts([query_text], dim)[0]
    q = [float(x) for x in qv]
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.array(*[F.lit(v) for v in q]),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    return (
        features.select(
            "doc_id",
            (1.0 - dot / F.when(norm > 0, norm).otherwise(F.lit(1.0))).alias("distance"),
        )
        .orderBy(F.asc("distance"), F.asc("doc_id"))
        .limit(k)
    )


def semantic_radius(
    features: DataFrame, query_text: str, radius: float = 2.0 ** 0.5,
    k: int = 32, dim: int = FEATURE_DIM,
) -> DataFrame:
    """Q8 radius semantics: only results within the FAISS range_search
    cutoff are returned (reference: search.py:134-138 passes
    ``flags.radius`` — default sqrt(2), main.py:118-132 — to
    IndexFlatL2.range_search, whose threshold applies to SQUARED L2).
    On unit vectors squared L2 == 2 * (1 - cosine) == 2 * distance, so
    the filter is ``2 * distance < radius``. The reference then
    truncates the UNSORTED range result to top_k (its documented
    quirk); we sort before truncating, which strictly improves recall
    for the same k — the cutoff semantics ("nothing farther than r")
    are identical."""
    base = semantic_topk(features, query_text, k, dim)
    return base.filter(2.0 * F.col("distance") < F.lit(float(radius)))


def apply_rerank(results: list[dict], proposed_ids: list[int]) -> list[dict]:
    """Q10 rerank contract (reference: search.py:226-232): keep exactly
    the proposed ids, in proposed order, silently dropping ids the
    result set doesn't contain; results not proposed are excluded
    (that's how the LLM culls irrelevant hits). The proposer itself is
    pluggable — the reference calls OpenAI (search.py:182-225), an
    external service out of rebuild scope."""
    by_id = {int(r["doc_id"]): r for r in results}
    out = []
    for rid in proposed_ids:
        hit = by_id.pop(int(rid), None)
        if hit is not None:
            out.append(hit)
    return out


def hybrid_search(
    index, features: DataFrame, query: str, top_k: int = 32,
    radius: "float | None" = None, rerank=None,
) -> list[dict]:
    """The reference's search_once composition (codebased/search.py:
    384-401): semantic top-k + full-text two-branch top-k, merged with
    the 3-tier ranking, then the optional rerank stage. Driver-side
    merge over <= 2k collected rows.

    ``radius``: when set, the semantic side applies the range_search
    cutoff (see :func:`semantic_radius`).
    ``rerank``: optional callable ``(query, results) -> list[doc_id]``
    — the pluggable stand-in for the reference's LLM reranker; its
    proposal is applied under the reference's id-matching contract
    (:func:`apply_rerank`)."""
    from codebased_spark.operators.render import merge_results

    fts_rows = [
        {"doc_id": int(r["doc_id"]), "name_match": bool(r["name_match"]),
         "score": float(r["score"])}
        for r in index.search(query, top_k).collect()
    ]
    sem = (
        semantic_topk(features, query, top_k)
        if radius is None
        else semantic_radius(features, query, radius, top_k)
    )
    sem_rows = [
        {"doc_id": int(r["doc_id"]), "distance": float(r["distance"])}
        for r in sem.collect()
    ]
    merged = merge_results(sem_rows, fts_rows)
    if rerank is not None:
        merged = apply_rerank(merged, rerank(query, merged))
    return merged
