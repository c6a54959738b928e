"""IVF (inverted-file) approximate nearest neighbor — the classic
coarse-quantizer scale path (FAISS IndexIVFFlat's shape, rebuilt
Spark-first; the reference ships a flat FAISS index, codebased/
index.py:265-272 — IVF is what that becomes at 10^12 vectors).

Build: deterministic Lloyd k-means (fixed iteration count, centroids
initialized from the ``n_lists`` smallest vec_ids, ties by first index)
over the embedding table; assignments written partitioned by list_id.
Every build of the same table is byte-identical — no RNG anywhere.

Query: the probe vector picks its ``nprobe`` nearest centroids on the
driver (centroid table is n_lists rows — broadcast-scale by design),
and the scan reads ONLY those list partitions: ``list_id IN (...)`` is
a partition-pruning predicate on the assignments table, so a query
touches nprobe/n_lists of the data — the property that makes ANN work
on a 100 TB embedding table. Survivors get an exact cosine re-rank.

The per-batch centroid assignment is a dense (batch x dim) @ (dim x k)
matmul — the justified Arrow-batched pandas UDF case (Catalyst's
interpreted lambda algebra evaluates dense linear algebra ~100x slower
than numpy; same rationale as operators/dedup.simhash64).

``nprobe = n_lists`` degrades to exact search (recall 1.0 by
construction — tested); recall at small nprobe is a data property,
high when the corpus is clustered, which is exactly when IVF is the
right index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LISTS = 16
DEFAULT_ITERS = 5


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str, n: int) -> np.ndarray:
    rows = df.orderBy(id_col).limit(n).select(vec_col).collect()
    return np.array([list(r[0]) for r in rows], dtype=np.float64)


def _assign_udf(centroids: np.ndarray):
    c = centroids
    half_norms = 0.5 * (c * c).sum(axis=1)

    def assign(batch: pd.Series) -> pd.Series:
        x = np.array(list(batch), dtype=np.float64)
        if x.size == 0:
            return pd.Series([], dtype="int32")
        # argmin_l |x-c_l|^2 == argmin_l (|c_l|^2/2 - x.c_l)
        scores = half_norms[None, :] - x @ c.T
        return pd.Series(scores.argmin(axis=1).astype("int32"))

    assign.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    return F.pandas_udf(assign, "int")


def kmeans_fit(
    embeddings: DataFrame, n_lists: int = DEFAULT_LISTS,
    iters: int = DEFAULT_ITERS, vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd iterations; returns (n_lists, dim) float64.
    Each iteration is one Spark job (assign via matmul UDF, re-center
    via groupBy mean); empty clusters keep their previous centroid."""
    cents = _collect_matrix(embeddings, "vec_id", vec_col, n_lists)
    dim = cents.shape[1]
    for _ in range(iters):
        udf = _assign_udf(cents)
        assigned = embeddings.select(
            udf(F.col(vec_col)).alias("list_id"), F.col(vec_col).alias("v")
        )
        sums = assigned.groupBy("list_id").agg(
            F.array(*[
                F.sum(F.col("v")[i].cast("double")).alias(f"s{i}") for i in range(dim)
            ]).alias("vsum"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        nxt = cents.copy()
        for r in sums:
            li = int(r["list_id"])
            nxt[li] = np.array(r["vsum"], dtype=np.float64) / float(r["n"])
        cents = nxt
    return cents


def build_ivf_index(
    embeddings: DataFrame, out_path: str, n_lists: int = DEFAULT_LISTS,
    iters: int = DEFAULT_ITERS, vec_col: str = "embedding",
) -> np.ndarray:
    """Fit + persist: centroids/ (tiny) and assignments/ partitioned by
    list_id (the partition pruning unit). Returns the centroids."""
    spark = embeddings.sparkSession
    cents = kmeans_fit(embeddings, n_lists, iters, vec_col)
    udf = _assign_udf(cents)
    embeddings.select(
        "vec_id", F.col(vec_col), udf(F.col(vec_col)).alias("list_id")
    ).write.mode("overwrite").partitionBy("list_id").parquet(
        out_path.rstrip("/") + "/assignments"
    )
    # one explicit slice: a createDataFrame(local).coalesce(1) would
    # replay defaultParallelism python partitions through ONE task
    # (~5 s measured); a 1-slice parallelize is a single round trip
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, [float(x) for x in cents[i]]) for i in range(len(cents))], 1),
        "list_id int, centroid array<double>",
    ).write.mode("overwrite").parquet(out_path.rstrip("/") + "/centroids")
    return cents


def ivf_topk(
    spark: SparkSession,
    index_path: str,
    probe_vec_id: int,
    k: int,
    nprobe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k over the union of the probe's ``nprobe``
    nearest lists. The list filter prunes partitions of assignments/
    (check .explain: PartitionFilters carries list_id)."""
    from codebased_spark.operators.simsearch import _dot, _norm

    assignments = spark.read.parquet(index_path.rstrip("/") + "/assignments")
    probe = assignments.filter(F.col("vec_id") == probe_vec_id).select(
        F.col(vec_col).alias("probe_vec")
    ).collect()
    if not probe:
        return spark.createDataFrame([], "vec_id long, cosine double")
    pv = np.array(list(probe[0]["probe_vec"]), dtype=np.float64)

    cents = spark.read.parquet(index_path.rstrip("/") + "/centroids").collect()
    c = np.array([list(r["centroid"]) for r in cents], dtype=np.float64)
    ids = np.array([int(r["list_id"]) for r in cents])
    d2 = ((c - pv[None, :]) ** 2).sum(axis=1)
    order = np.lexsort((ids, d2))
    lists = [int(x) for x in ids[order[:nprobe]]]

    cand = assignments.filter(F.col("list_id").isin(lists))
    from codebased_spark.session import one_row_df

    probe_df = one_row_df(
        spark, "probe_vec array<float>", ([float(x) for x in pv],))
    return (
        cand.crossJoin(F.broadcast(probe_df))
        .select(
            "vec_id",
            F.round(
                _dot(F.col(vec_col), F.col("probe_vec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("probe_vec"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("vec_id") != probe_vec_id)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
