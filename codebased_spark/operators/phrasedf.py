"""Hot-phrase document-frequency side table (the multi-trigram latency
lever — VERDICT r03 #9).

FTS5's idf uses the EXACT phrase document frequency, so a multi-trigram
phrase must be position-verified everywhere just to learn its df before
any score exists (operators/query.py module docstring, "Top-k
pruning"). Build-time df for ARBITRARY phrases is impossible, but real
query traffic is Zipfian: a small set of hot phrases (mined from query
logs, or :func:`hot_phrases_from_corpus` as a stand-in) covers most
multi-trigram latency. This module materializes their exact per-branch
dfs next to the index:

- :func:`build_phrase_df`: one stats-only job over the posting shards
  (same block machinery as search, tombstones honored) writes
  ``<index>/phrase_df/`` parquet plus a generation-fingerprint manifest.
- :class:`~codebased_spark.plans.engine.FtsIndex` loads the table when
  its fingerprint matches the live corpus_stats; a query whose EVERY
  phrase is covered skips df verification and tightens emission: with
  every idf known in-task, multi-phrase blocks emit their exact branch
  top-k (<= 2*top_k rows) instead of the k-skyband, the blocks emit no
  df-stat rows at all, and the driver tail's candidate bound becomes
  exact (plain collect, no limit probe — operators/query._tail_bound).
- Any incremental commit DELETES the table (dfs change with the
  corpus — streaming/incremental.incremental_update); rebuild it from
  the same phrase list afterwards. Compaction swaps the whole index
  dir, which drops it too.

Scores are bit-identical with or without the table: the stored dfs
equal the stats the blocks would have emitted (pinned by test), and the
in-task rank pipeline reuses _norm_np with _finish_rows' accumulation
order, so emission decisions agree with the driver's final ranking
bit-for-bit.

No reference counterpart: codebased's SQLite FTS5 recomputes phrase df
per query inside the C extension (fts5 aux API); this table is purely
a distributed-scale latency lever.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codebased_spark.functions.fts5 import casefold, phrase_terms

PHRASE_DF_DIR = "phrase_df"
PHRASE_DF_MANIFEST = "phrase_df"


def _corpus_ngrams(
    corpus: DataFrame, text_col: str, ngrams: tuple[int, ...]
) -> DataFrame:
    """One ``phrase`` row per case-folded word n-gram of the corpus for
    each n in ``ngrams`` (phrases under 3 chars — untrigrammable — are
    dropped). Unigrams matter for coverage: an UNQUOTED multi-word
    query parses to one single-word phrase per word, so a bigram-only
    hot set can never cover it."""
    w = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")

    def ngram_expr(n: int):
        # the transform lambda must be unary (pyspark derives the
        # higher-order function's arity from the signature) — bind n
        # via closure, never a default arg
        return F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - n + 1),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + j) for j in range(n)]),
            ),
        ).otherwise(F.array().cast("array<string>"))

    parts = [w if n == 1 else ngram_expr(n) for n in ngrams]
    allgrams = parts[0] if len(parts) == 1 else F.concat(*parts)
    return (
        corpus.select(F.explode(allgrams).alias("phrase"))
        .filter(F.length("phrase") >= 3)
    )


def _ngram_partial_counts(
    corpus: DataFrame, text_col: str, ngrams: tuple[int, ...]
) -> DataFrame:
    """(phrase, n) partial counts per partition — the r7 replacement
    for counting over :func:`_corpus_ngrams`'s exploded row stream.

    The Catalyst expansion (split + transform/concat_ws + explode)
    materializes one row PER N-GRAM OCCURRENCE before the hash
    aggregate's map side shrinks it again; this operator counts inside
    the scan task (collections.Counter — C-speed _count_elements) and
    emits one row per DISTINCT phrase per partition, which is exactly
    the partial-aggregate state Spark would have shuffled anyway
    (guide §2.3 "aggregate before you shuffle"). Measured: the miner's
    expansion went from ~26 s to ~2 s at sf0.1 on the same counts.

    Semantics are pinned to the Catalyst expression it replaces (and
    to the DuckDB oracle of ``hot_phrase_mining``):
    - ``split(lower(coalesce(text, '')), r'\\s+')`` with Java's
      ASCII-only ``\\s`` = [ \\t\\n\\x0B\\f\\r] and limit -1 (leading/
      trailing empty tokens kept) — the explicit class below matches
      Java on ANY input; ``str.lower()`` matches Java's lower for the
      ASCII corpora this engine targets (same assumption as
      fts5.casefold).
    - unigrams are the raw tokens; an n-gram joins n adjacent tokens
      with a single space (concat_ws keeps empty strings);
    - phrases shorter than 3 chars are dropped (untrigrammable).
    Equality with the expression path is pinned by test on corpora
    with empty tokens, repeated whitespace, and empty/null docs."""
    import re
    from collections import Counter

    ws_re = re.compile(r"[ \t\n\x0b\f\r]+")
    ns = tuple(int(n) for n in ngrams)

    def count_batches(it):
        counts: Counter = Counter()
        for pdf in it:
            for text in pdf[text_col]:
                toks = ws_re.split((text or "").lower())
                for n in ns:
                    if n == 1:
                        counts.update(t for t in toks if len(t) >= 3)
                    elif len(toks) >= n:
                        counts.update(
                            p for p in (
                                " ".join(toks[i:i + n])
                                for i in range(len(toks) - n + 1))
                            if len(p) >= 3)
        if counts:
            yield pd.DataFrame(
                {"phrase": list(counts.keys()),
                 "n": np.fromiter(counts.values(), np.int64,
                                  count=len(counts))})

    return corpus.select(F.col(text_col)).mapInPandas(
        count_batches, "phrase string, n long")


def hot_phrases_from_corpus(
    corpus: DataFrame,
    top_n: int = 64,
    text_col: str = "content",
    key: str = "digest",
    ngrams: tuple[int, ...] = (1, 2),
    sample_fraction: "float | None" = None,
    oversample: int = 8,
) -> list[str]:
    """Stand-in for query-log mining: the ``top_n`` most frequent
    case-folded word n-grams (default: unigrams + bigrams, ranked
    together by frequency) of the corpus. Real deployments should
    feed :func:`build_phrase_df` their query log's hot phrases
    instead; this helper exists so the table can be bootstrapped
    before any traffic arrives.

    ``key='digest'`` (default) shuffles 8-byte ``xxhash64`` keys, never
    phrase text (the same fix trainprep's n-gram ops got — VERDICT r04
    #4): pass 1 counts per digest and collects only the candidate
    digests at/above the top-``top_n`` boundary count; pass 2 re-counts
    BY TEXT among candidates only (a map-side hash filter, then a
    shuffle whose cardinality is the candidate set, not the corpus) and
    applies the exact (count desc, phrase asc) tie-break. Digest counts
    can only over-count a phrase (collisions merge), so the candidate
    set is a superset of the true top-N and pass 2's exact re-count
    restores equality with ``key='text'`` (pinned by test). When the
    boundary tie itself floods past the driver cap (boundary≈1 — tiny
    or degenerate corpora where most n-grams are unique), the miner
    falls back to the exact text path rather than truncate the
    candidate set. Digest-vs-text equality therefore holds up to
    xxhash64 collisions: a collision can only merge two phrases'
    counts, which can inflate a digest's pass-1 count and (if that
    digest sits exactly at the boundary) admit a spurious candidate —
    harmless, pass 2 re-counts by text — or push a true candidate's
    competitors above it; the one residual failure mode is a
    boundary-adjacent inflation demoting a true top-N digest below the
    boundary (~2^-64 per phrase pair, accepted). ``key='text'`` is the direct one-pass
    groupBy on phrase strings — fine at bench scale, a corpus-wide
    text-key shuffle at 100 TB.

    ``sample_fraction`` (VERDICT r05 #1: the exact miner's dominant
    cost is TWO full corpus n-gram expansions) runs candidate
    generation over a deterministic doc sample instead: the sample's
    top ``oversample * top_n`` digests (boundary ties included) become
    the candidates, and pass 2 still re-counts them EXACTLY by text
    over the FULL corpus — reported counts are always true counts, and
    the result equals the exact miner whenever every true top-N phrase
    ranks within the sample's top oversample*N (overwhelmingly so for
    the Zipfian frequency profiles mining targets; NOT a guarantee —
    the oracle gate and correctness-critical callers keep
    sample_fraction=None)."""
    rows = top_ngrams_df(corpus, top_n, text_col, key, ngrams,
                         sample_fraction, oversample).collect()
    return [r["phrase"] for r in rows]


def top_ngrams_df(
    corpus: DataFrame,
    top_n: int = 64,
    text_col: str = "content",
    key: str = "digest",
    ngrams: tuple[int, ...] = (1, 2),
    sample_fraction: "float | None" = None,
    oversample: int = 8,
) -> DataFrame:
    """The mined hot set as a (phrase, n) DataFrame, most-frequent
    first — the plan behind :func:`hot_phrases_from_corpus` (see its
    docstring for the digest-vs-text shuffle analysis and the
    ``sample_fraction`` contract). Exposed separately so the miner
    itself sits under the cross-engine value oracle (__spark_entry__
    ``hot_phrase_mining``)."""
    if not tuple(ngrams):
        raise ValueError("ngrams must be non-empty")
    # pc replaces the exploded-row stream of _corpus_ngrams with
    # task-side partial counts (one row per distinct phrase per
    # partition — see _ngram_partial_counts); every aggregation below
    # sums the partials, which is count-identical to counting the
    # exploded rows (pinned by test + the hot_phrase_mining oracle).
    # The digest step keeps Spark's own xxhash64, applied to the
    # partially-aggregated phrases, so digest semantics are unchanged.
    pc = _ngram_partial_counts(corpus, text_col, tuple(ngrams))
    if sample_fraction is not None:
        if not (0.0 < sample_fraction <= 1.0):
            raise ValueError("sample_fraction must be in (0, 1]")
        if key not in ("digest", "text"):
            raise ValueError(f"key must be 'digest' or 'text', got {key!r}")
        return _top_ngrams_sampled(
            corpus, pc, top_n, text_col, key, tuple(ngrams),
            float(sample_fraction), int(oversample))
    if key == "text":
        return (
            pc.groupBy("phrase")
            .agg(F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"))
            .orderBy(F.desc("n"), F.asc("phrase"))
            .limit(top_n)
        )
    if key != "digest":
        raise ValueError(f"key must be 'digest' or 'text', got {key!r}")
    dcounts = (
        pc.groupBy(F.xxhash64("phrase").alias("d"))
        .agg(F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"))
    ).persist()  # two driver pulls below — never re-run the expansion
    try:
        head = dcounts.orderBy(F.desc("n"), F.asc("d")).limit(top_n).collect()
        if not head:
            return pc.groupBy("phrase").agg(
                F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"),
            ).limit(0)
        boundary = min(int(r["n"]) for r in head)
        # every digest at/above the boundary count (ties included) is a
        # candidate. The driver pull is capped — but an arbitrary subset
        # of a tied flood would break the superset guarantee (and
        # text-mode equality), so a corpus whose boundary tie exceeds
        # the cap (boundary≈1: most n-grams unique — tiny corpora)
        # falls back to the exact text path instead of truncating.
        cap = max(16 * top_n, 1024)
        cand = dcounts.filter(F.col("n") >= boundary).select("d").limit(
            cap + 1).collect()
        if len(cand) > cap:
            return (
                pc.groupBy("phrase")
                .agg(F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"))
                .orderBy(F.desc("n"), F.asc("phrase"))
                .limit(top_n)
            )
        cand_digests = [int(r["d"]) for r in cand]
    finally:
        dcounts.unpersist()
    return (
        pc.filter(F.xxhash64("phrase").isin(cand_digests))
        .groupBy("phrase")
        .agg(F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"))
        .orderBy(F.desc("n"), F.asc("phrase"))
        .limit(top_n)
    )


def _top_ngrams_sampled(corpus, pc_full, top_n, text_col, key, ngrams,
                        fraction, oversample):
    """Sampled candidate generation + exact full-corpus re-count (the
    ``sample_fraction`` branch of :func:`top_ngrams_df`): pass 1
    counts n-grams only for a seed-deterministic doc sample and takes
    its top oversample*top_n digests (boundary ties included, capped);
    pass 2 re-counts those candidates exactly by text over the full
    corpus (``pc_full`` — the full corpus's partial counts). One full
    count instead of two, and the pass-1 shuffle shrinks by the
    sample fraction."""
    samp = corpus.sample(fraction=fraction, seed=42)
    dcounts = (
        _ngram_partial_counts(samp, text_col, ngrams)
        .groupBy(F.xxhash64("phrase").alias("d"))
        .agg(F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"))
    ).persist()  # two driver pulls below
    try:
        n_cand = max(int(oversample) * top_n, top_n)
        head = dcounts.orderBy(F.desc("n"), F.asc("d")).limit(n_cand).collect()
        if not head:
            # the sample caught nothing (tiny corpus / tiny fraction):
            # the exact path is cheap there — run it instead of
            # returning a silently-empty hot set (honoring the
            # caller's key choice)
            return top_ngrams_df(corpus, top_n, text_col, key, ngrams)
        boundary = min(int(r["n"]) for r in head)
        cap = max(4 * n_cand, 2048)
        cand = dcounts.filter(F.col("n") >= boundary).select("d").limit(
            cap + 1).collect()
        if len(cand) > cap:
            # boundary tie flood: sampling is already approximate, so
            # (unlike the exact miner) truncating to the head is fine —
            # every survivor still gets an exact full-corpus count
            cand_digests = [int(r["d"]) for r in head]
        else:
            cand_digests = [int(r["d"]) for r in cand]
    finally:
        dcounts.unpersist()
    return (
        pc_full.filter(F.xxhash64("phrase").isin(cand_digests))
        .groupBy("phrase")
        .agg(F.coalesce(F.sum("n"), F.lit(0).cast("long")).alias("n"))
        .orderBy(F.desc("n"), F.asc("phrase"))
        .limit(top_n)
    )


def hot_phrases_from_query_log(queries, top_n: int = 64) -> list[str]:
    """The hot set mined from REAL traffic — the operational successor
    to :func:`hot_phrases_from_corpus` once queries exist. Parses each
    logged query with the engine's own FTS5 parser and ranks the
    resulting phrases by frequency, (count desc, phrase asc) tie-break;
    sub-3-char phrases (untrigrammable) are dropped.

    ``queries`` is either an in-memory iterable of query strings
    (``FtsIndex.query_log`` — a bounded deque the index fills on every
    search/search_batch) or a DataFrame with a ``query`` column (a
    persisted log at scale; parsing runs as an Arrow-batched pandas
    UDF and the shuffle keys are log-sized phrase strings, never
    corpus-sized — a query log is traffic-bounded, so text keys are
    fine here)."""
    from codebased_spark.functions.fts5 import query_phrases

    if isinstance(queries, DataFrame):
        import pandas as pd  # noqa: F811 (executor-side import parity)
        from pyspark.sql.functions import pandas_udf

        parse = pandas_udf(
            lambda qs: qs.map(lambda q: query_phrases(q or "")),
            "array<string>",
        )
        rows = (
            queries.select(F.explode(parse(F.col("query"))).alias("phrase"))
            .filter(F.length("phrase") >= 3)
            .groupBy("phrase")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("phrase"))
            .limit(top_n)
            .collect()
        )
        return [r["phrase"] for r in rows]
    from collections import Counter

    counts: Counter = Counter()
    # snapshot first: FtsIndex.search/search_batch append to query_log
    # on every call, and mining while concurrent traffic flows (the
    # documented operational loop) would otherwise raise
    # "deque mutated during iteration"
    for q in tuple(queries):
        for p in query_phrases(q or ""):
            if len(p) >= 3:
                counts[p] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [p for p, _n in ranked[:top_n]]


def _phrase_stats_fn(phrases_terms, needed, deletes_dir):
    """mapInPandas over (pblock, path) shard rows -> one (pblock,
    phrase_idx, df_all, df_name) row per phrase per block, via the same
    _query_block_frames machinery queries use (stats only; the doc
    frames are discarded — this is a build-time job). Emitting the
    pblock keeps the stored table PER-BLOCK, which is what makes the
    delta rebuild (:func:`update_phrase_df`) possible: dfs are additive
    across blocks, so only dirty blocks need recomputing."""
    from codebased_spark.operators.query import (
        _load_block_tombstones,
        _query_block_frames,
        _read_postings_term_filtered,
        _rows_from_table,
    )

    def fn(it):
        tomb_cache: dict = {}
        fs_cache: dict = {}
        for pdf in it:
            for pblock, path in zip(pdf["pblock"], pdf["path"]):
                tbl = _read_postings_term_filtered(path, fs_cache, needed)
                if tbl.num_rows == 0:
                    continue
                rows = _rows_from_table(tbl)
                deleted = _load_block_tombstones(
                    deletes_dir, pblock, tomb_cache, fs_cache
                )
                out = []
                for pi, terms in enumerate(phrases_terms):
                    stats, _frame = _query_block_frames(rows, [terms], deleted)
                    for _zero, da, dn in stats:
                        out.append((int(pblock), pi, da, dn))
                if out:
                    yield pd.DataFrame(
                        out,
                        columns=["pblock", "phrase_idx", "df_all", "df_name"])

    return fn


_PHRASE_STATS_SCHEMA = "pblock int, phrase_idx int, df_all long, df_name long"


def _phrase_block_stats(spark, index, pts, needed, posting_files):
    """[(pblock, phrase_idx, df_all, df_name)] over the given shard
    subset — the one Spark job behind build/update_phrase_df. Row count
    is bounded by |phrases| x |blocks| (tiny), so no aggregation runs
    in the job; the caller sums driver-side."""
    from codebased_spark.operators.query import _scan_df

    rows = (
        _scan_df(
            spark, posting_files,
            _phrase_stats_fn(pts, needed, index._task_deletes_dir()),
            _PHRASE_STATS_SCHEMA,
        )
        .collect()
    )
    return [(int(r["pblock"]), int(r["phrase_idx"]),
             int(r["df_all"]), int(r["df_name"])) for r in rows]


def incr_epoch_at(fs, index_dir: str) -> int:
    """Number of incremental-commit manifests under ``index_dir`` —
    the single definition shared by the commit writer (which names the
    next ``incr_<epoch>`` manifest) and the phrase-df staleness
    fingerprint, so the two can never diverge. Raises on listing
    failure — the writer must not silently restart at epoch 0."""
    from codebased_spark.plans.engine import _join

    return len([f for f in fs.list_dir(_join(index_dir, "_manifest"))
                if f.startswith("incr_")])


def _incr_epoch(index) -> int:
    """Number of incremental-commit manifests — part of the phrase-df
    staleness fingerprint. (n_docs, total_dl) alone can collide: a
    same-length single-file edit preserves both, and with the delta
    path the PRE-commit table now survives on disk, so a crash between
    commit and update_phrase_df must still leave it detectably stale."""
    try:
        return incr_epoch_at(index.fs, index.index_dir)
    except Exception:
        return 0


def _phrase_table_paths(index):
    """(pyarrow-openable dir path or None, spark dir path) for the
    phrase table — None means pyarrow cannot reach the store and the
    Spark reader/writer must serve."""
    from codebased_spark.plans.engine import _join
    from codebased_spark.plans.fsio import (
        canonical_uri,
        is_local,
        local_path,
        pyarrow_fs_path,
    )

    out_dir = _join(index.index_dir, PHRASE_DF_DIR)
    if is_local(index.index_dir) and not index.index_dir.startswith("file:"):
        return local_path(out_dir), out_dir
    try:
        fs, _real = pyarrow_fs_path(canonical_uri(out_dir))
        return (canonical_uri(out_dir) if fs is not None else None), out_dir
    except Exception:
        return None, out_dir


def _read_phrase_rows(spark, index) -> "list[dict] | None":
    """The stored table as plain dicts via a DRIVER-side pyarrow read
    (the table is tiny: |phrases| x |blocks| rows), so index loads and
    delta rebuilds cost no Spark job for it. Returns None when only
    the Spark reader can reach the store (caller falls back)."""
    pa_dir, _ = _phrase_table_paths(index)
    if pa_dir is None:
        return None
    from codebased_spark.operators.query import _pa_read_table

    return _pa_read_table(pa_dir, {}).to_pylist()


def _write_phrase_table(spark, index, block_rows, phrase_order) -> dict:
    """Persist per-block rows + zero-marker rows (pblock=-1 keeps
    phrases with no matches — including sub-trigram ones — in the
    table: the covered AND-fail short-circuit depends on their (0,0)
    entries), stamp the manifest with the CURRENT corpus fingerprint,
    and return the aggregated dict. The write is DRIVER-side pyarrow
    whenever the store is pyarrow-reachable — the table is tiny, and
    skipping the Spark write removes a whole job from every (re)build;
    only unreachable stores pay the Spark path."""
    from codebased_spark.plans.engine import FORMAT_VERSION, _join

    have = {p for p, _pb, _da, _dn in block_rows}
    table_rows = list(block_rows) + [
        (p, -1, 0, 0) for p in phrase_order if p not in have]
    out_dir = _join(index.index_dir, PHRASE_DF_DIR)
    # manifest first, then data: a crash can leave data-without-manifest
    # (harmless — load ignores it) but never manifest-without-data
    index.fs.delete(_join(index.index_dir, "_manifest",
                          f"{PHRASE_DF_MANIFEST}.json"))
    index.fs.delete(out_dir)
    pa_dir, _ = _phrase_table_paths(index)
    if pa_dir is not None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table({
            "phrase": pa.array([r[0] for r in table_rows], pa.string()),
            "pblock": pa.array([int(r[1]) for r in table_rows], pa.int32()),
            "df_all": pa.array([int(r[2]) for r in table_rows], pa.int64()),
            "df_name": pa.array([int(r[3]) for r in table_rows], pa.int64()),
        })
        if "://" not in pa_dir:
            import os as _os

            _os.makedirs(pa_dir, exist_ok=True)
            pq.write_table(tbl, pa_dir + "/part-00000.parquet")
        else:
            from codebased_spark.plans.fsio import pyarrow_fs_path

            fs, real = pyarrow_fs_path(pa_dir)
            fs.create_dir(real, recursive=True)
            pq.write_table(tbl, real + "/part-00000.parquet", filesystem=fs)
    else:
        # 1-slice parallelize, not coalesce(1): the latter replays
        # defaultParallelism python partitions through one task (~5 s)
        spark.createDataFrame(
            spark.sparkContext.parallelize(table_rows, 1),
            "phrase string, pblock int, df_all long, df_name long",
        ).write.mode("overwrite").parquet(out_dir)
    index.fs.write_json(
        _join(index.index_dir, "_manifest", f"{PHRASE_DF_MANIFEST}.json"),
        {
            "stage": PHRASE_DF_MANIFEST,
            "version": FORMAT_VERSION,
            "layout": "per_block",
            "n_docs": index.n_docs,
            "total_dl": index.total_dl,
            "epoch": _incr_epoch(index),
            "n_phrases": len(phrase_order),
        },
    )
    agg: dict = {p: [0, 0] for p in phrase_order}
    for p, _pb, da, dn in table_rows:
        agg[p][0] += da
        agg[p][1] += dn
    loaded = {p: (a, b) for p, (a, b) in agg.items()}
    index.phrase_dfs = loaded
    return loaded


def build_phrase_df(spark: SparkSession, index, phrases: list[str]) -> dict:
    """Materialize exact (df_all, df_name) for ``phrases`` under
    ``index.index_dir/phrase_df/`` and return the loaded dict. Phrases
    are case-folded; sub-3-char phrases are stored with df 0 (they can
    never match — trigram semantics). The table is stored PER BLOCK
    (phrase, pblock, df_all, df_name) so commits can delta-rebuild just
    the dirty blocks (:func:`update_phrase_df`); the manifest records
    the live (n_docs, total_dl) fingerprint and FtsIndex refuses a
    stale table."""
    folded = []
    seen = set()
    for p in phrases:
        fp = casefold(p)
        if fp and fp not in seen:
            seen.add(fp)
            folded.append(fp)

    block_rows: list = []
    term_lists = [(p, phrase_terms(p)) for p in folded if len(p) >= 3]
    if term_lists and index.n_docs:
        pts = [ts for _, ts in term_lists]
        needed = sorted({int(t) for ts in pts for t in ts})
        if index.posting_files:
            stats = _phrase_block_stats(
                spark, index, pts, needed, index.posting_files)
        else:
            # generic-store fallback: the DataFrame posting scan feeds
            # the same stats machinery through applyInPandas per pblock
            from codebased_spark.operators.query import (
                _block_candidates_pdf,
            )

            pruned = index.postings.filter(
                F.col("term").isin([int(t) for t in needed]))
            deleted = index.deleted

            # fully-annotated signature (incl. the grouping key): under
            # `from __future__ import annotations` pyspark infers the
            # two-arg applyInPandas eval type from these hints
            def per_block(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                out = []
                for pi, terms in enumerate(pts):
                    cand = _block_candidates_pdf(pdf, [terms], deleted)
                    s = cand[cand["kind"] == 0]
                    for _, r in s.iterrows():
                        out.append((int(key[0]), pi,
                                    int(r["df_all"]), int(r["df_name"])))
                return pd.DataFrame(
                    out,
                    columns=["pblock", "phrase_idx", "df_all", "df_name"])

            stats = [
                (int(r["pblock"]), int(r["phrase_idx"]),
                 int(r["df_all"]), int(r["df_name"]))
                for r in pruned.groupBy("pblock")
                .applyInPandas(per_block, _PHRASE_STATS_SCHEMA)
                .collect()
            ]
        block_rows = [
            (term_lists[pi][0], pb, da, dn) for pb, pi, da, dn in stats]
    return _write_phrase_table(spark, index, block_rows, folded)


def update_phrase_df(spark: SparkSession, index,
                     dirty_pblocks,
                     prior_fingerprint: "tuple | None" = None) -> "dict | None":
    """Delta rebuild after a commit: recompute per-block stats ONLY for
    ``dirty_pblocks`` (blocks that gained tombstones or were appended)
    and splice them into the stored per-block table — clean blocks'
    dfs cannot have changed (postings are immutable; df is additive
    across blocks). Returns the refreshed dict, or None when no usable
    per-block table exists (caller falls back to a full
    :func:`build_phrase_df`). ``index`` must be the POST-commit handle
    (the manifest is stamped with its fingerprint).

    This is O(changed blocks) instead of O(all blocks) — the shape a
    debounced micro-batch loop needs: a 10-file batch touches 1-2
    blocks of a 10k-block index, so the rebuild no longer rescans
    every shard (VERDICT r05 "What's missing" #3).

    ``prior_fingerprint`` = (n_docs, total_dl, epoch) of the PRE-commit
    index the dirty set was derived from (ADVICE r06): when given, the
    stored table's manifest must match it or the splice refuses
    (returns None -> full rebuild) — a stale table from some other
    generation would otherwise be silently stamped fresh, and df=0
    rows can make covered queries wrongly empty. Callers without the
    pre-commit state (none in-tree) keep the old trust-the-caller
    behavior by passing None."""
    from codebased_spark.plans.engine import FORMAT_VERSION, _join

    if not index.posting_files:
        return None
    if prior_fingerprint is not None:
        try:
            man = index.fs.read_json(_join(
                index.index_dir, "_manifest", f"{PHRASE_DF_MANIFEST}.json"))
            pn, pdl, pep = prior_fingerprint
            if (
                int(man.get("version", -1)) != FORMAT_VERSION
                or int(man.get("n_docs", -1)) != int(pn)
                or int(man.get("total_dl", -1)) != int(pdl)
                or int(man.get("epoch", -1)) != int(pep)
            ):
                return None
        except Exception:
            return None
    try:
        old = _read_phrase_rows(spark, index)
        if old is None:
            old = [r.asDict() for r in spark.read.parquet(
                _join(index.index_dir, PHRASE_DF_DIR)).collect()]
    except Exception:
        return None
    if not old or "pblock" not in old[0]:
        return None  # pre-per-block layout: full rebuild required
    phrase_order = list(dict.fromkeys(r["phrase"] for r in old))
    dirty = {int(b) for b in dirty_pblocks}
    kept = [
        (r["phrase"], int(r["pblock"]), int(r["df_all"]), int(r["df_name"]))
        for r in old
        if int(r["pblock"]) not in dirty and int(r["pblock"]) != -1
    ]
    term_lists = [(p, phrase_terms(p)) for p in phrase_order if len(p) >= 3]
    fresh: list = []
    dirty_files = [(pb, f) for pb, f in index.posting_files if pb in dirty]
    if term_lists and index.n_docs and dirty_files:
        pts = [ts for _, ts in term_lists]
        needed = sorted({int(t) for ts in pts for t in ts})
        stats = _phrase_block_stats(spark, index, pts, needed, dirty_files)
        fresh = [(term_lists[pi][0], pb, da, dn) for pb, pi, da, dn in stats]
    return _write_phrase_table(spark, index, kept + fresh, phrase_order)


def load_phrase_df(spark: SparkSession, index) -> dict:
    """The phrase-df dict for ``index``, or {} when absent or STALE
    (fingerprint mismatch — the corpus changed since the table was
    built, so its dfs would silently corrupt idf)."""
    from codebased_spark.plans.engine import FORMAT_VERSION, _join

    man_path = _join(index.index_dir, "_manifest", f"{PHRASE_DF_MANIFEST}.json")
    if not index.fs.exists(man_path):
        return {}
    try:
        man = index.fs.read_json(man_path)
    except Exception:
        return {}
    try:
        if (
            int(man.get("version", -1)) != FORMAT_VERSION
            or int(man.get("n_docs", -1)) != index.n_docs
            or int(man.get("total_dl", -1)) != index.total_dl
            or ("epoch" in man
                and int(man["epoch"]) != _incr_epoch(index))
        ):
            return {}
        rows = _read_phrase_rows(spark, index)
        if rows is None:
            rows = [r.asDict() for r in spark.read.parquet(
                _join(index.index_dir, PHRASE_DF_DIR)).collect()]
        if rows and "pblock" in rows[0]:
            agg: dict = {}
            for r in rows:  # per-block layout: dfs are additive
                a = agg.setdefault(r["phrase"], [0, 0])
                a[0] += int(r["df_all"])
                a[1] += int(r["df_name"])
            return {p: (a, b) for p, (a, b) in agg.items()}
        return {r["phrase"]: (int(r["df_all"]), int(r["df_name"])) for r in rows}
    except Exception:
        # a manifest surviving a crash window whose data dir is gone
        # must disable the table, never make the index unopenable
        return {}
