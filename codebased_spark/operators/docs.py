"""FTS document construction (operators S8, I4 of SURVEY.md §2).

Turns corpus rows (and later, chunker output) into the ``docs`` DataFrame —
one row per FTS document with columns ``(doc_id, repo, path, commit, lang,
name, kind, byte_start, byte_end, sha256, content, dl_path, dl_name,
dl_content, dl)`` where dl_* are FTS5 trigram token counts per column
(max(0, chars-2)) and dl is the whole-row document length used by BM25
(reference: SQLite FTS5 with fts5(path, name, content) declared at
codebased/migrations/000_initial.sql:39).

doc_id scheme (scale-first): ``(partition_block << 40) | local_row``.
The corpus is hash-partitioned on (repo, path) — deterministic — and
sorted within partitions by the full natural key, so ids are unique and
reproducible WITHOUT any global sort or single-partition window (a
``row_number() over (order by ...)`` would serialize 10^12 rows through
one task). Posting lists only need a stable total order on doc_id, which
this provides. The reference's rowids are traversal-order artifacts
(codebased/index.py:548-567) and not reproducible; parity therefore
compares on natural keys + scores (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_ID_BLOCK_BITS = 40  # up to 2^40 docs per partition block, 2^23 blocks

DOCS_COLUMNS = [
    "doc_id", "repo", "path", "commit", "lang", "name", "kind",
    "byte_start", "byte_end", "sha256", "content",
    "dl_path", "dl_name", "dl_content", "dl",
]


def file_docs(corpus: DataFrame) -> DataFrame:
    """Every file is one FTS document with name=path, kind='file' — the
    reference always emits this object even for unparsed languages
    (codebased/parser.py:124-135)."""
    return corpus.select(
        "repo", "path", "commit", "lang",
        F.col("path").alias("name"),
        F.lit("file").alias("kind"),
        F.lit(0).cast("long").alias("byte_start"),
        F.length(F.col("content").cast("binary")).cast("long").alias("byte_end"),
        F.sha2(F.col("content").cast("binary"), 256).alias("sha256"),
        "content",
    )


def with_doc_lengths(docs: DataFrame) -> DataFrame:
    """dl_* = trigram tokens per column = max(0, chars-2); dl = row total.

    Uses character length (F.length on string) — FTS5 trigram positions
    and counts are per *character* after casefold. ASCII casefold does
    not change length. All JVM-side."""
    tok = lambda c: F.greatest(F.lit(0), F.length(F.col(c)) - 2).cast("long")
    return (
        docs.withColumn("dl_path", tok("path"))
        .withColumn("dl_name", tok("name"))
        .withColumn("dl_content", tok("content"))
        .withColumn("dl", F.col("dl_path") + F.col("dl_name") + F.col("dl_content"))
    )


def assign_doc_ids(docs: DataFrame, num_blocks: int = 32, block_offset: int = 0) -> DataFrame:
    """Deterministic, shuffle-cheap doc ids: hash-repartition on
    (repo, path), sort within partitions by the natural key, then
    ``doc_id = (partition_id << 40) | local_index`` — entirely JVM-side
    via ``monotonically_increasing_id`` (r7; previously a mapInPandas
    pass that shipped every content byte through the python workers
    just to attach a counter).

    ``monotonically_increasing_id`` is exactly
    ``(partition_id << 33) | row_index_within_partition`` evaluated in
    pipeline order ABOVE the sort (non-deterministic expressions are
    never reordered across a Sort by Catalyst), so unpacking it yields
    the same (pid, local) pair the python pass produced — ids are
    bit-identical (pinned by the determinism/parallelism tests and the
    after-commit value oracle). Blocks are bounded at 2^33 docs by the
    id's layout (vs 2^40 before) — far above the tokens-per-block
    memory contract (build.py) that actually sizes blocks; a block
    overflowing 2^33 would surface loudly as the fused build's
    "multiple doc blocks" guard, never as silent id reuse.

    One shuffle total; no global sort; no driver collect; no python
    boundary. Ids are sparse but strictly increasing within a block —
    exactly what delta-encoded posting lists need."""
    parted = (
        docs.repartition(num_blocks, "repo", "path")
        .sortWithinPartitions("repo", "path", "byte_start", "byte_end", "kind", "name")
    )
    mono = F.monotonically_increasing_id()
    pid = F.shiftright(mono, 33) + F.lit(int(block_offset)).cast("long")
    local = mono.bitwiseAND(F.lit((1 << 33) - 1).cast("long"))
    return parted.select(
        (F.shiftleft(pid, DOC_ID_BLOCK_BITS) + local).alias("doc_id"),
        *docs.columns,
    )


def build_docs(
    corpus: DataFrame, num_blocks: int = 32, chunk: bool = False, block_offset: int = 0
) -> DataFrame:
    """corpus -> docs with ids and lengths. ``chunk=True`` adds per-object
    documents via the code chunker (operators/chunker.py). ``block_offset``
    places the docs in fresh blocks above an existing index's blocks
    (incremental appends)."""
    if chunk:
        from codebased_spark.operators.chunker import chunk_objects

        d = chunk_objects(corpus)
    else:
        d = file_docs(corpus)
    return assign_doc_ids(with_doc_lengths(d), num_blocks, block_offset)


def corpus_stats(docs: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — the two broadcast scalars of BM25 (FTS5 reads these
    from its 'averages' shadow row). One tiny agg job."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n = int(row["n"])
    return n, float(row["avgdl"]) if n else 0.0
