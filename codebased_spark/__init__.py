"""codebased_spark — a PySpark-native distributed inverted-index + BM25 engine.

A from-scratch rebuild of the query semantics of codebased-sh/codebased
(reference at /root/reference) on Apache Spark:

- source of truth: a table of source code ``(repo, path, commit, lang,
  content)`` (Iceberg when the runtime has the jars, Parquet otherwise);
- derived state: posting-list shards (delta+varint compressed, block-max
  metadata), doc stats and corpus stats — the Spark analogue of SQLite
  FTS5's shadow tables (reference: codebased/migrations/000_initial.sql:39);
- queries: trigram BM25 (k1=1.2, b=0.75) rank-identical to SQLite FTS5's
  ``tokenize="trigram"`` semantics, including the reference's two-branch
  name/all-column union query (codebased/search.py:240-302).

Everything is DataFrame-first; per-partition heavy lifting runs in
Arrow-vectorized pandas UDFs (mapInPandas/applyInPandas), never per-row
Python UDFs.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
IDF_CLAMP = 1e-6
DEFAULT_TOP_K = 32  # reference default: codebased/main.py:101-107
