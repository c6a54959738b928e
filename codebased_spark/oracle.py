"""SQLite FTS5 golden oracle.

Builds the reference's exact index shape directly via the sqlite3 stdlib —
``CREATE VIRTUAL TABLE fts USING fts5(path, name, content,
tokenize="trigram")`` (codebased/migrations/000_initial.sql:39) — inserts
the same documents our engine indexes, and runs the reference's exact
two-branch search CTE (codebased/search.py:240-302). Parity tests compare
our Spark engine's top-k (keys + scores) against this oracle; score = -rank.

No OpenAI / FAISS / network required.
"""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass

from codebased_spark.functions.fts5 import quote_fts_query

# The reference's full-text CTE, codebased/search.py:240-302, minus the
# object/file metadata joins (we join metadata on our side by doc_id).
_SEARCH_SQL = """
with name_matches as (
        select rowid, true as name_match, rank
        from fts
        where name match :query
        order by rank
        limit :top_k
),
content_matches as (
        select rowid, false as name_match, rank
        from fts(:query)
        order by rank
        limit :top_k
),
all_matches as (
        select * from name_matches
        union all
        select * from content_matches
),
min_rank_by_rowid as (
        select rowid,
               max(name_match) as name_match,
               min(rank) as rank
        from all_matches
        group by rowid
        order by name_match desc, rank
)
select rowid, name_match, rank
from min_rank_by_rowid
order by name_match desc, rank
limit :top_k;
"""


@dataclass(frozen=True)
class OracleHit:
    doc_id: int
    name_match: int
    rank: float  # FTS5 rank (= -bm25 score); lower is better

    @property
    def score(self) -> float:
        return -self.rank


class Fts5Oracle:
    """In-memory FTS5 index over (doc_id, path, name, content) rows."""

    def __init__(self, docs):
        """docs: iterable of (doc_id, path, name, content)."""
        self.db = sqlite3.connect(":memory:")
        self.db.execute(
            'create virtual table fts using fts5(path, name, content, tokenize="trigram")'
        )
        self.db.executemany(
            "insert into fts (rowid, path, name, content) values (?,?,?,?)",
            list(docs),
        )
        self.db.commit()

    def search(self, query: str, top_k: int = 32) -> list[OracleHit]:
        """The reference's full two-branch search (quote + CTE)."""
        q = quote_fts_query(query)
        try:
            rows = self.db.execute(
                _SEARCH_SQL, {"query": q, "top_k": top_k}
            ).fetchall()
        except sqlite3.OperationalError:
            # FTS5 raises on syntactically-empty queries; the reference
            # surfaces 0 results in that case.
            return []
        return [OracleHit(int(r[0]), int(r[1]), float(r[2])) for r in rows]

    def match_all_columns(self, query: str, top_k: int = 32) -> list[OracleHit]:
        """Single-branch ``fts(:query)`` (codebased/search.py:249-254)."""
        q = quote_fts_query(query)
        try:
            rows = self.db.execute(
                "select rowid, 0, rank from fts(:q) order by rank limit :k",
                {"q": q, "k": top_k},
            ).fetchall()
        except sqlite3.OperationalError:
            return []
        return [OracleHit(int(r[0]), 0, float(r[2])) for r in rows]

    def match_name_column(self, query: str, top_k: int = 32) -> list[OracleHit]:
        """Single-branch ``name MATCH :query`` (codebased/search.py:242-248)."""
        q = quote_fts_query(query)
        try:
            rows = self.db.execute(
                "select rowid, 1, rank from fts where name match :q "
                "order by rank limit :k",
                {"q": q, "k": top_k},
            ).fetchall()
        except sqlite3.OperationalError:
            return []
        return [OracleHit(int(r[0]), 1, float(r[2])) for r in rows]
