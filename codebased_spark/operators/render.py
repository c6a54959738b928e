"""Result rendering, highlighting, and hybrid merge (operators P5, Q9,
Q12 of SURVEY.md §2) — pure driver-side functions over the collected
top-k rows (<= 2·k rows; never distributed work).

Each reproduces the reference byte-for-byte:
- render_object: context lines + body with optional line numbers
  (codebased/parser.py:564-605, including the quirk that context_after
  lines are commented out there and thus NOT rendered, and the
  IndexError guard for files ending in a newline).
- find_highlights: case-insensitive keyword+phrase spans, sorted,
  overlap-merged, with (start_line, end_line) per span
  (codebased/search.py:60-91).
- merge_results: the 3-tier hybrid ranking of semantic x full-text
  results — leading run of name-matches first (tier -1), docs in both
  lists next (tier 0, tie-break min index), then single-source docs in
  source order (tier 1) (codebased/search.py:317-375).
"""

from __future__ import annotations

import bisect
import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Query:
    """Parsed query for highlighting (codebased/search.py:30-53)."""

    phrases: tuple
    keywords: tuple
    original: str

    @classmethod
    def parse(cls, query: str) -> "Query":
        phrases, keywords = [], []
        for m in re.finditer(r'(?:"((?:[^"\\]|\\.)*)"|\S+)', query):
            if m.group(1) is not None:
                p = m.group(1).replace('\\"', '"')
                if p:
                    phrases.append(p)
            else:
                keywords.append(m.group())
        return cls(tuple(phrases), tuple(keywords), query)


def render_object(
    row,
    in_lines: list[str],
    *,
    context: bool = True,
    file: bool = True,
    line_numbers: bool = False,
) -> str:
    """row: any mapping with path, start_row, end_row, context_before."""
    out_lines = []
    if file:
        out_lines.append(str(row["path"]))
        out_lines.append("")
    ctx = list(row["context_before"] or [])
    max_line_no = max(row["start_row"], row["end_row"], *ctx) + 1
    width = len(str(max_line_no))

    def fmt(i: int, content: str) -> str:
        if line_numbers:
            return str(i + 1).rjust(width) + " " + content
        return content

    if context:
        for line in ctx:
            out_lines.append(fmt(line, in_lines[line]))
    for i in range(row["start_row"], row["end_row"] + 1):
        try:
            out_lines.append(fmt(i, in_lines[i]))
        except IndexError:
            if i == row["end_row"]:
                break  # trailing newline at EOF (parser.py:597-601)
            raise
    return "\n".join(out_lines)


def find_highlights(query: Query, text: str):
    """-> (merged char spans, (start_line, end_line) per span)."""
    spans = []
    newlines = [m.start() for m in re.finditer("\n", text)]

    def line_of(i):
        return bisect.bisect(newlines, i)

    for kw in query.keywords:
        spans.extend(m.span() for m in re.finditer(re.escape(kw), text, re.IGNORECASE))
    for ph in query.phrases:
        spans.extend(m.span() for m in re.finditer(re.escape(ph), text, re.IGNORECASE))

    spans.sort(key=lambda x: x[0])
    merged: list[tuple[int, int]] = []
    for start, end in spans:
        if merged and merged[-1][1] >= start:
            merged[-1] = (merged[-1][0], max(merged[-1][1], end))
        else:
            merged.append((start, end))
    lines = [(line_of(s), line_of(e - 1)) for s, e in merged]
    return merged, lines


def merge_results(semantic: list[dict], full_text: list[dict]) -> list[dict]:
    """3-tier hybrid merge. Inputs: dicts with at least ``doc_id``;
    full-text rows also carry ``name_match``. Output rows carry whichever
    of ``distance``/``score`` their sources had."""
    sem_ids = {r["doc_id"]: i for i, r in enumerate(semantic)}
    fts_ids = {r["doc_id"]: i for i, r in enumerate(full_text)}
    both = set(sem_ids) & set(fts_ids)
    name_matches = {r["doc_id"] for r in full_text if r.get("name_match")}

    results, sort_key = [], {}
    for doc_id in both:
        si, fi = sem_ids.pop(doc_id), fts_ids.pop(doc_id)
        merged = dict(full_text[fi])
        merged.update(semantic[si])
        results.append(merged)
        sort_key[doc_id] = (0, min(si, fi))
    for doc_id, fi in fts_ids.items():
        results.append(dict(full_text[fi]))
        sort_key[doc_id] = (1, fi)
    for doc_id, si in sem_ids.items():
        results.append(dict(semantic[si]))
        sort_key[doc_id] = (1, si)
    # leading run of name matches jumps to tier -1 (search.py:369-374)
    for i, r in enumerate(full_text):
        if r["doc_id"] in name_matches:
            sort_key[r["doc_id"]] = (-1, i)
        else:
            break
    return sorted(results, key=lambda r: sort_key[r["doc_id"]])
