"""Inverted-index build pipeline (operators I1-I5 of SURVEY.md §2.3).

Dataflow (all DataFrame; Python only inside Arrow-batched UDFs):

  corpus ──repartition(repo,path)──> docs (block doc_ids, operators/docs.py)
         ──mapInPandas(tokenize)──> token rows (pblock, doc_id, dl, col, term, positions)
         ──sortWithinPartitions(pblock, term, col, doc_id)
         ──mapInPandas(encode)────> posting rows (delta+varint blobs + skips)
         ──write.partitionBy(pblock)

Scale design — why there is NO term shuffle:

The index is **document-partitioned** (like Lucene/ES shards): each doc
block (pblock = doc_id >> 40, assigned by a single hash repartition on
(repo, path)) builds its own complete posting lists locally. Token rows
never leave the partition that tokenized them — the "groupBy term" of a
classic postings build becomes a partition-local sort + run-length
aggregation. Consequences at 10^12 files:

- skewed trigrams ("   ", "def", "ion" appear in ~every doc) never
  concentrate on one reducer: a hot term's postings are split across all
  doc blocks by construction. This IS the explicit skew handling the
  north_rule asks for — structural salting, with pblock as the salt,
  rather than a fixup bolted onto a term-keyed shuffle.
- the only wide operations in the whole build are the one doc-id
  repartition and a tiny numeric agg for corpus stats.
- queries parallelize over blocks and merge tiny per-block top-k sets.

The FTS5 'optimize' segment merge (codebased/index.py:670) corresponds
to re-blocking small doc blocks; with deterministic block sizing it is a
no-op here (blocks are built balanced).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.functions.codec import (
    build_skips,
    encode_deltas,
    encode_positions,
    encode_varint,
)
from codebased_spark.operators.docs import DOC_ID_BLOCK_BITS

TOKEN_SCHEMA = (
    "pblock int, doc_id long, dl long, col int, term long, positions array<int>"
)

POSTING_SCHEMA = (
    "pblock int, term long, col int, df long, "
    "doc_bytes binary, tf_bytes binary, pos_bytes binary, "
    "skip_last array<long>, skip_max_tf array<long>, skip_min_dl array<long>"
)


def _tokenize_batches(it):
    """mapInPandas: docs -> token rows. Per doc+column: casefold, packed
    trigram ids via numpy sliding windows (functions/fts5.py), positions
    grouped per distinct term with one stable argsort — no per-token
    Python. (FTS5 trigram tokenizer semantics, I1.)"""
    from codebased_spark.functions.fts5 import tokenize_packed

    for pdf in it:
        out_pblock, out_doc, out_dl, out_col, out_term, out_pos = [], [], [], [], [], []
        for doc_id, dl, path, name, content in zip(
            pdf["doc_id"].to_numpy(),
            pdf["dl"].to_numpy(),
            pdf["path"].to_numpy(),
            pdf["name"].to_numpy(),
            pdf["content"].to_numpy(),
        ):
            pblock = int(doc_id) >> DOC_ID_BLOCK_BITS
            for col, text in enumerate((path, name, content)):
                t = tokenize_packed(text)
                if t.size == 0:
                    continue
                order = np.argsort(t, kind="stable")
                st = t[order]
                starts = np.flatnonzero(np.diff(st)) + 1
                starts = np.concatenate(([0], starts))
                ends = np.concatenate((starts[1:], [st.size]))
                pos32 = order.astype(np.int32)
                for s, e in zip(starts, ends):
                    out_pblock.append(pblock)
                    out_doc.append(doc_id)
                    out_dl.append(dl)
                    out_col.append(col)
                    out_term.append(st[s])
                    out_pos.append(pos32[s:e])
        yield pd.DataFrame(
            {
                "pblock": pd.array(out_pblock, dtype="int32"),
                "doc_id": pd.array(out_doc, dtype="int64"),
                "dl": pd.array(out_dl, dtype="int64"),
                "col": pd.array(out_col, dtype="int32"),
                "term": pd.array(out_term, dtype="int64"),
                "positions": pd.Series(out_pos, dtype="object"),
            }
        )


def tokenize_docs(docs: DataFrame) -> DataFrame:
    """I1: docs -> (pblock, doc_id, dl, col, term, positions). Narrow —
    preserves the doc-block partitioning."""
    return docs.select("doc_id", "dl", "path", "name", "content").mapInPandas(
        _tokenize_batches, TOKEN_SCHEMA
    )


def _encode_group(pblock, term, col, doc_ids, dls, pos_lists):
    tfs = np.fromiter((len(p) for p in pos_lists), dtype=np.int64, count=len(pos_lists))
    flat = np.concatenate(pos_lists) if pos_lists else np.empty(0, np.int32)
    skip_last, skip_maxtf, skip_mindl = build_skips(doc_ids, tfs, dls)
    return (
        int(pblock), int(term), int(col), int(doc_ids.size),
        encode_deltas(doc_ids), encode_varint(tfs),
        encode_positions(flat.astype(np.int64), tfs),
        skip_last.tolist(), skip_maxtf.tolist(), skip_mindl.tolist(),
    )


def _encode_batches(it):
    """mapInPandas over a partition sorted by (pblock, term, col, doc_id):
    run-length group aggregation into compressed posting rows (I2+I3+I5).
    Groups can straddle Arrow batches, so the tail group of each batch is
    carried into the next."""
    cols = ["pblock", "term", "col", "df",
            "doc_bytes", "tf_bytes", "pos_bytes",
            "skip_last", "skip_max_tf", "skip_min_dl"]
    carry = None

    def emit(region: pd.DataFrame):
        pb = region["pblock"].to_numpy()
        tm = region["term"].to_numpy()
        cl = region["col"].to_numpy()
        dc = region["doc_id"].to_numpy()
        dl = region["dl"].to_numpy()
        pos = region["positions"].to_numpy()
        change = np.flatnonzero(
            (np.diff(tm) != 0) | (np.diff(cl) != 0) | (np.diff(pb) != 0)
        ) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(region)]))
        rows = [
            _encode_group(pb[s], tm[s], cl[s], dc[s:e], dl[s:e], list(pos[s:e]))
            for s, e in zip(starts, ends)
        ]
        return pd.DataFrame(rows, columns=cols)

    for pdf in it:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if len(pdf) == 0:
            continue
        last = pdf.iloc[-1]
        tail_mask = (
            (pdf["pblock"] == last["pblock"])
            & (pdf["term"] == last["term"])
            & (pdf["col"] == last["col"])
        )
        # hold back the trailing run that matches the last group key
        tail_start = int(np.flatnonzero(~tail_mask.to_numpy())[-1]) + 1 if (~tail_mask).any() else 0
        carry = pdf.iloc[tail_start:]
        head = pdf.iloc[:tail_start]
        if len(head):
            yield emit(head)
    if carry is not None and len(carry):
        yield emit(carry)


def build_postings(tokens: DataFrame) -> DataFrame:
    """I2/I3/I5: token rows -> compressed posting rows. Partition-local
    sort + aggregation — no shuffle (see module docstring)."""
    return tokens.sortWithinPartitions("pblock", "term", "col", "doc_id").mapInPandas(
        _encode_batches, POSTING_SCHEMA
    )
