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

from codebased_spark.functions.codec import encode_posting_chunked
from codebased_spark.operators.docs import DOC_ID_BLOCK_BITS

TOKEN_SCHEMA = (
    "pblock int, doc_id long, dl long, col int, term long, positions array<int>"
)

# dl_bytes inlines each posting doc's whole-row length (varint, aligned
# with doc_bytes) so queries score without any doc_stats join — the
# analogue of FTS5's %_docsize lookups, paid once at build time.
POSTING_SCHEMA = (
    "pblock int, term long, col int, df long, "
    "doc_bytes binary, tf_bytes binary, pos_bytes binary, dl_bytes binary, "
    "skip_last array<long>, skip_max_tf array<long>, skip_min_dl array<long>, "
    "skip_doc_off array<long>, skip_tf_off array<long>, "
    "skip_pos_off array<long>, skip_dl_off array<long>"
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
    return _encode_row(pblock, term, col, doc_ids, tfs, flat.astype(np.int64), dls)


def _encode_row(pblock, term, col, doc_ids, tfs, flat_pos, dls):
    (doc_b, tf_b, pos_b, dl_b,
     skip_last, skip_maxtf, skip_mindl,
     d_off, t_off, p_off, l_off) = encode_posting_chunked(doc_ids, tfs, flat_pos, dls)
    return (
        int(pblock), int(term), int(col), int(doc_ids.size),
        doc_b, tf_b, pos_b, dl_b,
        skip_last.tolist(), skip_maxtf.tolist(), skip_mindl.tolist(),
        d_off.tolist(), t_off.tolist(), p_off.tolist(), l_off.tolist(),
    )


def _encode_batches(it):
    """mapInPandas over a partition sorted by (pblock, term, col, doc_id):
    run-length group aggregation into compressed posting rows (I2+I3+I5).
    Groups can straddle Arrow batches, so the tail group of each batch is
    carried into the next."""
    cols = ["pblock", "term", "col", "df",
            "doc_bytes", "tf_bytes", "pos_bytes", "dl_bytes",
            "skip_last", "skip_max_tf", "skip_min_dl",
            "skip_doc_off", "skip_tf_off", "skip_pos_off", "skip_dl_off"]
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


def _fused_batches(it):
    """One-pass tokenize + postings-encode for a whole doc block.

    Accumulates the partition's raw occurrence stream
    (term, col, doc, pos) as flat numpy arrays, then one stable lexsort
    by (term, col, doc) — positions stay ascending because they are
    generated ascending — then run-length group encoding. Compared with
    the two-stage path this skips an Arrow round-trip and a JVM external
    sort over one row per posting entry; output is byte-identical.

    Memory contract: a block's full occurrence stream lives in numpy
    (~16 bytes/token). Executor sizing rule: choose num_blocks so
    tokens_per_block * 16B fits comfortably in a task's memory
    (e.g. <= 1e8 tokens/block ~ 1.6 GB). This explicit partition-sizing
    knob is the build's scale contract (SURVEY.md §7.1 M5).
    """
    from codebased_spark.functions.fts5 import tokenize_packed

    # bandwidth-lean accumulation: per token only the TERM array is
    # materialized during the scan; the (col, local_doc) key and the
    # position columns are reconstructed afterwards from per-SEGMENT
    # metadata (one scalar key + one length per (doc, col)) with two
    # vectorized repeats — round 1's per-segment np.full/arange allocs
    # were a measurable share of the build profile.
    terms_l: list[np.ndarray] = []
    seg_key: list[int] = []
    seg_len: list[int] = []
    doc_dl: dict[int, int] = {}
    base_doc = None

    for pdf in it:
        for doc_id, dl, path, name, content in zip(
            pdf["doc_id"].to_numpy(),
            pdf["dl"].to_numpy(),
            pdf["path"].to_numpy(),
            pdf["name"].to_numpy(),
            pdf["content"].to_numpy(),
        ):
            doc_id = int(doc_id)
            if base_doc is None:
                base_doc = doc_id & ~((1 << DOC_ID_BLOCK_BITS) - 1)
            local = doc_id - base_doc
            if not 0 <= local < (1 << DOC_ID_BLOCK_BITS):
                raise ValueError("fused postings build saw multiple doc blocks")
            doc_dl[local] = int(dl)
            for col, text in enumerate((path, name, content)):
                t = tokenize_packed(text)
                if t.size == 0:
                    continue
                terms_l.append(t)
                seg_key.append((col << DOC_ID_BLOCK_BITS) | local)
                seg_len.append(t.size)

    if not terms_l:
        return
    terms = np.concatenate(terms_l)
    lens = np.asarray(seg_len, dtype=np.int64)
    seg_starts = np.cumsum(lens) - lens
    keys = np.repeat(np.asarray(seg_key, dtype=np.int64), lens)
    poss = (
        np.arange(terms.size, dtype=np.int64) - np.repeat(seg_starts, lens)
    ).astype(np.int32)
    del terms_l, seg_key, seg_len, lens, seg_starts

    order = np.lexsort((keys, terms))  # stable: pos stays ascending
    terms, keys, poss = terms[order], keys[order], poss[order]
    del order

    pblock = int(base_doc >> DOC_ID_BLOCK_BITS)
    dl_arr = np.zeros(max(doc_dl) + 1, dtype=np.int64)
    for loc, dl in doc_dl.items():
        dl_arr[loc] = dl

    # ---- whole-partition vectorized encode (r7) ----------------------
    # _encode_row per (term, col) group spent ~70% of the build's task
    # compute in per-call numpy overhead on tiny arrays (measured:
    # 11.5k encode_varint calls x 33 us for a 625-doc block). Varint
    # bytes are per-value independent and every delta chain's resets
    # are at known indices, so each STREAM is encoded exactly once
    # over the whole partition and rows become byte slices — output is
    # byte-identical to the per-row encoder (pinned by the fused ==
    # two-stage identity test and the codec property tests).
    from codebased_spark.functions.codec import (
        SKIP_EVERY,
        _varint_sizes,
        encode_varint,
    )

    N = terms.size
    mask = (1 << DOC_ID_BLOCK_BITS) - 1

    # doc-level groups: one per (term, col, doc)
    new_doc = np.empty(N, dtype=bool)
    new_doc[0] = True
    np.not_equal(terms[1:], terms[:-1], out=new_doc[1:])
    new_doc[1:] |= keys[1:] != keys[:-1]
    dg_starts = np.flatnonzero(new_doc)
    G = dg_starts.size
    dg_starts_ext = np.append(dg_starts, N)
    tfs_all = np.diff(dg_starts_ext)
    dg_terms = terms[dg_starts]
    dg_keys = keys[dg_starts]
    cols_all = dg_keys >> DOC_ID_BLOCK_BITS
    locals_all = dg_keys & mask
    docs_all = locals_all + base_doc
    dls_all = dl_arr[locals_all]

    # posting rows: one per (term, col)
    new_row = np.empty(G, dtype=bool)
    new_row[0] = True
    new_row[1:] = (dg_terms[1:] != dg_terms[:-1]) | (cols_all[1:] != cols_all[:-1])
    row_starts = np.flatnonzero(new_row)
    R = row_starts.size
    row_ends = np.append(row_starts[1:], G)
    row_lens = row_ends - row_starts

    # chunk grid: every SKIP_EVERY docs within a row restarts the doc
    # delta chain (chunks tile [0, G) because each row's last chunk
    # ends exactly where the next row starts)
    n_chunks = (row_lens + SKIP_EVERY - 1) // SKIP_EVERY
    ck_cum = np.concatenate(([0], np.cumsum(n_chunks)))
    total_chunks = int(ck_cum[-1])
    ci = np.arange(total_chunks) - np.repeat(ck_cum[:-1], n_chunks)
    chunk_starts = np.repeat(row_starts, n_chunks) + ci * SKIP_EVERY
    chunk_ends = np.minimum(chunk_starts + SKIP_EVERY,
                            np.repeat(row_ends, n_chunks))

    # doc deltas with an absolute reset at every chunk start
    deltas = np.empty(G, dtype=np.int64)
    deltas[0] = docs_all[0]
    np.subtract(docs_all[1:], docs_all[:-1], out=deltas[1:])
    deltas[chunk_starts] = docs_all[chunk_starts]

    # position deltas with an absolute reset at every doc start
    pd_ = poss.astype(np.int64)
    if N > 1:
        tail = pd_[1:] - pd_[:-1]
        pd_flat = np.empty(N, dtype=np.int64)
        pd_flat[0] = pd_[0]
        pd_flat[1:] = tail
        pd_flat[dg_starts] = pd_[dg_starts]
    else:
        pd_flat = pd_

    doc_b_all = encode_varint(deltas)
    tf_b_all = encode_varint(tfs_all)
    dl_b_all = encode_varint(dls_all)
    pos_b_all = encode_varint(pd_flat)
    doc_cum = np.concatenate(([0], np.cumsum(_varint_sizes(deltas))))
    tf_cum = np.concatenate(([0], np.cumsum(_varint_sizes(tfs_all))))
    dl_cum = np.concatenate(([0], np.cumsum(_varint_sizes(dls_all))))
    pos_cum = np.concatenate(([0], np.cumsum(_varint_sizes(pd_flat))))

    # per-chunk skip metadata + in-row byte offsets
    skip_last_all = docs_all[chunk_ends - 1]
    skip_maxtf_all = np.maximum.reduceat(tfs_all, chunk_starts)
    skip_mindl_all = np.minimum.reduceat(dls_all, chunk_starts)
    rs_per_chunk = np.repeat(row_starts, n_chunks)
    d_off_all = doc_cum[chunk_starts] - doc_cum[rs_per_chunk]
    t_off_all = tf_cum[chunk_starts] - tf_cum[rs_per_chunk]
    l_off_all = dl_cum[chunk_starts] - dl_cum[rs_per_chunk]
    tok_of = dg_starts_ext  # doc-group index -> first token index
    p_off_all = pos_cum[tok_of[chunk_starts]] - pos_cum[tok_of[rs_per_chunk]]

    out_cols = ["pblock", "term", "col", "df",
                "doc_bytes", "tf_bytes", "pos_bytes", "dl_bytes",
                "skip_last", "skip_max_tf", "skip_min_dl",
                "skip_doc_off", "skip_tf_off", "skip_pos_off", "skip_dl_off"]
    row_terms = dg_terms[row_starts]
    row_cols = cols_all[row_starts]
    rows = []
    for r in range(R):
        s, e = int(row_starts[r]), int(row_ends[r])
        cs, ce = int(ck_cum[r]), int(ck_cum[r + 1])
        ts_, te_ = int(tok_of[s]), int(tok_of[e])
        rows.append((
            pblock, int(row_terms[r]), int(row_cols[r]), int(row_lens[r]),
            doc_b_all[doc_cum[s]:doc_cum[e]],
            tf_b_all[tf_cum[s]:tf_cum[e]],
            pos_b_all[pos_cum[ts_]:pos_cum[te_]],
            dl_b_all[dl_cum[s]:dl_cum[e]],
            skip_last_all[cs:ce].tolist(),
            skip_maxtf_all[cs:ce].tolist(),
            skip_mindl_all[cs:ce].tolist(),
            d_off_all[cs:ce].tolist(),
            t_off_all[cs:ce].tolist(),
            p_off_all[cs:ce].tolist(),
            l_off_all[cs:ce].tolist(),
        ))
        if len(rows) >= 20000:
            yield pd.DataFrame(rows, columns=out_cols)
            rows = []
    if rows:
        yield pd.DataFrame(rows, columns=out_cols)


def build_postings_fused(docs: DataFrame) -> DataFrame:
    """docs -> posting rows in a single narrow mapInPandas (the
    production build path; build_postings(tokenize_docs(...)) is the
    two-stage cross-check, byte-identical by test)."""
    return docs.select("doc_id", "dl", "path", "name", "content").mapInPandas(
        _fused_batches, POSTING_SCHEMA
    )
