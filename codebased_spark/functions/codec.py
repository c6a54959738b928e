"""Posting-list codec: delta + LEB128 varint, fully numpy-vectorized.

The engine-internal binary format (SURVEY.md §7.2) — the Spark analogue
of FTS5's doclist encoding (fts5 stores delta+varint doclists in its
%_data shadow table). All encode/decode paths are vectorized numpy (no
per-int Python), so codec throughput keeps up with Arrow batch transport
inside pandas UDFs.

Layout per posting row (one (term, col) within one doc-block):
  doc_bytes : varint(delta(doc_ids))          first doc absolute
  tf_bytes  : varint(tf per doc)              tf >= 1
  pos_bytes : per doc: varint(first pos), varint(pos deltas)  concatenated
  skip_*    : per SKIP_EVERY docs: last_doc_id, max_tf, min_dl, and byte
              offsets into doc/tf/pos bytes — block-max metadata enabling
              skip-decode and WAND-style bounds.
"""

from __future__ import annotations

import numpy as np

SKIP_EVERY = 128

_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.searchsorted(_THRESHOLDS, v, side="right") + 1
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nb.max())):
        m = nb > j
        idx = starts[m] + j
        byte = ((v[m] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def decode_varint(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes -> int64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    out = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lens.max())):
        m = lens > j
        out[m] |= (b[starts[m] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return out.astype(np.int64)


def encode_deltas(sorted_values: np.ndarray) -> bytes:
    """varint(delta) of a strictly-increasing int array; first absolute."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    return encode_varint(d)


def decode_deltas(buf: bytes) -> np.ndarray:
    d = decode_varint(buf)
    return np.cumsum(d, dtype=np.int64) if d.size else d


def encode_positions(flat_positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """Per-doc position lists (concatenated, each ascending) -> bytes.
    Within a doc: first position absolute, then deltas."""
    p = np.asarray(flat_positions, dtype=np.int64)
    if p.size == 0:
        return b""
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.cumsum(tfs) - tfs
    d = np.empty_like(p)
    d[0] = p[0]
    np.subtract(p[1:], p[:-1], out=d[1:])
    d[starts] = p[starts]  # reset at doc boundaries (absolute)
    return encode_varint(d)


def decode_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions -> flat positions (len = tfs.sum())."""
    d = decode_varint(buf)
    if d.size == 0:
        return d
    tfs = np.asarray(tfs, dtype=np.int64)
    starts = np.cumsum(tfs) - tfs
    c = np.cumsum(d, dtype=np.int64)
    base = c[starts] - d[starts]  # running total before each doc
    return c - np.repeat(base, tfs)


def _varint_sizes(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (LEB128)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64) + 1


def encode_posting_chunked(
    doc_ids: np.ndarray, tfs: np.ndarray, flat_pos: np.ndarray, dls: np.ndarray
):
    """Chunk-independent posting encoding: every SKIP_EVERY docs start a
    new chunk whose first doc id is absolute (the delta chain restarts),
    so any chunk can be decoded without its predecessors — FTS5/Lucene
    skip-block structure. Returns
    (doc_bytes, tf_bytes, pos_bytes, dl_bytes,
     skip_last, skip_max_tf, skip_min_dl,
     skip_doc_off, skip_tf_off, skip_pos_off, skip_dl_off)
    where skip_*_off[i] is the byte offset of chunk i in each stream.

    Each stream is encoded in ONE vectorized pass (varint bytes are
    per-value independent, so whole-stream encoding is byte-identical
    to per-chunk encoding — property-tested); chunk offsets come from a
    prefix sum of per-value byte sizes, not from encoding chunks
    separately. This removed the per-chunk Python loop that dominated
    the round-1 build profile."""
    n = doc_ids.size
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    flat_pos = np.asarray(flat_pos, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)

    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return (b"", b"", b"", b"", z, z, z, z.copy(), z.copy(), z.copy(), z.copy())

    starts = np.arange(0, n, SKIP_EVERY)

    # doc deltas with a reset (absolute value) at each chunk start
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    deltas[starts] = doc_ids[starts]

    # position stream: per-doc delta chains (encode_positions semantics,
    # inlined so the same delta array yields both bytes and sizes)
    doc_pos_starts = np.cumsum(tfs) - tfs
    if flat_pos.size:
        pd_ = np.empty_like(flat_pos)
        pd_[0] = flat_pos[0]
        np.subtract(flat_pos[1:], flat_pos[:-1], out=pd_[1:])
        pd_[doc_pos_starts] = flat_pos[doc_pos_starts]  # absolute at doc starts
        pos_b = encode_varint(pd_)
        pos_sizes = _varint_sizes(pd_)
    else:
        pos_b = b""
        pos_sizes = np.empty(0, dtype=np.int64)

    def offsets(sizes: np.ndarray, idx: np.ndarray) -> np.ndarray:
        cum = np.concatenate(([0], np.cumsum(sizes)))
        return cum[idx]

    d_off = offsets(_varint_sizes(deltas), starts)
    t_off = offsets(_varint_sizes(tfs), starts)
    l_off = offsets(_varint_sizes(dls), starts)
    p_off = offsets(pos_sizes, doc_pos_starts[starts])

    skip_last, skip_maxtf, skip_mindl = build_skips(doc_ids, tfs, dls)
    return (
        encode_varint(deltas), encode_varint(tfs), pos_b, encode_varint(dls),
        skip_last, skip_maxtf, skip_mindl,
        d_off, t_off, p_off, l_off,
    )


def decode_doc_ids_chunked(buf: bytes) -> np.ndarray:
    """Full decode of a chunked doc stream (delta chain restarts every
    SKIP_EVERY values)."""
    d = decode_varint(buf)
    if d.size == 0:
        return d
    c = np.cumsum(d, dtype=np.int64)
    starts = np.arange(0, d.size, SKIP_EVERY)
    base = c[starts] - d[starts]
    reps = np.diff(np.concatenate((starts, [d.size])))
    return c - np.repeat(base, reps)


def slice_chunks(buf: bytes, offsets: np.ndarray, chunk_ids: np.ndarray, total_len: int):
    """bytes of the selected chunks (each independently decodable)."""
    ends = np.concatenate((offsets[1:], [total_len])).astype(np.int64)
    return [buf[int(offsets[i]) : int(ends[i])] for i in chunk_ids]


def build_skips(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
    """Block-max skip metadata per SKIP_EVERY docs:
    (last_doc, max_tf, min_dl) arrays. max_tf with min_dl upper-bounds the
    BM25 term contribution of the chunk for any avgdl (tf-part increasing
    in tf, decreasing in dl) — the Block-Max WAND bound."""
    n = doc_ids.size
    if n == 0:
        return (np.empty(0, np.int64),) * 3
    starts = np.arange(0, n, SKIP_EVERY)
    ends = np.minimum(starts + SKIP_EVERY, n)
    last = np.asarray(doc_ids, dtype=np.int64)[ends - 1]
    maxtf = np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), starts)
    mindl = np.minimum.reduceat(np.asarray(dls, dtype=np.int64), starts)
    return last, maxtf, mindl
