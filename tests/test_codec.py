"""Roundtrip tests for the posting-list codec (delta+varint+skips)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from codebased_spark.functions.codec import (
    SKIP_EVERY,
    build_skips,
    decode_deltas,
    decode_positions,
    decode_varint,
    encode_deltas,
    encode_positions,
    encode_varint,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.int64)
    assert decode_varint(encode_varint(v)).tolist() == values


def test_varint_boundaries():
    v = np.array([0, 127, 128, 16383, 16384, 2**62, 1], dtype=np.int64)
    assert decode_varint(encode_varint(v)).tolist() == v.tolist()
    assert encode_varint(np.array([0], dtype=np.int64)) == b"\x00"
    assert encode_varint(np.array([300], dtype=np.int64)) == b"\xac\x02"
    assert decode_varint(b"") .size == 0


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(raws):
    v = np.unique(np.array(raws, dtype=np.int64))
    assert decode_deltas(encode_deltas(v)).tolist() == v.tolist()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**30), min_size=1, max_size=40),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(per_doc):
    per_doc = [sorted(set(p)) for p in per_doc]
    tfs = np.array([len(p) for p in per_doc], dtype=np.int64)
    flat = np.array([x for p in per_doc for x in p], dtype=np.int64)
    got = decode_positions(encode_positions(flat, tfs), tfs)
    assert got.tolist() == flat.tolist()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**39),
            st.lists(st.integers(min_value=0, max_value=2**20), min_size=1, max_size=5),
            st.integers(min_value=1, max_value=1000),
        ),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=50, deadline=None)
def test_chunked_roundtrip_and_selective(entries):
    """Chunked encoding decodes back exactly — both the full stream and
    every chunk independently (the skip-pointer contract)."""
    from codebased_spark.functions.codec import (
        decode_doc_ids_chunked,
        encode_posting_chunked,
        slice_chunks,
    )

    by_doc = {}
    for d, ps, dl in entries:
        by_doc[d] = (sorted(set(ps)), dl)
    doc_ids = np.array(sorted(by_doc), dtype=np.int64)
    tfs = np.array([len(by_doc[d][0]) for d in doc_ids], dtype=np.int64)
    flat = np.array([p for d in doc_ids for p in by_doc[d][0]], dtype=np.int64)
    dls = np.array([by_doc[d][1] for d in doc_ids], dtype=np.int64)

    (db, tb, pb, lb, last, maxtf, mindl, d_off, t_off, p_off, l_off) = (
        encode_posting_chunked(doc_ids, tfs, flat, dls)
    )
    assert decode_doc_ids_chunked(db).tolist() == doc_ids.tolist()
    assert decode_varint(tb).tolist() == tfs.tolist()
    assert decode_positions(pb, tfs).tolist() == flat.tolist()
    assert decode_varint(lb).tolist() == dls.tolist()

    # per-chunk independence
    n = doc_ids.size
    pos_offs = np.cumsum(tfs) - tfs
    for ci in range(last.size):
        s, e = ci * SKIP_EVERY, min((ci + 1) * SKIP_EVERY, n)
        chunk_docs = np.cumsum(
            decode_varint(slice_chunks(db, d_off, np.array([ci]), len(db))[0]),
            dtype=np.int64,
        )
        assert chunk_docs.tolist() == doc_ids[s:e].tolist()
        chunk_tfs = decode_varint(slice_chunks(tb, t_off, np.array([ci]), len(tb))[0])
        assert chunk_tfs.tolist() == tfs[s:e].tolist()
        ps = int(pos_offs[s])
        pe = int(pos_offs[e - 1] + tfs[e - 1])
        chunk_pos = decode_positions(
            slice_chunks(pb, p_off, np.array([ci]), len(pb))[0], chunk_tfs
        )
        assert chunk_pos.tolist() == flat[ps:pe].tolist()
        assert last[ci] == doc_ids[e - 1]


def test_skips():
    n = 300
    docs = np.arange(1000, 1000 + n, dtype=np.int64)
    tfs = np.arange(1, n + 1, dtype=np.int64)
    dls = np.arange(50, 50 + n, dtype=np.int64)
    last, maxtf, mindl = build_skips(docs, tfs, dls)
    assert last.size == (n + SKIP_EVERY - 1) // SKIP_EVERY == 3
    assert last.tolist() == [1000 + SKIP_EVERY - 1, 1000 + 2 * SKIP_EVERY - 1, 1000 + n - 1]
    assert maxtf.tolist() == [SKIP_EVERY, 2 * SKIP_EVERY, n]
    assert mindl.tolist() == [50, 50 + SKIP_EVERY, 50 + 2 * SKIP_EVERY]


def test_whole_stream_encode_equals_per_chunk_encode():
    """The r2 vectorized encoder relies on varint bytes being per-value
    independent: whole-stream encoding must be byte-identical to
    encoding each SKIP_EVERY chunk separately, and the offset arrays
    must point at exactly those chunk boundaries."""
    import numpy as np

    from codebased_spark.functions.codec import (
        SKIP_EVERY,
        encode_posting_chunked,
        encode_positions,
        encode_varint,
    )

    rng = np.random.RandomState(9)
    for n in (1, 127, 128, 129, 1000, 5000):
        doc_ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype("int64")
        tfs = rng.randint(1, 30, size=n).astype("int64")
        dls = rng.randint(1, 10**6, size=n).astype("int64")
        flat_pos = np.concatenate(
            [np.sort(rng.choice(10**5, size=t, replace=False)) for t in tfs]
        ).astype("int64")

        (doc_b, tf_b, pos_b, dl_b, _l, _mt, _md,
         d_off, t_off, p_off, l_off) = encode_posting_chunked(doc_ids, tfs, flat_pos, dls)

        # reference: encode chunk by chunk (the r1 formulation)
        deltas = np.empty(n, dtype=np.int64)
        deltas[0] = doc_ids[0]
        np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
        starts = np.arange(0, n, SKIP_EVERY)
        deltas[starts] = doc_ids[starts]
        pos_doc_starts = np.cumsum(tfs) - tfs
        parts = {"doc": [], "tf": [], "pos": [], "dl": []}
        for s in range(0, n, SKIP_EVERY):
            e = min(s + SKIP_EVERY, n)
            parts["doc"].append(encode_varint(deltas[s:e]))
            parts["tf"].append(encode_varint(tfs[s:e]))
            ps = int(pos_doc_starts[s])
            pe = int(pos_doc_starts[e - 1] + tfs[e - 1])
            parts["pos"].append(encode_positions(flat_pos[ps:pe], tfs[s:e]))
            parts["dl"].append(encode_varint(dls[s:e]))

        assert doc_b == b"".join(parts["doc"])
        assert tf_b == b"".join(parts["tf"])
        assert pos_b == b"".join(parts["pos"])
        assert dl_b == b"".join(parts["dl"])
        for off, key in ((d_off, "doc"), (t_off, "tf"), (p_off, "pos"), (l_off, "dl")):
            want = np.cumsum([0] + [len(b) for b in parts[key]])[:-1]
            assert (off == want).all(), key
