"""Semantic retrieval: sha256-keyed embedding cache, persisted ANN
signatures, radius cutoff, and the rerank contract."""

import pytest




def test_doc_features_cached_reembeds_only_changes(spark, tmp_path):
    """sha256-keyed embedding cache (reference: codebased/index.py:
    609-626): unchanged docs cost zero embed calls; duplicate contents
    embed once; results equal the uncached featurizer."""
    from codebased_spark.operators.docs import build_docs
    from codebased_spark.operators.semantic import doc_features, doc_features_cached
    from codebased_spark.sources.corpus import CORPUS_SCHEMA

    cache = str(tmp_path / "emb_cache")
    v1 = [
        ("r1", "a.py", "c" * 40, "python", 'print("alpha beta gamma")'),
        ("r1", "b.py", "c" * 40, "python", 'print("delta epsilon")'),
        ("r2", "copy.py", "c" * 40, "python", 'print("alpha beta gamma")'),  # dup content
    ]
    docs1 = build_docs(spark.createDataFrame(v1, CORPUS_SCHEMA), num_blocks=2)

    acc = spark.sparkContext.accumulator(0)
    out1 = doc_features_cached(spark, docs1, cache, counter=acc)
    assert out1.count() == 3
    assert acc.value == 2  # 2 distinct contents -> 2 embeds, not 3

    # identical output to the uncached path
    ref = {int(r["doc_id"]): r["embedding"] for r in doc_features(docs1).collect()}
    got = {int(r["doc_id"]): r["embedding"] for r in out1.collect()}
    assert got == ref

    # same corpus again: zero embeds
    acc2 = spark.sparkContext.accumulator(0)
    out2 = doc_features_cached(spark, docs1, cache, counter=acc2)
    assert out2.count() == 3 and acc2.value == 0
    assert {int(r["doc_id"]): r["embedding"] for r in out2.collect()} == ref

    # one modified doc: exactly one embed
    v2 = [v1[0], ("r1", "b.py", "d" * 40, "python", 'print("zeta eta theta")'), v1[2]]
    docs2 = build_docs(spark.createDataFrame(v2, CORPUS_SCHEMA), num_blocks=2)
    acc3 = spark.sparkContext.accumulator(0)
    out3 = doc_features_cached(spark, docs2, cache, counter=acc3)
    assert out3.count() == 3 and acc3.value == 1
    ref3 = {int(r["doc_id"]): r["embedding"] for r in doc_features(docs2).collect()}
    assert {int(r["doc_id"]): r["embedding"] for r in out3.collect()} == ref3


def test_ann_indexed_matches_oneshot(spark, tmp_path):
    """The persisted-signature ANN path returns exactly what the
    one-shot path returns (same planes, same rerank)."""
    import numpy as np

    from codebased_spark.operators.simsearch import (
        ann_topk_indexed,
        ann_topk_lsh,
        build_ann_index,
    )

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((60, 16)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    sig_dir = str(tmp_path / "sigs")
    build_ann_index(emb, dim=16, out_path=sig_dir)

    one = [(r["vec_id"], r["cosine"]) for r in ann_topk_lsh(emb, 5, 8, 16).collect()]
    idx = [(r["vec_id"], r["cosine"]) for r in ann_topk_indexed(spark, sig_dir, 5, 8).collect()]
    assert one == idx and len(idx) == 8


def test_semantic_radius_cutoff(spark):
    """range_search semantics: nothing farther than the radius appears,
    the self-match (distance 0) always does, and results are sorted
    (the reference's unsorted-truncation quirk is deliberately not
    reproduced)."""
    from codebased_spark.operators.docs import build_docs
    from codebased_spark.operators.semantic import (
        doc_features,
        semantic_radius,
        semantic_topk,
    )
    from codebased_spark.sources.corpus import CORPUS_SCHEMA

    rows = [
        ("r1", "a.py", "c" * 40, "python", "alpha beta gamma delta"),
        ("r1", "b.py", "c" * 40, "python", "alpha beta gamma delta"),   # same text
        ("r1", "c.py", "c" * 40, "python", "alpha beta gamma epsilon"),  # close
        ("r1", "d.py", "c" * 40, "python", "zzz qqq www entirely other"),
    ]
    docs = build_docs(spark.createDataFrame(rows, CORPUS_SCHEMA), num_blocks=2)
    feats = doc_features(docs)

    full = {r["doc_id"]: r["distance"]
            for r in semantic_topk(feats, "alpha beta gamma delta", 10).collect()}
    assert min(full.values()) == pytest.approx(0.0, abs=1e-6)

    # tight radius: only docs with 2*distance < r^2-scale cutoff survive
    r = 0.5
    got = semantic_radius(feats, "alpha beta gamma delta", radius=r, k=10).collect()
    got_ids = [x["doc_id"] for x in got]
    want_ids = [d for d, dist in sorted(full.items(), key=lambda kv: (kv[1], kv[0]))
                if 2.0 * dist < r]
    assert got_ids == want_ids and 0 < len(got_ids) < len(full)
    dists = [x["distance"] for x in got]
    assert dists == sorted(dists)

    # radius wide enough -> identical to plain top-k
    wide = semantic_radius(feats, "alpha beta gamma delta", radius=4.0, k=10).collect()
    assert [x["doc_id"] for x in wide] == [
        d for d, _ in sorted(full.items(), key=lambda kv: (kv[1], kv[0]))]


def test_plan_embed_batches_reference_contract():
    """The batch planner enforces the reference scheduler's exact rules
    (codebased/index.py:108-121): flush-before-append at 2048 items or
    400k tokens (strict >, so an exact 400k fit stays one batch), skip
    items over 8192 tokens, preserve order, lose nothing."""
    from codebased_spark.operators.semantic import (
        EMBED_BATCH_SIZE_LIMIT,
        EMBED_BATCH_TOKEN_LIMIT,
        EMBED_MAX_DOC_TOKENS,
        plan_embed_batches,
    )

    # token-limit boundary: 50 x 8000 = 400k exactly fits ONE batch
    # (flush is strict >); a 51st item flushes first
    b, s = plan_embed_batches([8000] * 50)
    assert b == [list(range(50))] and s == []
    b, s = plan_embed_batches([8000] * 51)
    assert b == [list(range(50)), [50]] and s == []

    # size-limit boundary: item 2048 opens a new batch
    b, s = plan_embed_batches([1] * (EMBED_BATCH_SIZE_LIMIT + 1))
    assert [len(x) for x in b] == [EMBED_BATCH_SIZE_LIMIT, 1] and s == []

    # skip boundary: 8192 embeds, 8193 is skipped (and not batched)
    b, s = plan_embed_batches([EMBED_MAX_DOC_TOKENS, EMBED_MAX_DOC_TOKENS + 1, 5])
    assert b == [[0, 2]] and s == [1]

    # synthetic long-doc corpus: invariants hold on a mixed stream
    tokens = [(i * 2654435761) % 12_000 for i in range(5000)]
    batches, skipped = plan_embed_batches(tokens)
    assert skipped == [i for i, t in enumerate(tokens) if t > EMBED_MAX_DOC_TOKENS]
    flat = [i for batch in batches for i in batch]
    assert sorted(flat + skipped) == list(range(len(tokens)))
    assert flat == sorted(flat)  # order-preserving
    for batch in batches:
        assert len(batch) <= EMBED_BATCH_SIZE_LIMIT
        assert sum(tokens[i] for i in batch) <= EMBED_BATCH_TOKEN_LIMIT


def test_embed_batcher_skip_accounting(spark, tmp_path):
    """A doc over the 8192-token limit gets NO embedding row and is
    counted in skip_counter (reference too_long skip, index.py:110-112);
    survivors match the plain featurizer."""
    from codebased_spark.operators.docs import build_docs
    from codebased_spark.operators.semantic import doc_features, doc_features_cached
    from codebased_spark.sources.corpus import CORPUS_SCHEMA

    long_text = " ".join(f"tok{i}" for i in range(8200))  # > 8192 tokens
    rows = [
        ("r1", "small.py", "c" * 40, "python", 'print("alpha beta")'),
        ("r1", "huge.py", "d" * 40, "python", long_text),
        ("r1", "tiny.py", "e" * 40, "python", 'print("gamma")'),
    ]
    docs = build_docs(spark.createDataFrame(rows, CORPUS_SCHEMA), num_blocks=2)
    emb_acc = spark.sparkContext.accumulator(0)
    skip_acc = spark.sparkContext.accumulator(0)
    out = doc_features_cached(
        spark, docs, str(tmp_path / "cache"), counter=emb_acc, skip_counter=skip_acc
    ).collect()
    assert len(out) == 2 and emb_acc.value == 2 and skip_acc.value == 1
    huge_id = {r["path"]: int(r["doc_id"]) for r in docs.collect()}["huge.py"]
    assert huge_id not in {int(r["doc_id"]) for r in out}
    ref = {int(r["doc_id"]): r["embedding"] for r in doc_features(docs).collect()}
    assert {int(r["doc_id"]): r["embedding"] for r in out} == {
        d: e for d, e in ref.items() if d != huge_id
    }


def test_cache_dim_key(spark, tmp_path):
    """Changing ``dim`` must never serve vectors of another width from
    the cache (ADVICE r02): each dim is its own cache partition."""
    from codebased_spark.operators.docs import build_docs
    from codebased_spark.operators.semantic import doc_features_cached
    from codebased_spark.sources.corpus import CORPUS_SCHEMA

    rows = [("r1", "a.py", "c" * 40, "python", 'print("alpha beta gamma")')]
    docs = build_docs(spark.createDataFrame(rows, CORPUS_SCHEMA), num_blocks=2)
    cache = str(tmp_path / "cache")
    a1 = spark.sparkContext.accumulator(0)
    out64 = doc_features_cached(spark, docs, cache, dim=64, counter=a1).collect()
    assert a1.value == 1 and len(out64[0]["embedding"]) == 64
    a2 = spark.sparkContext.accumulator(0)
    out16 = doc_features_cached(spark, docs, cache, dim=16, counter=a2).collect()
    assert a2.value == 1  # different dim -> re-embedded, not served stale
    assert len(out16[0]["embedding"]) == 16
    a3 = spark.sparkContext.accumulator(0)
    doc_features_cached(spark, docs, cache, dim=64, counter=a3).collect()
    assert a3.value == 0  # original dim still fully cached


def test_rerank_contract():
    """Reference search.py:226-232: proposed order wins, unknown ids are
    skipped silently, unproposed results are culled."""
    from codebased_spark.operators.semantic import apply_rerank

    results = [{"doc_id": i, "score": float(10 - i)} for i in range(5)]
    out = apply_rerank(results, [3, 99, 1, 3])
    assert [r["doc_id"] for r in out] == [3, 1]  # 99 skipped, dup ignored, 0/2/4 culled
    assert apply_rerank(results, []) == []
    assert apply_rerank([], [1, 2]) == []


def test_plan_embed_batches_no_empty_batch_when_skip_disabled():
    """ADVICE r03 (semantic.py:77): with the over-length skip disabled
    (max_doc_tokens=None), a first item alone above the 400k token
    limit must not emit an empty leading batch; every batch is
    non-empty and order/coverage are preserved."""
    from codebased_spark.operators.semantic import (
        EMBED_BATCH_TOKEN_LIMIT,
        plan_embed_batches,
    )

    giant = EMBED_BATCH_TOKEN_LIMIT + 1
    b, s = plan_embed_batches([giant, 5, 7], max_doc_tokens=None)
    assert s == []
    assert all(batch for batch in b)  # no empty batches
    assert [i for batch in b for i in batch] == [0, 1, 2]
    assert b[0] == [0]  # the giant rides alone, then the rest batch up

    # two consecutive giants: each alone, still no empties
    b, s = plan_embed_batches([giant, giant], max_doc_tokens=None)
    assert b == [[0], [1]] and s == []
