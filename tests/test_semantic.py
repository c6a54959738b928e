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


def test_rerank_contract():
    """Reference search.py:226-232: proposed order wins, unknown ids are
    skipped silently, unproposed results are culled."""
    from codebased_spark.operators.semantic import apply_rerank

    results = [{"doc_id": i, "score": float(10 - i)} for i in range(5)]
    out = apply_rerank(results, [3, 99, 1, 3])
    assert [r["doc_id"] for r in out] == [3, 1]  # 99 skipped, dup ignored, 0/2/4 culled
    assert apply_rerank(results, []) == []
    assert apply_rerank([], [1, 2]) == []
