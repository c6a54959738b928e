

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
