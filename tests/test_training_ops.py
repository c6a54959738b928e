"""Engine-side unit tests for the training-data operators (dedup,
similarity, text analysis, multimodal plumbing) and physical-plan
checks (pushdown/pruning)."""

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),          # near dup
    (3, "completely different words entirely unrelated text"),
    (4, "spark engine posting lists compressed blocks"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(docs_df):
    from codebased_spark.operators.dedup import exact_duplicates

    groups = {r["digest"]: r for r in exact_duplicates(docs_df).collect()}
    dups = [g for g in groups.values() if g["n_dups"] > 1]
    assert len(dups) == 1 and dups[0]["n_dups"] == 2 and dups[0]["keep_doc_id"] == 0


def test_minhash_and_jaccard_agree(docs_df):
    from codebased_spark.operators.dedup import jaccard_to_probe, minhash_signatures

    sigs = {r["doc_id"]: [r[f"sig{i}"] for i in range(8)]
            for r in minhash_signatures(docs_df).collect()}
    assert sigs[0] == sigs[1]  # identical docs -> identical signatures
    matches_near = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    matches_far = sum(a == b for a, b in zip(sigs[0], sigs[3]))
    assert matches_near > matches_far  # minhash tracks jaccard

    jac = {r["doc_id"]: r["jaccard"] for r in jaccard_to_probe(docs_df, 0).collect()}
    assert jac[0] == 1.0 and jac[1] == 1.0
    assert 0.5 < jac[2] < 1.0 and jac[3] < 0.2


def test_simhash_hamming(docs_df):
    from codebased_spark.operators.dedup import simhash64

    h = {r["doc_id"]: int(r["simhash"]) for r in simhash64(docs_df).collect()}
    assert h[0] == h[1]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[0], h[2]) < ham(h[0], h[3])


def test_lsh_candidate_pairs_finds_dup(docs_df):
    from codebased_spark.operators.dedup import lsh_candidate_pairs

    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs_df).collect()}
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)


def test_cosine_and_ann(spark):
    from codebased_spark.operators.simsearch import ann_topk_lsh, cosine_topk

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((50, 16)).astype("float32")
    vecs[13] = vecs[0] * 2.0  # same direction as probe -> cosine 1.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    top = cosine_topk(emb, probe_vec_id=0, k=3).collect()
    assert top[0]["vec_id"] == 13 and top[0]["cosine"] == pytest.approx(1.0)

    ann = ann_topk_lsh(emb, probe_vec_id=0, k=3, dim=16).collect()
    assert ann and ann[0]["vec_id"] == 13  # same-direction vec shares all hyperplane signs


def test_text_stats(spark, docs_df):
    from codebased_spark.operators.textops import (
        quality_scores,
        token_stats,
        trigram_fingerprint,
    )

    ts = {r["doc_id"]: r for r in token_stats(docs_df).collect()}
    assert ts[0]["n_tokens"] == 9
    empty = spark.createDataFrame([(9, "")], "doc_id long, text string")
    assert token_stats(empty).collect()[0]["n_tokens"] == 0

    q = {r["doc_id"]: r for r in quality_scores(docs_df).collect()}
    assert q[0]["stopword_ratio"] == pytest.approx(round(2 / 9, 6))

    fp = {r["doc_id"]: r["fingerprint"] for r in trigram_fingerprint(docs_df).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]
    assert 0 <= fp[0] < 2305843009213693951


def test_identifier_splitting(spark):
    from codebased_spark.operators.textops import split_identifiers

    df = spark.createDataFrame(
        [
            (0, "parseHTTPRequest build_posting_list kebab-case-name"),
            (1, "XMLHttpRequest2 simpleword"),
        ],
        "doc_id long, text string",
    )
    out = {r["subtoken"]: (r["occurrences"], r["df"])
           for r in split_identifiers(df).collect()}
    assert out["parse"] == (1, 1)
    assert out["http"] == (2, 2)  # parseHTTPRequest + XMLHttpRequest2
    assert out["request"] == (1, 1) and out["request2"] == (1, 1)
    assert out["posting"] == (1, 1) and out["kebab"] == (1, 1)
    assert out["xml"] == (1, 1) and out["simpleword"] == (1, 1)


def test_media_pipeline(spark):
    from codebased_spark.operators.multimodal import (
        audio_windows,
        decode_image_stats,
        gen_media,
        media_features,
        sample_video_frames,
    )
    from codebased_spark.operators.simsearch import cosine_topk

    media = gen_media(spark, 60, seed=5).persist()
    try:
        kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
        assert kinds == {"image", "audio", "video"}

        # determinism across two generations
        a = sorted(map(tuple, gen_media(spark, 10, seed=5).collect()))
        b = sorted(map(tuple, gen_media(spark, 10, seed=5).collect()))
        assert a == b

        stats = decode_image_stats(media).collect()
        assert stats and all(len(r["chan_mean"]) == 3 for r in stats)

        feats = media_features(media)
        rows = feats.collect()
        assert all(len(r["embedding"]) == 64 for r in rows)
        # features are a drop-in embeddings table for similarity search
        top = cosine_topk(feats, probe_vec_id=int(rows[0]["vec_id"]), k=3).collect()
        assert len(top) == 3

        frames = sample_video_frames(media, every_n=2).collect()
        assert frames and all(len(bytes(r["frame_payload"])) > 0 for r in frames)

        wins = audio_windows(media).collect()
        assert wins and all(r["start_sample"] % 4000 == 0 for r in wins)
    finally:
        media.unpersist()


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_posting_scan_pushdown(spark, tmp_path):
    """The posting scan must push the term filter into parquet
    (PushedFilters) and prune to the needed columns (ReadSchema)."""
    from codebased_spark.functions.fts5 import pack_trigram
    from codebased_spark.plans.engine import build_index
    from codebased_spark.sources.corpus import fixture_corpus

    idx = build_index(spark, fixture_corpus(spark), str(tmp_path / "px"), num_blocks=2)
    t = pack_trigram("hel")
    plan = _explain(
        idx.postings.filter(F.col("term") == t).select("term", "df")
    )
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters", 1)[1][:120]
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "pos_bytes" not in read_schema  # column pruning reached the scan


def test_bm25_scoring_is_codegen(spark):
    """The BM25 scoring projection (per-phrase idf * tf-norm over the
    candidate rows) must be pure JVM expressions inside WholeStageCodegen
    — no Python eval nodes in the scoring hot path."""
    from pyspark.sql import functions as F

    cand = spark.createDataFrame(
        [(1, 10, [2, 1]), (2, 20, [1, 1])],
        "doc_id long, dl long, tfs_all array<long>",
    )
    score = F.lit(0.0)
    for i, w in enumerate([1.5, 0.7]):
        tf = F.col("tfs_all")[i].cast("double")
        score = score + F.lit(w) * tf * 2.2 / (
            tf + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl").cast("double") / 15.0)
        )
    scored = cand.select("doc_id", (-score).alias("rank")).orderBy("rank").limit(5)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _explain(scored)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "* Project" in plan  # '*' marks WholeStageCodegen in formatted mode
    assert "EvalPython" not in plan  # neither Batch- nor ArrowEvalPython
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_lsh_recall_and_pair_budget(spark):
    """VERDICT r01: 8x2 banding produced 62% of all-pairs (all-pairs in
    disguise). 16x4 must (a) find every planted near-dup with trigram
    Jaccard >= 0.8, (b) emit a candidate set that is a small fraction of
    all-pairs on a noise-dominated corpus, (c) honor the bucket cap."""
    import itertools
    import random

    from codebased_spark.operators.dedup import (
        lsh_bucket_stats,
        lsh_candidate_pairs,
    )

    rng = random.Random(42)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = ["".join(rng.choice(letters) for _ in range(rng.randint(8, 12)))
             for _ in range(2000)]
    rows = []
    for i in range(120):  # noise docs: 40 distinct random words each
        rows.append((i, " ".join(rng.sample(words, 40))))
    planted = []
    for j in range(5):  # near-dup pairs: one word substituted
        base = rng.sample(words, 40)
        rows.append((200 + 2 * j, " ".join(base)))
        mod = list(base)
        mod[-1] = "swapped"
        rows.append((201 + 2 * j, " ".join(mod)))
        planted.append((200 + 2 * j, 201 + 2 * j))

    def trigrams(s):
        s = s.lower()
        return {s[i:i + 3] for i in range(len(s) - 2)}

    by_id = dict(rows)
    for a, b in planted:  # planted pairs really are >= 0.8 Jaccard
        ta, tb = trigrams(by_id[a]), trigrams(by_id[b])
        assert len(ta & tb) / len(ta | tb) >= 0.8

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(docs).collect()}
    for p in planted:
        assert p in pairs, f"planted near-dup {p} missed"
    n_docs = len(rows)
    all_pairs = n_docs * (n_docs - 1) // 2
    assert len(pairs) <= 0.05 * all_pairs, (len(pairs), all_pairs)

    # ground-truth check the other way: no high-jaccard pair exists
    # outside the candidate set (recall = 1.0 on this corpus)
    ids = sorted(by_id)
    tri = {i: trigrams(by_id[i]) for i in ids}
    for a, b in itertools.combinations(ids, 2):
        j = len(tri[a] & tri[b]) / max(len(tri[a] | tri[b]), 1)
        if j >= 0.8:
            assert (a, b) in pairs, (a, b, j)

    # bucket cap: a degenerate corpus (every doc identical) collapses
    # into single buckets above the cap -> dropped, reported, no blowup
    degen = spark.createDataFrame(
        [(i, "same text everywhere") for i in range(100)], "doc_id long, text string"
    )
    stats = lsh_bucket_stats(degen, max_bucket=64).collect()
    assert any(r["dropped"] and r["size"] == 100 for r in stats)
    assert lsh_candidate_pairs(degen, max_bucket=64).count() == 0
    # ... while a cap above the corpus keeps them
    assert lsh_candidate_pairs(degen, max_bucket=128).count() == 100 * 99 // 2


def test_decode_pixels_uses_real_codec_when_available(monkeypatch):
    """VERDICT r01 'what's wrong #5': the PIL branch must DECODE, not
    raise. Injects a fake PIL via sys.modules (driver-side unit test —
    the lazy import inside _decode_pixels resolves it)."""
    import sys
    import types

    from codebased_spark.operators.multimodal import _decode_pixels, _fake_pixels

    pixels = np.full((4, 5, 3), 7, dtype=np.uint8)

    fake_image_mod = types.SimpleNamespace(open=lambda fp: pixels)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    out = _decode_pixels(b"\x00\x01", 9, 9, 3)
    assert out.shape == (4, 5, 3) and (out == 7).all()  # decoded, not faked

    # grayscale arrays gain a channel axis
    fake_image_mod.open = lambda fp: np.zeros((4, 5), dtype=np.uint8)
    assert _decode_pixels(b"\x00", 9, 9, 3).shape == (4, 5, 1)

    # an unopenable payload falls back to the deterministic fake
    def boom(fp):
        raise OSError("cannot identify image file")
    fake_image_mod.open = boom
    fb = _decode_pixels(b"\x00\x01", 4, 4, 3)
    assert (fb == _fake_pixels(b"\x00\x01", 4, 4, 3)).all()


def test_curate_corpus_reasons_and_report(spark):
    """Curation funnel: first-match reason priority, canonical-doc
    retention, the near-dup LSH stage, and the funnel report."""
    from codebased_spark.operators.curate import curate_corpus, curation_report

    long_text = "word " * 30000  # 150k chars -> too_long
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base),                              # exact dup of 0 -> dropped
        (2, "short"),                           # too_short
        (3, long_text),                         # too_long
        (4, "the quick brown fox jumps NOW something entirely different here"),
        # ^ shares 5-word prefix with 0 -> near_duplicate_prefix
        (5, "!!!! ???? ;;;; @@@@ %%%% ^^^^ &&&& ****"),  # high_punctuation
        (6, "a perfectly ordinary sentence that survives the whole funnel"),
        (7, base + " with a changed tail that minhash still buckets together"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["doc_id"]: (r["keep"], r["drop_reason"])
           for r in curate_corpus(docs).collect()}
    assert got[0] == (True, None)            # canonical copy kept
    assert got[1] == (False, "exact_duplicate")
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "too_long")
    assert got[4] == (False, "near_duplicate_prefix")
    assert got[5] == (False, "high_punctuation")
    assert got[6] == (True, None)
    # doc 7 shares the prefix too -> prefix rule catches it first
    assert got[7] == (False, "near_duplicate_prefix")

    # near-dup stage: make 7 survive the prefix rule by changing a word
    rows2 = [r for r in rows if r[0] != 7] + [
        (7, "the quick brown wolf jumps over the lazy dog again and again")
    ]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    plain = {r["doc_id"]: r["keep"] for r in curate_corpus(docs2).collect()}
    assert plain[7] is True                  # survives deterministic rules
    nd = {r["doc_id"]: (r["keep"], r["drop_reason"])
          for r in curate_corpus(docs2, near_dup=True).collect()}
    assert nd[7] == (False, "near_duplicate_minhash")
    assert nd[0] == (True, None)             # lower doc_id of the pair kept

    rep = {r["outcome"]: r["n"] for r in
           curation_report(curate_corpus(docs)).collect()}
    assert rep["kept"] == 2
    assert sum(rep.values()) == len(rows)


def test_curate_prefix_canon_survives_gated_canon(spark):
    """ADVICE r02: if the min-doc_id member of a prefix group fails a
    length gate, the canon must fall to the lowest SURVIVING member —
    a prefix group must never vanish with no representative."""
    from codebased_spark.operators.curate import curate_corpus

    shared = "alpha beta gamma delta epsilon"
    # doc 0: lowest doc_id in the prefix group but fails the max_chars
    # gate; docs 1 and 2 share the 5-word prefix and pass the gates
    docs = spark.createDataFrame(
        [(0, shared + " " + "x" * 200), (1, shared + " tail one here"),
         (2, shared + " tail two there")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["drop_reason"])
           for r in curate_corpus(docs, max_chars=100).collect()}
    assert got[0] == (False, "too_long")
    # doc 1 is the canon among gate-passers -> kept, doc 2 is the dup
    assert got[1] == (True, None)
    assert got[2] == (False, "near_duplicate_prefix")


def test_duplicate_ngram_spans(spark):
    """Cross-doc duplicate n-grams: exact counts on a constructed
    corpus (shared 3-gram in docs 0/1/2, one doc repeating it twice,
    sub-n docs contribute nothing)."""
    from codebased_spark.operators.trainprep import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "a lazy the quick brown dog"),
            (2, "the quick brown the quick brown"),  # twice in one doc
            (3, "too short"),                         # < 3 tokens of overlap
            (4, "completely different words here now"),
        ],
        "doc_id long, text string",
    )
    got = {r["ngram"]: (r["n_docs"], r["n_occ"])
           for r in duplicate_ngram_spans(docs, n=3, min_docs=2).collect()}
    assert got["the quick brown"] == (3, 4)  # docs 0,1,2; 2 occurrences in doc 2
    assert "quick brown fox" not in got      # only doc 0
    assert all(nd >= 2 for nd, _ in got.values())


def test_ngram_digest_key_mode(spark):
    """VERDICT r03 #5: key='digest' groups/joins on md5(ngram) with the
    text dropped pre-shuffle — counts identical to text mode, keys are
    the md5 hex of the corresponding spans."""
    import hashlib

    from codebased_spark.operators.trainprep import (
        benchmark_contamination,
        duplicate_ngram_spans,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "a lazy the quick brown dog"),
            (2, "the quick brown the quick brown"),
            (3, "too short"),
            (4, "completely different words here now"),
        ],
        "doc_id long, text string",
    )
    text = {r["ngram"]: (r["n_docs"], r["n_occ"])
            for r in duplicate_ngram_spans(docs, n=3, min_docs=2).collect()}
    dig = {r["ngram_md5"]: (r["n_docs"], r["n_occ"])
           for r in duplicate_ngram_spans(
               docs, n=3, min_docs=2, key="digest").collect()}
    assert dig == {
        hashlib.md5(g.encode()).hexdigest(): v for g, v in text.items()
    }

    probe = docs.filter("doc_id = 0")
    want = sorted(map(tuple, benchmark_contamination(docs, probe, n=3).collect()))
    got = sorted(map(tuple, benchmark_contamination(
        docs, probe, n=3, key="digest").collect()))
    assert got == want  # same schema, same values — only shuffle bytes differ

    import pytest as _pytest

    with _pytest.raises(ValueError, match="key must be"):
        duplicate_ngram_spans(docs, key="zstd")


def test_benchmark_contamination_bounds(spark):
    """Contamination is 1.0 for a doc fully inside the probe, 0.0 for
    disjoint text, fractional in between, and 0 for sub-n docs."""
    from codebased_spark.operators.trainprep import benchmark_contamination

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),            # the probe itself
            (1, "alpha beta gamma delta epsilon"),    # 2 grams, 1 hit
            (2, "zeta eta theta iota kappa"),         # disjoint
            (3, "ab"),                                # < n tokens
        ],
        "doc_id long, text string",
    )
    probe = docs.filter("doc_id = 0")
    got = {r["doc_id"]: (r["n_ngrams"], r["n_contaminated"], r["contamination"])
           for r in benchmark_contamination(docs, probe, n=4).collect()}
    assert got[0] == (1, 1, 1.0)
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_pii_scrub_counts_and_order(spark):
    """Emails scrub before IPs before long numbers — an email's digits
    never double-count, and the scrubbed text is fully redacted."""
    from pyspark.sql import functions as F

    from codebased_spark.operators.trainprep import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail a.b+c@test-host.example.org and 10.20.30.40 plus id 1234567890"),
            (1, "no pii here at all"),
            (2, "two mails x@y.io z@w.co one ip 1.2.3.4 nums 999999999 111111111"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["n_longnums"])
           for r in pii_scrub(docs).collect()}
    assert got[0] == (1, 1, 1)
    assert got[1] == (0, 0, 0)
    assert got[2] == (2, 1, 2)
    # the scrubbed text of doc 0 contains no digits or @ at all
    from codebased_spark.operators.trainprep import (
        EMAIL_RE,
        IPV4_RE,
        LONGNUM_RE,
    )

    scrubbed = (
        docs.filter("doc_id = 0")
        .select(F.regexp_replace(F.regexp_replace(F.regexp_replace(
            "text", EMAIL_RE, "[EMAIL]"), IPV4_RE, "[IP]"), LONGNUM_RE, "[NUM]")
            .alias("s"))
        .collect()[0]["s"]
    )
    assert scrubbed == "mail [EMAIL] and [IP] plus id [NUM]"


def test_dataset_split_deterministic_and_proportional(spark):
    """The split is stable across runs and repartitioning, respects
    val_pct within sampling noise, and re-salting draws a different
    assignment."""
    from codebased_spark.operators.trainprep import dataset_split

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs, 10, "v1").collect()}
    b = {r["doc_id"]: r["split"]
         for r in dataset_split(docs.repartition(7), 10, "v1").collect()}
    assert a == b  # partitioning-invariant
    n_val = sum(1 for v in a.values() if v == "val")
    assert 140 <= n_val <= 260  # ~10% of 2000
    c = {r["doc_id"]: r["split"] for r in dataset_split(docs, 10, "v2").collect()}
    assert c != a  # a new salt draws a fresh split


def test_repetition_ratios(spark):
    """Gopher-style duplicate n-gram fractions: exact on constructed
    docs (full repetition, no repetition, degenerate short docs)."""
    from codebased_spark.operators.trainprep import repetition_ratios

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),   # 4 bigrams, 1 distinct
            (1, "all words here are unique"),  # no repeats
            (2, "one"),                        # sub-n
            (3, ""),                           # empty
            (4, "a b a b a b"),                # "a b" x3 + "b a" x2
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["dup2"], r["dup3"], r["dup4"])
           for r in repetition_ratios(docs).collect()}
    assert got[0] == (0.75, round(1 - 1 / 3, 6), 0.5)
    assert got[1] == (0.0, 0.0, 0.0)
    assert got[2] == (0.0, 0.0, 0.0)
    assert got[3] == (0.0, 0.0, 0.0)
    # 4-grams of doc 4: "a b a b", "b a b a", "a b a b" -> 3 total, 2 distinct
    assert got[4] == (0.6, 0.5, round(1 / 3, 6))


def test_short_doc_trigram_set_is_empty(spark):
    """code-review r3: Spark's sequence(1, 0) DESCENDS, which used to
    fabricate a phantom trigram for sub-3-char docs. Short docs must
    have an empty trigram set -> simhash 0, null minhash signatures,
    no LSH bands (hence no pairs), jaccard 0 — matching the SQL
    oracles, which produce no trigram rows for them."""
    from codebased_spark.operators.dedup import (
        jaccard_to_probe,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash64,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, "x"), (3, "a normal length document here"),
         (4, None)],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sh[0] == 0 and sh[1] == 0 and sh[2] == 0 and sh[4] == 0
    assert sh[3] != 0

    sigs = {r["doc_id"]: r["sig0"] for r in minhash_signatures(docs).collect()}
    assert sigs[0] is None and sigs[1] is None and sigs[4] is None
    assert sigs[3] is not None

    # empty/short docs never pair (MinHash undefined on empty sets)
    assert lsh_candidate_pairs(docs).count() == 0

    jac = {r["doc_id"]: r["jaccard"] for r in jaccard_to_probe(docs, 3).collect()}
    assert jac[0] == 0.0 and jac[1] == 0.0 and jac[3] == 1.0


def test_short_doc_textops_trigrams(spark):
    """The same sequence(1,0)-descends guard for textops: sub-3-char
    docs fingerprint to 0 with n_trigrams 0 and contribute no trigram
    df rows (matching the SQL oracles, which join away short docs)."""
    from codebased_spark.operators.textops import (
        trigram_document_frequency,
        trigram_fingerprint,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, "abc")], "doc_id long, text string"
    )
    fp = {r["doc_id"]: (r["fingerprint"], r["n_trigrams"])
          for r in trigram_fingerprint(docs).collect()}
    assert fp[0] == (0, 0) and fp[1] == (0, 0)
    assert fp[2][1] == 1 and fp[2][0] != 0

    tri = {r["trigram"]: r["df"] for r in trigram_document_frequency(docs).collect()}
    assert tri == {"abc": 1}  # no phantom "ab"/"" trigrams from short docs


def test_media_gate_parquet_matches_gen_media(spark):
    """The gate's pyarrow-materialized media table (read by BOTH Spark
    and the DuckDB oracle) must be row-identical to
    gen_media(spark, 200, seed=11) — otherwise the r4 media oracles
    would verify a drifting twin, not the operator's input."""
    import __spark_entry__ as e
    from codebased_spark.operators.multimodal import gen_media

    e._ensure_media_gate_files()
    cols = ["media_id", "kind", "payload", "width", "height",
            "channels", "sample_rate", "n_frames"]
    want = sorted(map(tuple, gen_media(spark, 200, seed=11).select(cols).collect()))
    got = sorted(map(tuple,
                     spark.read.parquet(e._GATE_MEDIA_PATH).select(cols).collect()))
    assert got == want
