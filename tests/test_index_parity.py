"""M4: the posting-list index path must be rank-identical to BOTH the
SQLite FTS5 oracle and the brute-force Spark path, on the reference
query set — plus index determinism and resume behavior."""

import glob
import os

import pytest

from codebased_spark.operators.score import search_bruteforce
from codebased_spark.oracle import Fts5Oracle
from codebased_spark.plans.engine import build_index
from codebased_spark.sources.corpus import ALL_FIXTURES, fixture_corpus, gen_corpus
from tests.parity import assert_rank_identical, oracle_hits, spark_hits

QUERIES = [
    "Hello world",
    "Server started",
    "print('print(\"Hello world\");');",
    'hello "world" how are you',
    '"hello world" test "foo bar" baz',
    '"this is a test"',
    "express require",  # cross-column conjunction exercise
    "code hello",       # phrases matching in *different* columns
    "",
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("idx") / "fixtures")
    index = build_index(spark, fixture_corpus(spark), idx_dir, num_blocks=4)
    rows = index.doc_stats.select("doc_id", "path", "name").collect()
    content = {
        (r["repo"], r["path"]): r["content"]
        for r in fixture_corpus(spark).collect()
    }
    full = index.doc_stats.select("doc_id", "repo", "path", "name").collect()
    oracle = Fts5Oracle(
        (r["doc_id"], r["path"], r["name"], content[(r["repo"], r["path"])])
        for r in full
    )
    return index, oracle


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("top_k", [10, 32])
def test_index_rank_identical_to_oracle(built, query, top_k):
    index, oracle = built
    ours = spark_hits(index.search(query, top_k))
    ref = oracle_hits(oracle.search(query, top_k))
    assert_rank_identical(ours, ref, top_k)


@pytest.mark.parametrize("query", ["Hello world", "Server started", "code hello"])
def test_index_matches_bruteforce_exactly(spark, built, query):
    from codebased_spark.operators.docs import build_docs

    index, _ = built
    docs = build_docs(fixture_corpus(spark), num_blocks=4)
    ours = spark_hits(index.search(query, 32))
    brute = spark_hits(search_bruteforce(docs, query, 32, index.n_docs, index.avgdl))
    assert [(d, n, round(s, 12)) for d, n, s in ours] == [
        (d, n, round(s, 12)) for d, n, s in brute
    ]


def test_cross_column_and_matches_sqlite(built):
    """FTS5 row-level AND: phrases may match in different columns
    ('code' in path, 'hello' in content)."""
    index, oracle = built
    ref = oracle.search("code hello", 10)
    assert len(ref) > 0  # the probe is only meaningful if something matches
    ours = spark_hits(index.search("code hello", 10))
    assert_rank_identical(ours, oracle_hits(ref), 10)


def test_index_build_deterministic(spark, tmp_path):
    """Two builds of the same corpus produce byte-identical posting
    shards (SURVEY.md §5.3 item 6)."""
    import hashlib

    def digest(d):
        h = hashlib.sha256()
        files = sorted(glob.glob(os.path.join(d, "postings", "**", "*.parquet"), recursive=True))
        assert files
        rows = (
            spark.read.parquet(os.path.join(d, "postings"))
            .orderBy("pblock", "term", "col")
            .select("pblock", "term", "col", "df", "doc_bytes", "tf_bytes", "pos_bytes")
            .collect()
        )
        for r in rows:
            h.update(repr((r["pblock"], r["term"], r["col"], r["df"])).encode())
            h.update(bytes(r["doc_bytes"]))
            h.update(bytes(r["tf_bytes"]))
            h.update(bytes(r["pos_bytes"]))
        return h.hexdigest(), len(rows)

    corpus = gen_corpus(spark, n_repos=6, files_per_repo=4, seed=11)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, corpus, d1, num_blocks=4)
    build_index(spark, corpus, d2, num_blocks=4)
    assert digest(d1) == digest(d2)


@pytest.mark.parametrize("query", ["Hello world", "Server started", "code hello"])
def test_file_scan_path_matches_df_path(spark, built, query):
    """The pyarrow shard-scan search must equal the generic DataFrame
    scan bit-for-bit."""
    from codebased_spark.operators.query import search_index

    index, _ = built
    assert index.posting_files
    fast = spark_hits(index.search(query, 32))
    generic = spark_hits(
        search_index(index.postings, query, index.n_docs, index.avgdl, 32)
    )
    assert [(d, n, round(s, 12)) for d, n, s in fast] == [
        (d, n, round(s, 12)) for d, n, s in generic
    ]


def test_empty_and_single_doc_corpora(spark, tmp_path):
    """Degenerate corpora must build and search cleanly (posting schema
    is pinned on read, so file-less partition dirs don't break load)."""
    from codebased_spark.sources.corpus import CORPUS_SCHEMA

    e = build_index(spark, spark.createDataFrame([], CORPUS_SCHEMA),
                    str(tmp_path / "e"), num_blocks=2)
    assert e.n_docs == 0
    assert e.search("hello", 5).count() == 0
    assert e.search_batch(["hello"], 5).count() == 0

    s = build_index(
        spark,
        spark.createDataFrame(
            [("r", "a.py", "c" * 40, "python", "X = 1  # hello world")], CORPUS_SCHEMA
        ),
        str(tmp_path / "s"), num_blocks=2,
    )
    assert s.n_docs == 1
    hit = s.search("hello world", 5).collect()
    assert len(hit) == 1 and hit[0]["score"] > 0


def test_batch_search_matches_individual(spark, built):
    """search_batch must be bit-identical per query to search(), and
    tolerate invalid/no-match queries mixed into the batch."""
    index, _ = built
    queries = ["Hello world", "Server started", "code hello", "zz", "nomatchxyz", "",
               '"wor"', '"hel" "wor"']  # single-trigram WAND + shared-phrase mix
    batch = index.search_batch(queries, top_k=10)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(int(r["qid"]), []).append(
            (bool(r["name_match"]), round(float(r["rank"]), 12), int(r["doc_id"]))
        )
    for qi, q in enumerate(queries):
        single = sorted(
            (bool(r["name_match"]), round(float(r["rank"]), 12), int(r["doc_id"]))
            for r in index.search(q, 10).collect()
        )
        assert sorted(by_q.get(qi, [])) == single, q
    assert 3 not in by_q and 4 not in by_q and 5 not in by_q


def test_batch_search_100_queries_flat_plan(spark, built):
    """VERDICT r02 #5: batch width must not grow the plan. 100 queries
    run through the same single flat plan (broadcast idf lookup + one
    scoring expression), in wall-time comparable to a 6-query batch —
    the old shape built 2 unioned branches per query and would spend
    minutes compiling. Results stay bit-identical to search()."""
    import time

    index, _ = built
    words = ["hello", "world", "server", "started", "code", "scan",
             "return", "port", "table", "merge"]
    queries = [f"{words[i % 10]} {words[(i * 3 + 1) % 10]}" for i in range(100)]
    t0 = time.time()
    batch = index.search_batch(queries, top_k=10)
    by_q = {}
    for r in batch.collect():
        by_q.setdefault(int(r["qid"]), []).append(
            (bool(r["name_match"]), round(float(r["rank"]), 12), int(r["doc_id"]))
        )
    took = time.time() - t0
    assert took < 90.0  # flat plan: seconds, not branch-compile minutes
    for qi in range(0, 100, 11):  # sample parity vs single-query search
        single = sorted(
            (bool(r["name_match"]), round(float(r["rank"]), 12), int(r["doc_id"]))
            for r in index.search(queries[qi], 10).collect()
        )
        assert sorted(by_q.get(qi, [])) == single, queries[qi]


def test_multichunk_selective_decode_parity(spark, tmp_path):
    """Blocks with many 128-doc chunks: the chunk-selective membership /
    position reads must give the same scores as the brute-force scan."""
    from codebased_spark.operators.docs import build_docs

    corpus = gen_corpus(spark, n_repos=120, files_per_repo=10, seed=21)  # 1200 files
    idx = build_index(spark, corpus, str(tmp_path / "mc"), num_blocks=2)
    nchunks = max(len(r["skip_last"]) for r in
                  idx.postings.select("skip_last").collect())
    assert nchunks >= 4  # the selective path is actually multi-chunk

    docs = build_docs(corpus, num_blocks=2)
    for q in ["hello world", '"server started on port"', "return scan"]:
        fast = spark_hits(idx.search(q, 32))
        brute = spark_hits(search_bruteforce(docs, q, 32, idx.n_docs, idx.avgdl))
        assert [(d, n, round(s, 12)) for d, n, s in fast] == [
            (d, n, round(s, 12)) for d, n, s in brute
        ], q


def test_fused_build_matches_two_stage(spark):
    """build_postings_fused output is byte-identical to the two-stage
    tokenize -> sort -> encode path."""
    from codebased_spark.operators.build import (
        build_postings,
        build_postings_fused,
        tokenize_docs,
    )
    from codebased_spark.operators.docs import build_docs

    docs = build_docs(fixture_corpus(spark), num_blocks=4).persist()
    try:
        def key(rows):
            return sorted(
                (r["pblock"], r["term"], r["col"], r["df"], bytes(r["doc_bytes"]),
                 bytes(r["tf_bytes"]), bytes(r["pos_bytes"]), bytes(r["dl_bytes"]),
                 tuple(r["skip_last"]), tuple(r["skip_max_tf"]), tuple(r["skip_min_dl"]))
                for r in rows
            )

        fused = key(build_postings_fused(docs).collect())
        staged = key(build_postings(tokenize_docs(docs)).collect())
        assert fused == staged and len(fused) > 0
    finally:
        docs.unpersist()


def test_resume_skips_completed_stages(spark, tmp_path):
    idx_dir = str(tmp_path / "resume")
    corpus = fixture_corpus(spark, ALL_FIXTURES)
    build_index(spark, corpus, idx_dir, num_blocks=4)
    # wipe one stage's manifest -> only that stage re-runs
    os.remove(os.path.join(idx_dir, "_manifest", "corpus_stats.json"))
    idx = build_index(spark, corpus, idx_dir, num_blocks=4, resume=True)
    assert idx.n_docs == len(ALL_FIXTURES)
    assert os.path.exists(os.path.join(idx_dir, "_manifest", "corpus_stats.json"))


def test_resume_rebuilds_stale_format_stages(spark, tmp_path):
    """ADVICE r02: a stage manifest recorded by an OLDER engine format
    is NOT done — resuming over a v1 partial build must re-run the
    stage, or the finished index would mix formats under a current
    version stamp."""
    import json

    idx_dir = str(tmp_path / "resume_v1")
    corpus = fixture_corpus(spark, ALL_FIXTURES)
    build_index(spark, corpus, idx_dir, num_blocks=4)
    # simulate a partial build left by an older engine: postings stage
    # claims done at version 1, and its shards are gone
    man = os.path.join(idx_dir, "_manifest", "postings.json")
    with open(man) as f:
        rec = json.load(f)
    rec["version"] = 1
    with open(man, "w") as f:
        json.dump(rec, f)
    import shutil

    shutil.rmtree(os.path.join(idx_dir, "postings"))
    idx = build_index(spark, corpus, idx_dir, num_blocks=4, resume=True)
    with open(man) as f:
        rec2 = json.load(f)
    from codebased_spark.plans.engine import FORMAT_VERSION

    assert rec2["version"] == FORMAT_VERSION  # stage re-ran
    assert idx.posting_files  # shards exist again
    assert idx.postings.count() > 0


def test_manifest_lineage(spark, tmp_path):
    import json

    idx_dir = str(tmp_path / "lineage")
    build_index(spark, fixture_corpus(spark), idx_dir, num_blocks=4)
    with open(os.path.join(idx_dir, "_manifest", "postings.json")) as f:
        m = json.load(f)
    assert m["stage"] == "postings"
    assert sum(v["rows"] for v in m["per_block"].values()) > 0
    with open(os.path.join(idx_dir, "_manifest", "doc_stats.json")) as f:
        d = json.load(f)
    assert sum(d["docs_per_block"].values()) == len(ALL_FIXTURES)


def test_cogrouped_deletes_match_fast_path(spark, tmp_path):
    """The generic DataFrame scan applies tombstones via a per-pblock
    cogroup (distributed — nothing on the driver); results must equal
    the pyarrow fast path, which reads deletes/pblock=N task-side."""
    from codebased_spark.operators.query import search_index
    from codebased_spark.sources.corpus import CORPUS_SCHEMA
    from codebased_spark.streaming.incremental import incremental_update

    v1 = [
        ("r1", "a.py", "c" * 40, "python", 'print("hello world")'),
        ("r1", "b.py", "c" * 40, "python", 'print("hello again world")'),
        ("r1", "c.md", "c" * 40, "text", "hello hello hello world"),
    ]
    v2 = [v1[0], v1[2]]  # b.py deleted
    idx_dir = str(tmp_path / "cg")
    build_index(spark, spark.createDataFrame(v1, CORPUS_SCHEMA), idx_dir, num_blocks=2)
    index = incremental_update(
        spark, idx_dir, spark.createDataFrame(v2, CORPUS_SCHEMA), full_snapshot=True
    )
    assert index.has_deletes

    fast = spark_hits(index.search("hello world", 32))
    generic = spark_hits(
        search_index(index.postings, "hello world", index.n_docs, index.avgdl, 32,
                     deletes=index.deletes_df())
    )
    assert fast == generic
    live_paths = {r["path"] for r in index.search_with_metadata("hello world", 32).collect()}
    assert "b.py" not in live_paths and live_paths == {"a.py", "c.md"}


def _mk_corpus_rows(n):
    """n docs all containing 'value' with varying tf and dl, plus tie
    groups (identical tf+dl -> identical norms -> doc_id tie-breaks)."""
    rows = []
    for i in range(n):
        reps = 1 + (i % 7)          # tf varies
        pad = "x" * ((i * 13) % 97)  # dl varies
        if i % 11 == 0:
            reps, pad = 3, "y" * 20  # tie group: same tf, same dl
        rows.append(
            ("r1", f"f{i:05d}.txt", "c" * 40, "text",
             ("value " * reps) + pad)
        )
    return rows


@pytest.mark.parametrize("query,top_k", [
    ('"value"', 5),    # single phrase, 3 trigrams -> emission pruning
    ('"val"', 5),      # single trigram, content-only -> Block-Max WAND path
    ('"val"', 32),
    ('"alu"', 7),
])
def test_topk_pruning_stays_exact(spark, tmp_path, query, top_k):
    """The exact-pruning layers (emission top-k + single-trigram WAND)
    must be invisible in results: index path == brute force bit-for-bit
    on a corpus big enough that every block prunes (600 docs >> 2*k,
    multiple skip chunks per posting row, planted norm ties)."""
    from codebased_spark.operators.query import SKIP_EVERY  # noqa: F401
    from codebased_spark.operators.score import search_bruteforce
    from codebased_spark.operators.docs import build_docs, corpus_stats
    from codebased_spark.sources.corpus import CORPUS_SCHEMA

    rows = _mk_corpus_rows(600)
    corpus = spark.createDataFrame(rows, CORPUS_SCHEMA)
    idx_dir = str(tmp_path / f"prune_{top_k}")
    index = build_index(spark, corpus, idx_dir, num_blocks=2)

    docs = build_docs(corpus, num_blocks=2)
    n, avgdl = corpus_stats(docs)
    want = [
        (r["doc_id"], r["name_match"], round(r["score"], 12))
        for r in search_bruteforce(docs, query, top_k, n, avgdl).collect()
    ]
    got = [
        (r["doc_id"], r["name_match"], round(r["score"], 12))
        for r in index.search(query, top_k).collect()
    ]
    assert got == want
    assert len(got) == top_k  # the corpus saturates every k we test


def test_single_trigram_wand_unit(spark):
    """_single_trigram_wand == full-decode ranking on a synthetic row
    with many chunks, adversarial bounds, and norm ties."""
    import numpy as np

    from codebased_spark.functions.codec import encode_posting_chunked
    from codebased_spark.operators.build import _encode_row, POSTING_SCHEMA  # noqa: F401
    from codebased_spark.operators.query import _Row, _norm_np, _single_trigram_wand

    rng = np.random.RandomState(5)
    n = 1000
    doc_ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype("int64")
    tfs = rng.randint(1, 40, size=n).astype("int64")
    tfs[::50] = 39  # ties at the top
    dls = rng.randint(10, 5000, size=n).astype("int64")
    flat_pos = np.concatenate([np.arange(t) for t in tfs]).astype("int64")
    avgdl = 812.5

    row = _encode_row(0, 123, 2, doc_ids, tfs, flat_pos, dls)
    cols = ["pblock", "term", "col", "df",
            "doc_bytes", "tf_bytes", "pos_bytes", "dl_bytes",
            "skip_last", "skip_max_tf", "skip_min_dl",
            "skip_doc_off", "skip_tf_off", "skip_pos_off", "skip_dl_off"]
    rec = dict(zip(cols, row))
    r = _Row(rec)

    for k in (1, 5, 32, 500, 2000):
        kd, kt, kl = _single_trigram_wand(_Row(dict(rec)), k, avgdl)
        norms = _norm_np(tfs, dls, avgdl)
        sel = np.lexsort((doc_ids, -norms))[:k]
        want = np.sort(doc_ids[sel])
        assert (kd == want).all(), k
        idx = np.searchsorted(doc_ids, kd)
        assert (kt == tfs[idx]).all() and (kl == dls[idx]).all()


def test_driver_finish_matches_jvm_tail(spark, built, monkeypatch):
    """The one-job driver-side scoring tail and the JVM fallback plan
    must return identical rows (same doc ids, name_match, and EXACT
    rank/score doubles) — forced by dropping DRIVER_FINISH_MAX to 0."""
    import codebased_spark.operators.query as q

    index, _ = built
    queries = ["Hello world", "Server started", '"wor"', "code hello"]
    fast = {qq: [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
                 for r in index.search(qq, 10).collect()] for qq in queries}
    fast_b = sorted(
        (int(r["qid"]), int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
        for r in index.search_batch(queries, 10).collect()
    )
    index._search_cache.clear()
    monkeypatch.setattr(q, "DRIVER_FINISH_MAX", 0)
    for qq in queries:
        jvm = [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
               for r in index.search(qq, 10).collect()]
        assert jvm == fast[qq], qq
    jvm_b = sorted(
        (int(r["qid"]), int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
        for r in index.search_batch(queries, 10).collect()
    )
    assert jvm_b == fast_b  # batch fallback identical too
    index._search_cache.clear()


def test_pareto_skyband_matches_bruteforce():
    """The sort-filter-skyline sweep returns EXACTLY the brute-force
    k-skyband (docs with < top_k dominators), including tie groups and
    duplicate norm vectors — across sizes, phrase counts, and k."""
    import numpy as np

    from codebased_spark.operators.query import _norm_np, _pareto_survivors

    rng = np.random.RandomState(42)
    for n, p, k in [(50, 2, 3), (200, 3, 5), (500, 2, 10), (300, 4, 1)]:
        tfs = rng.randint(1, 8, size=(n, p)).astype(np.int64)
        tfs[:: 7] = tfs[0]  # duplicate-vector tie groups
        dl = rng.randint(10, 200, size=n).astype(np.int64)
        dl[::7] = dl[0]
        doc_ids = np.arange(n, dtype=np.int64) * 3 + 1
        avgdl = 55.5
        got = _pareto_survivors(tfs, dl, doc_ids, avgdl, k, chunk=64)
        N = np.stack([_norm_np(tfs[:, i], dl, avgdl) for i in range(p)], axis=1)
        ge = (N[None, :, :] >= N[:, None, :]).all(axis=2)
        gt = (N[None, :, :] > N[:, None, :]).any(axis=2)
        idlt = doc_ids[None, :] < doc_ids[:, None]
        dom = ge & (gt | idlt)
        want = dom.sum(axis=1) < k
        assert (got == want).all(), (n, p, k)


def test_pareto_prunes_above_old_cap():
    """VERDICT r02 #4: blocks beyond the old 8,192-survivor cap must
    still prune (the cap is gone) — and quickly, since the kept
    frontier stays near the skyband size."""
    import time

    import numpy as np

    from codebased_spark.operators.query import _pareto_survivors

    rng = np.random.RandomState(7)
    n = 20_000
    tfs = rng.randint(1, 30, size=(n, 2)).astype(np.int64)
    dl = rng.randint(10, 500, size=n).astype(np.int64)
    doc_ids = np.arange(n, dtype=np.int64)
    t0 = time.time()
    keep = _pareto_survivors(tfs, dl, doc_ids, 100.0, 32)
    took = time.time() - t0
    assert keep.sum() < n // 4  # actual pruning happened above the old cap
    assert took < 10.0  # and not via an O(n^2) matrix


@pytest.mark.parametrize("query,top_k", [
    ('"value" "xke"', 3),
    ("table merge", 5),
    ('"aa" "bb"', 5),       # sub-trigram phrases -> empty, no pruning crash
])
def test_multiphrase_pareto_pruning_exact(spark, tmp_path, query, top_k):
    """Multi-phrase emission pruning (Pareto dominance) must be
    invisible: index == brute force on a corpus where both phrases are
    common, tfs are correlated AND anti-correlated, and ties exist."""
    from codebased_spark.operators.docs import build_docs, corpus_stats
    from codebased_spark.operators.score import search_bruteforce
    from codebased_spark.sources.corpus import CORPUS_SCHEMA

    rows = []
    for i in range(400):
        a = 1 + (i % 5)          # "value" tf
        b = 1 + ((i * 7) % 4)    # "xke" tf (anti-correlated pattern)
        if i % 13 == 0:
            a, b = 2, 2          # tie groups
        body = ("value " * a) + ("xke " * b) + ("table merge " * (i % 3)) + "z" * (i % 50)
        rows.append(("r1", f"p{i:04d}.txt", "c" * 40, "text", body))
    corpus = spark.createDataFrame(rows, CORPUS_SCHEMA)
    index = build_index(spark, corpus, str(tmp_path / "mp"), num_blocks=2)

    docs = build_docs(corpus, num_blocks=2)
    n, avgdl = corpus_stats(docs)
    want = [(r["doc_id"], r["name_match"], round(r["score"], 12))
            for r in search_bruteforce(docs, query, top_k, n, avgdl).collect()]
    got = [(r["doc_id"], r["name_match"], round(r["score"], 12))
           for r in index.search(query, top_k).collect()]
    assert got == want


def test_tail_bound_routing(spark, built, monkeypatch):
    """VERDICT r03 #2: the driver-finish decision is made from the
    computable candidate bound, never from a doomed probe collect.

    - bound > DRIVER_FINISH_MAX  -> straight to the JVM tail, ZERO
      calls to _collect_bounded (the old 200k-row collect-then-discard);
    - single-phrase (exact bound <= cap) -> plain collect, also zero
      _collect_bounded calls;
    - multi-phrase under the cap -> the limit-guarded collect runs
      (the skyband is data-dependent, the guard must stay)."""
    import codebased_spark.operators.query as q

    index, _ = built
    # this test pins the DISTRIBUTED tail's routing; a fixture-sized
    # index would otherwise take the zero-job direct path (r5), which
    # never collects at all
    monkeypatch.setattr(index, "driver_direct", False)
    single, multi = '"world"', "code hello"
    want = {qq: [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
                 for r in index.search(qq, 10).collect()]
            for qq in (single, multi)}
    want_b = sorted(
        (int(r["qid"]), int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
        for r in index.search_batch([single, multi], 10).collect()
    )
    assert want[single] and want[multi]

    calls = []
    real = q._collect_bounded
    monkeypatch.setattr(
        q, "_collect_bounded", lambda df, m: calls.append(m) or real(df, m)
    )

    # route 1: bound exceeds the cap -> JVM tail, no probe collect
    index._search_cache.clear()
    monkeypatch.setattr(q, "DRIVER_FINISH_MAX", 0)
    for qq in (single, multi):
        got = [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
               for r in index.search(qq, 10).collect()]
        assert got == want[qq], qq
    got_b = sorted(
        (int(r["qid"]), int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
        for r in index.search_batch([single, multi], 10).collect()
    )
    assert got_b == want_b
    assert calls == []  # the scale-killer: no collect-then-discard

    # route 2: exact single-phrase bound under the cap -> plain collect
    index._search_cache.clear()
    monkeypatch.setattr(q, "DRIVER_FINISH_MAX", 200_000)
    got = [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
           for r in index.search(single, 10).collect()]
    assert got == want[single]
    assert calls == []  # exact bound needs no limit probe either

    # route 3: multi-phrase under the cap -> guarded collect runs
    got = [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
           for r in index.search(multi, 10).collect()]
    assert got == want[multi]
    assert calls == [200_000]
    index._search_cache.clear()


def test_tail_bound_derivation():
    """_tail_bound mirrors the per-block emission guarantees: n_ph
    kind=0 rows + 2*top_k (single-phrase, exact) or 4*top_k heuristic
    (multi-phrase) kind=1 rows, times the block count."""
    from codebased_spark.operators.query import _tail_bound

    assert _tail_bound(100, [1], 32) == (100 * (2 * 32 + 1), True)
    assert _tail_bound(10, [3], 32) == (10 * (4 * 32 + 3), False)
    assert _tail_bound(5, [1, 2], 32) == (
        5 * ((2 * 32 + 1) + (4 * 32 + 2)), False)
    # the gate at scale: 40k blocks of a single-phrase query exceed the
    # 200k cap -> the tail must go straight to the JVM plan
    bound, exact = _tail_bound(40_000, [1], 32)
    assert exact and bound > 200_000


def test_concurrent_searches_one_session(spark, built):
    """VERDICT r03 #6: two query tails racing on one SparkSession must
    not corrupt each other via the scoped limit-conf override (now
    lock-guarded) — results stay deterministic and the session conf is
    restored."""
    import threading

    index, _ = built
    key = "spark.sql.limit.initialNumPartitions"
    before = spark.conf.get(key)
    queries = ["code hello", "hello world how", "Server started", "table aa"]
    want = {}
    for qq in queries:
        want[qq] = [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
                    for r in index.search(qq, 10).collect()]
        index._search_cache.clear()

    errs = []

    def run(qq):
        try:
            for _ in range(3):
                got = [
                    (int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]))
                    for r in index.search(qq, 10).collect()
                ]
                assert got == want[qq], qq
                index._search_cache.clear()
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append((qq, e))

    threads = [threading.Thread(target=run, args=(qq,)) for qq in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert spark.conf.get(key) == before


def test_pareto_skyband_float_sum_tie(monkeypatch):
    """ADVICE r03 (query.py:295): a strict dominator whose float norm
    SUM rounds equal to the dominated doc's — and whose doc_id is
    larger — must still be counted. The sweep order now breaks sum
    ties on the full norm vector before doc_id."""
    import numpy as np

    import codebased_spark.operators.query as q

    # inject exact norms: norm := tf / 2.0
    monkeypatch.setattr(
        q, "_norm_np", lambda tf, dl, avgdl: np.asarray(tf, dtype=np.float64) / 2.0
    )
    big = 2 * 10 ** 16  # -> norm 1e16, where float64 spacing is 2.0
    # doc 1 = (1e16, 0.5); doc 2 = (1e16, 1.0) strictly dominates doc 1,
    # both sums round to exactly 1e16; dominator has the LARGER doc_id
    tfs = np.array([[big, 1], [big, 2]], dtype=np.int64)
    dl = np.array([1, 1], dtype=np.int64)
    doc_ids = np.array([1, 2], dtype=np.int64)
    assert float(1e16 + 0.5) == float(1e16 + 1.0) == 1e16  # the tie is real
    keep = q._pareto_survivors(tfs, dl, doc_ids, 1.0, 1)
    assert list(keep) == [False, True]  # dominated doc dropped: exact 1-skyband
