"""Zero-job driver-direct read-through (operators/query.py r5): for
small (embedded-regime, single-repo-sized) indexes FtsIndex routes
search/search_batch through a driver-side pyarrow scan — same reads,
same block machinery, same scoring pipeline, NO Spark job. Results
must be bit-identical to the distributed path in every shape (covered,
uncovered, tombstones, batch, empty), routing must obey the byte gate
and the env override, and the path must genuinely never launch the
distributed scan."""

import os

import pytest

from codebased_spark.operators.phrasedf import build_phrase_df
from codebased_spark.plans.engine import FtsIndex, build_index
from codebased_spark.sources.corpus import fixture_corpus

QUERIES = [
    "hello world",
    '"hello world" world',
    "server started",
    "index.js",
    "zqxjkw notthere",   # no hits
    "ab",                # sub-trigram -> empty, no reads
    "print hello",
]


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("dd") / "idx")
    build_index(spark, fixture_corpus(spark), idx_dir, num_blocks=4)
    direct = FtsIndex(spark, idx_dir)
    os.environ["SPARK_GRAFT_DRIVER_DIRECT"] = "0"
    try:
        dist = FtsIndex(spark, idx_dir)
    finally:
        os.environ.pop("SPARK_GRAFT_DRIVER_DIRECT")
    return direct, dist, idx_dir


def _hits(df):
    return [(int(r["doc_id"]), bool(r["name_match"]), float(r["rank"]),
             float(r["score"])) for r in df.collect()]


def test_routing_flags(spark, pair):
    direct, dist, idx_dir = pair
    assert direct.postings_bytes > 0
    assert direct.driver_direct          # tiny index -> auto-on
    assert not dist.driver_direct        # env force-off respected
    os.environ["SPARK_GRAFT_DRIVER_DIRECT"] = "1"
    try:
        assert FtsIndex(spark, idx_dir).driver_direct
    finally:
        os.environ.pop("SPARK_GRAFT_DRIVER_DIRECT")
    # the byte gate: a store "bigger" than the ceiling routes distributed
    import codebased_spark.operators.query as q

    big = FtsIndex(spark, idx_dir)
    big.postings_bytes = q.DRIVER_DIRECT_MAX_BYTES + 1
    # gate is evaluated at load; re-derive as __init__ would
    assert not (0 < big.postings_bytes <= q.DRIVER_DIRECT_MAX_BYTES)


def test_direct_bit_identical_single_and_batch(spark, pair):
    direct, dist, _ = pair
    for qq in QUERIES:
        assert _hits(direct.search(qq, 10)) == _hits(dist.search(qq, 10)), qq
    got = sorted(tuple(r) for r in direct.search_batch(QUERIES, 10).collect())
    want = sorted(tuple(r) for r in dist.search_batch(QUERIES, 10).collect())
    assert got == want
    # schemas agree exactly (the gate hashes sorted columns + dtypes)
    assert direct.search("hello world", 5).schema \
        == dist.search("hello world", 5).schema
    assert direct.search_batch(["hello world"], 5).schema \
        == dist.search_batch(["hello world"], 5).schema


def test_direct_covered_and_tombstones(spark, tmp_path):
    """Direct path composes with the phrase-df covered fast path and
    with task-side tombstones — identical to distributed in both."""
    from codebased_spark.sources.corpus import CORPUS_SCHEMA
    from codebased_spark.streaming.incremental import incremental_update

    v1 = [
        ("r1", "a.py", "c" * 40, "python", 'print("hello world")'),
        ("r1", "b.py", "c" * 40, "python", 'print("hello world twice")'),
        ("r1", "c.md", "c" * 40, "text", "hello hello world hello world"),
    ]
    idx_dir = str(tmp_path / "ddt")
    index = build_index(
        spark, spark.createDataFrame(v1, CORPUS_SCHEMA), idx_dir, num_blocks=2)
    index = incremental_update(  # tombstone b.py
        spark, idx_dir, spark.createDataFrame([v1[0], v1[2]], CORPUS_SCHEMA),
        full_snapshot=True)
    build_phrase_df(spark, index, ["hello world", "hello", "zqxjkw"])

    direct = FtsIndex(spark, idx_dir)
    assert direct.driver_direct
    os.environ["SPARK_GRAFT_DRIVER_DIRECT"] = "0"
    try:
        dist = FtsIndex(spark, idx_dir)
    finally:
        os.environ.pop("SPARK_GRAFT_DRIVER_DIRECT")
    for qq in ['"hello world"', '"hello world" hello', "hello",
               '"hello world" zqxjkw']:
        assert direct._covering_dfs(qq) is not None, qq
        assert _hits(direct.search(qq, 10)) == _hits(dist.search(qq, 10)), qq
    # covered df-0 AND-fail: empty with no reads on either path
    assert _hits(direct.search('"hello world" zqxjkw', 10)) == []


def test_direct_truly_runs_no_spark_scan(spark, pair, monkeypatch):
    """The direct path must never touch the distributed scan: poison
    _scan_df (the range-sourced mapInPandas feeder) and the legacy
    _files_df — direct searches still answer, and the same searches on
    the distributed handle now fail."""
    import codebased_spark.operators.query as q

    direct, dist, _ = pair

    def boom(*_a, **_k):
        raise AssertionError("distributed scan launched")

    monkeypatch.setattr(q, "_files_df", boom)
    monkeypatch.setattr(q, "_scan_df", boom)
    direct._search_cache.clear()
    assert _hits(direct.search("hello world", 5)) is not None
    assert direct.search_batch(["hello world", "server started"], 5).count() >= 0
    dist._search_cache.clear()
    with pytest.raises(Exception):
        dist.search("hello world", 5)
