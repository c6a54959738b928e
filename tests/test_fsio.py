"""plans/fsio.IndexFS: the lifecycle IO facade (ADVICE.md r01 — the
round-1 os.walk/os.rename calls silently saw nothing on remote stores).

No HDFS/S3 exists in this sandbox, so the JVM branch is exercised with
``force_jvm=True`` against Hadoop's LocalFileSystem — the same API
surface (org.apache.hadoop.fs.FileSystem) an hdfs:// or s3a:// URI
resolves to, minus the wire protocol."""

import json
import os

import pytest

from codebased_spark.plans.fsio import IndexFS, is_local, local_path


def test_scheme_detection():
    assert is_local("/tmp/x")
    assert is_local("file:///tmp/x")
    assert not is_local("hdfs://nn:9000/idx")
    assert not is_local("s3a://bucket/idx")
    assert local_path("file:///tmp/x") == "/tmp/x"
    assert local_path("/tmp/x") == "/tmp/x"


@pytest.mark.parametrize("force_jvm", [False, True], ids=["posix", "hadoop"])
def test_indexfs_roundtrip(spark, tmp_path, force_jvm):
    base = str(tmp_path / "idx")
    fs = IndexFS(spark, base, force_jvm=force_jvm)

    assert not fs.exists(base)
    assert fs.list_files(base) == []
    assert fs.list_dir(base) == []

    payload = {"stage": "doc_stats", "num_blocks": 4}
    fs.write_json(base + "/_manifest/doc_stats.json", payload)
    assert fs.exists(base + "/_manifest/doc_stats.json")
    assert fs.read_json(base + "/_manifest/doc_stats.json") == payload
    assert fs.list_dir(base + "/_manifest") == ["doc_stats.json"]

    # overwrite must replace, not append
    fs.write_json(base + "/_manifest/doc_stats.json", {"v": 2})
    assert fs.read_json(base + "/_manifest/doc_stats.json") == {"v": 2}

    # nested listing carries sizes
    os.makedirs(os.path.join(base, "postings", "pblock=0"), exist_ok=True)
    with open(os.path.join(base, "postings", "pblock=0", "part-0.parquet"), "wb") as f:
        f.write(b"xx")
    files = fs.list_files(base + "/postings")
    assert len(files) == 1
    path, size = files[0]
    assert path.endswith("pblock=0/part-0.parquet") and size == 2

    fs.rename(base + "/postings", base + "/postings2")
    assert fs.exists(base + "/postings2/pblock=0/part-0.parquet")
    assert not fs.exists(base + "/postings")

    fs.delete(base + "/postings2")
    assert not fs.exists(base + "/postings2")


def test_build_and_search_on_file_uri(spark, tmp_path):
    """A file:// index URI goes through the same engine paths as a plain
    path (scheme stripped for the pyarrow fast path)."""
    from codebased_spark.plans.engine import build_index
    from codebased_spark.sources.corpus import fixture_corpus

    idx_dir = "file://" + str(tmp_path / "uri_idx")
    index = build_index(spark, fixture_corpus(spark), idx_dir, num_blocks=2)
    assert index.posting_files  # fast path available: URIs resolved to local paths
    assert all(os.path.exists(p) for _, p in index.posting_files)
    assert index.search("hello", 10).count() > 0


def test_resume_adopts_manifest_num_blocks(spark, tmp_path):
    """ADVICE.md r01: resuming with a different num_blocks must keep the
    partitioning that the completed doc_stats stage pinned."""
    from codebased_spark.plans.engine import FtsIndex, build_index
    from codebased_spark.sources.corpus import fixture_corpus

    idx_dir = str(tmp_path / "resume_idx")
    corpus = fixture_corpus(spark)
    build_index(spark, corpus, idx_dir, num_blocks=2)
    baseline = {
        (r["repo"], r["path"], int(r["doc_id"]))
        for r in FtsIndex(spark, idx_dir).doc_stats.select(
            "repo", "path", "doc_id").collect()
    }

    # simulate a crash after doc_stats+corpus_stats: postings missing
    os.remove(os.path.join(idx_dir, "_manifest", "postings.json"))
    index = build_index(spark, corpus, idx_dir, num_blocks=16, resume=True)

    # the conflicting num_blocks=16 was ignored in favor of the manifest
    assert index.num_blocks == 2
    rebuilt = {
        (r["repo"], r["path"], int(r["doc_id"]))
        for r in index.doc_stats.select("repo", "path", "doc_id").collect()
    }
    assert rebuilt == baseline  # postings rebuilt under the SAME ids
    assert index.search("hello", 10).count() > 0
