"""Gap sessionization: batch (oracle-able window algebra) vs streaming
(applyInPandasWithState) must implement the same session semantics."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(eid, minute, user, value=1.0, second=0):
    return (eid, dt.datetime(2024, 1, 1, minute // 60, minute % 60, second),
            user, "click", value, "{}")


ROWS = [
    # user 1: two sessions split by a 45-min gap
    _ev(0, 0, 1), _ev(1, 5, 1, 2.5), _ev(2, 20, 1),
    _ev(3, 65, 1, 4.0), _ev(4, 80, 1),
    # user 2: one session, events arriving with exact-gap boundary
    _ev(5, 10, 2), _ev(6, 40, 2),          # exactly 30min -> SAME session
    _ev(7, 71, 2),                          # 31min -> new session
    # user 3: single event
    _ev(8, 0, 3, 9.9),
    # tie timestamps break by event_id
    _ev(9, 90, 1, 1.0, second=0), _ev(10, 90, 1, 2.0, second=0),
]


def _batch_sessions(spark):
    from codebased_spark.streaming.sessionize import sessionize_batch

    df = spark.createDataFrame(ROWS, EVENTS_SCHEMA)
    return {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], round(r["sum_value"], 6))
        for r in sessionize_batch(df, gap_minutes=30).collect()
    }


def test_batch_sessionize_semantics(spark):
    got = _batch_sessions(spark)
    # user 1: sessions [0,20], [65,90] (90-tie events join the 80 one: 10min gaps)
    assert got[(1, "2024-01-01 00:00:00")] == ("2024-01-01 00:20:00", 3, 4.5)
    assert got[(1, "2024-01-01 01:05:00")] == ("2024-01-01 01:30:00", 4, 8.0)
    # user 2: exact 30-min gap does NOT split (strictly-greater rule)
    assert got[(2, "2024-01-01 00:10:00")] == ("2024-01-01 00:40:00", 2, 2.0)
    assert got[(2, "2024-01-01 01:11:00")] == ("2024-01-01 01:11:00", 1, 1.0)
    assert got[(3, "2024-01-01 00:00:00")] == ("2024-01-01 00:00:00", 1, 9.9)


def test_stream_matches_batch_closed_sessions(spark, tmp_path):
    """Feed the same events through the stateful streaming sessionizer
    in two micro-batches; every session the batch form closes before
    the final open one must be emitted, identically."""
    from codebased_spark.streaming.sessionize import sessionize_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    first = [r for r in ROWS if r[0] <= 5]
    second = [r for r in ROWS if r[0] > 5]
    spark.createDataFrame(first, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(second, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = _batch_sessions(spark)
    # the stream emits exactly the batch sessions that a LATER event
    # closed; per-user tail sessions stay open in state
    open_tails = {
        (1, "2024-01-01 01:05:00"),  # user 1's last session
        (2, "2024-01-01 01:11:00"),
        (3, "2024-01-01 00:00:00"),
    }
    assert set(streamed) == set(batch) - open_tails
    for k, v in streamed.items():
        assert v == batch[k], k


def test_cosine_pairs_lsh_recall(spark):
    """cosine_pairs_lsh: every emitted pair is exact (subset of the
    exact operator's output) and recall on planted near-dups is
    perfect at high thresholds."""
    import numpy as np

    from codebased_spark.operators.simsearch import (
        cosine_pairs_exact,
        cosine_pairs_lsh,
    )

    rng = np.random.RandomState(11)
    base = rng.standard_normal((40, 32)).astype("float32")
    vecs = list(base)
    planted = []
    for j in range(5):  # near-dup: tiny perturbation -> cosine ~0.999
        v = base[j] + rng.standard_normal(32).astype("float32") * 0.02
        planted.append((j, 40 + j))
        vecs.append(v.astype("float32"))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    exact = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in cosine_pairs_exact(emb, 0.9).collect()}
    lsh = {(r["vec_a"], r["vec_b"]): r["cosine"]
           for r in cosine_pairs_lsh(emb, 0.9, dim=32).collect()}
    assert set(planted) <= set(exact)
    assert set(lsh) <= set(exact)          # no false positives, same values
    for k in lsh:
        assert lsh[k] == exact[k]
    assert set(planted) <= set(lsh)        # planted near-dups all recalled


def test_ivf_index_recall_and_pruning(spark, tmp_path):
    """IVF: nprobe == n_lists is EXACTLY brute force; on clustered data
    nprobe=1 finds the in-cluster neighbors; builds are deterministic;
    the probe scan partition-prunes on list_id."""
    import contextlib
    import io

    import numpy as np

    from codebased_spark.operators.ivf import build_ivf_index, ivf_topk
    from codebased_spark.operators.simsearch import cosine_topk

    rng = np.random.RandomState(21)
    centers = rng.standard_normal((5, 24)) * 10.0
    vecs = []
    for i in range(150):
        vecs.append(centers[i % 5] + rng.standard_normal(24))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf")
    c1 = build_ivf_index(emb, idx, n_lists=5, iters=3)
    c2 = build_ivf_index(emb, str(tmp_path / "ivf2"), n_lists=5, iters=3)
    assert (c1 == c2).all()  # deterministic fit

    probe = 7
    exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, probe, 10).collect()]
    full = [(r["vec_id"], r["cosine"])
            for r in ivf_topk(spark, idx, probe, 10, nprobe=5).collect()]
    assert full == exact  # nprobe = n_lists degrades to exact search

    one = [(r["vec_id"], r["cosine"])
           for r in ivf_topk(spark, idx, probe, 10, nprobe=1).collect()]
    # well-separated clusters: the probe's own list holds the true top-k
    assert one == exact

    plan_df = ivf_topk(spark, idx, probe, 10, nprobe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:160]
    assert "list_id" in seg  # the nprobe filter prunes list partitions


def test_watermark_drops_late_events(spark, tmp_path):
    """Structured Streaming watermark semantics: append-mode windows
    emit once the watermark passes their end, and an event arriving
    beyond the lateness allowance for a closed window is dropped —
    while the same frame aggregated in batch mode counts it."""
    import datetime as dt2

    from codebased_spark.streaming.windows import windowed_event_counts

    def ev(eid, hour, minute, value=1.0):
        return (eid, dt2.datetime(2024, 1, 1, hour, minute), 1, "click", value, "{}")

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(in_dir)

    batch1 = [ev(0, 0, 10), ev(1, 0, 40), ev(2, 1, 10), ev(3, 3, 50)]
    # late arrival for window [0:00,1:00) — watermark after batch1 is
    # 3:50 - 2h = 1:50 > 1:00, so that window is closed: DROPPED
    batch2 = [ev(4, 0, 20, 7.0), ev(5, 5, 0)]

    spark.createDataFrame(batch1, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)
    q = (
        windowed_event_counts(stream, "1 hour", "2 hours")
        .writeStream.outputMode("append")
        .format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(batch2, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        str(r["window_start"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # the 0:00 window was emitted with batch1's two events only; the
    # late ev(4) never appears anywhere in the stream output
    assert streamed["2024-01-01 00:00:00"] == (2, 2.0)
    total_streamed = sum(n for n, _ in streamed.values())
    assert total_streamed <= 4  # ev(4) dropped; open tail windows unemitted

    # batch mode over the full frame COUNTS the late event (watermark
    # is stream-only semantics)
    full = spark.createDataFrame(batch1 + batch2, EVENTS_SCHEMA)
    batch = {
        str(r["window_start"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(full, "1 hour", None).collect()
    }
    assert batch["2024-01-01 00:00:00"] == (3, 9.0)


def test_stream_dedup_exact_with_state_expiry(spark, tmp_path):
    """Streaming exact dedup: first arrival of a digest is emitted,
    re-arrivals within the watermark horizon are dropped, and after the
    watermark evicts the digest's state the same content is admitted
    again (bounded-state dedup within a freshness window)."""
    import datetime as dt2

    from codebased_spark.streaming.dedupe import dedup_exact_stream

    SCHEMA = "doc_id long, ts timestamp, text string"

    def doc(i, hour, minute, text):
        return (i, dt2.datetime(2024, 1, 1, hour, minute), text)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(in_dir)

    b1 = [doc(0, 1, 0, "same content"), doc(1, 1, 10, "other content")]
    # dup within the 30-minute horizon -> dropped; a far-future doc
    # advances the watermark past the digest's expiry
    b2 = [doc(2, 1, 20, "same content"), doc(3, 5, 0, "third content")]
    # state for "same content" evicted -> re-admitted
    b3 = [doc(4, 5, 10, "same content")]

    spark.createDataFrame(b1, SCHEMA).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        dedup_exact_stream(stream, ts_col="ts", delay="30 minutes")
        .writeStream.outputMode("append")
        .format("parquet").option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, SCHEMA).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        spark.createDataFrame(b3, SCHEMA).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    out = sorted(int(r["doc_id"]) for r in spark.read.parquet(out_dir).collect())
    assert 0 in out and 1 in out and 3 in out   # first arrivals emitted
    assert 2 not in out                          # dup within horizon dropped
    assert 4 in out                              # re-admitted after eviction
