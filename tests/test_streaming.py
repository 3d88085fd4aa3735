"""Streaming conveyor tests: incremental delta segments rank-identical to a
full build, idempotent batch replay, checkpointed file-source stream,
watermarked windowed metrics (SURVEY §2.10 W1/W2/W5, §7 Phase 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.oracle import BM25Oracle
from conveyorbelt_spark.index.query import bm25_topk
from conveyorbelt_spark.streaming.incremental import (
    incremental_index_stream,
    index_batch,
    streaming_minute_metrics,
)

N_DOCS = 600
QUERIES = ["term00000 term00123", "term00050", "term00001 term05000"]


@pytest.fixture(scope="module")
def corpus_parts(spark, tmp_path_factory):
    """Corpus split into 2 parquet files (2 stream batches)."""
    d = tmp_path_factory.mktemp("stream_in")
    a = corpus_spark_df(spark, N_DOCS // 2, seed=42, n_parts=2)
    b = corpus_spark_df(spark, N_DOCS // 2, seed=43, n_parts=2, part_offset=2)
    a.coalesce(1).write.parquet(str(d / "p1"))
    b.coalesce(1).write.parquet(str(d / "p2"))
    return str(d), a, b


@pytest.fixture(scope="module")
def oracle(spark, corpus_parts):
    _, a, b = corpus_parts
    rows = with_doc_id(a.union(b)).select("doc_id", "text").collect()
    return BM25Oracle([(r.doc_id, r.text) for r in rows])


def test_incremental_matches_oracle(spark, corpus_parts, oracle, tmp_path_factory):
    _, a, b = corpus_parts
    out = str(tmp_path_factory.mktemp("inc_idx"))
    assert index_batch(spark, a, out, 0, n_buckets=8)
    assert index_batch(spark, b, out, 1, n_buckets=8)
    for q in QUERIES:
        got = [(r.doc_id, r.score) for r in bm25_topk(spark, out, q, 10).collect()]
        want = oracle.search(q, 10)
        assert got == want, q


def test_batch_replay_is_noop(spark, corpus_parts, tmp_path_factory):
    _, a, _ = corpus_parts
    out = str(tmp_path_factory.mktemp("replay_idx"))
    assert index_batch(spark, a, out, 0, n_buckets=8) is True
    before = spark.read.parquet(f"{out}/segments").count()
    assert index_batch(spark, a, out, 0, n_buckets=8) is False  # replayed epoch
    assert spark.read.parquet(f"{out}/segments").count() == before


def test_stream_end_to_end(spark, corpus_parts, oracle, tmp_path_factory):
    in_dir, _, _ = corpus_parts
    out = str(tmp_path_factory.mktemp("stream_idx"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    # recursive lookup: the two files sit under p1/ and p2/
    q = incremental_index_stream(
        spark, in_dir + "/*/", out, ckpt, n_buckets=8
    )
    q.awaitTermination(300)
    got = [(r.doc_id, r.score) for r in bm25_topk(spark, out, QUERIES[0], 10).collect()]
    assert got == oracle.search(QUERIES[0], 10)
    # restart with same checkpoint: no new work, index unchanged
    n_before = spark.read.parquet(f"{out}/segments").count()
    q2 = incremental_index_stream(spark, in_dir + "/*/", out, ckpt, n_buckets=8)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/segments").count() == n_before


def test_message_bus_stream_two_batches_idempotent(spark, tmp_path_factory):
    """S7 full shape: an unbounded non-file message stream drives >=2
    micro-batches through the delta indexer; a replayed epoch is a no-op
    (EventHubConsumer.cs:33-108 per-partition parse + checkpoint cadence)."""
    import time as _t

    from conveyorbelt_spark.streaming.incremental import index_stream, message_bus_docs

    out = str(tmp_path_factory.mktemp("bus_idx"))
    ckpt = str(tmp_path_factory.mktemp("bus_ckpt"))
    stream = message_bus_docs(spark, rows_per_batch=200)
    assert stream.isStreaming
    q = index_stream(spark, stream, out, ckpt, trigger_seconds=0, n_buckets=8)
    try:
        deadline = _t.time() + 240
        runs = set()
        while _t.time() < deadline and len(runs) < 2:
            _t.sleep(2)
            import os as _os

            if _os.path.isdir(f"{out}/manifest"):
                try:
                    runs = {
                        r.run_id
                        for r in spark.read.parquet(f"{out}/manifest").select("run_id").collect()
                    }
                except Exception:
                    pass
    finally:
        q.stop()
    assert len(runs) >= 2, f"expected >=2 committed micro-batches, got {runs}"

    # replay of a committed epoch: regenerate batch 0's exact messages
    # (deterministic rate-micro-batch contents) and re-submit → no-op
    from pyspark.sql import functions as F  # noqa: N812

    n_before = spark.read.parquet(f"{out}/segments").count()
    batch0 = (
        spark.createDataFrame([(i,) for i in range(200)], "value long")
        .select(
            F.format_string("https://stream.example/msg/%d", F.col("value")).alias("url"),
            F.concat_ws(
                " ",
                *[
                    F.format_string(
                        "term%05d", F.pmod(F.col("value") * F.lit(p) + F.lit(i), F.lit(7919))
                    )
                    for i, p in enumerate([3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41])
                ],
            ).alias("text"),
        )
    )
    assert index_batch(spark, batch0, out, 0, n_buckets=8) is False
    assert spark.read.parquet(f"{out}/segments").count() == n_before
    # and the indexed stream is queryable
    from conveyorbelt_spark.index.query import bm25_topk

    assert bm25_topk(spark, out, "term00003", 5).count() > 0


def test_kafka_message_adapter(spark, tmp_path_factory):
    """Kafka-shaped messages (exact kafka-source column set) map to the
    input-table shape and index end to end; deterministic offset-based urls
    for keyless messages."""
    import datetime as dt
    import json as _json

    from conveyorbelt_spark.index.query import bm25_topk
    from conveyorbelt_spark.streaming.incremental import (
        KAFKA_MESSAGE_SCHEMA,
        kafka_messages_to_docs,
    )

    ts = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for off in range(40):
        payload = {"url": f"https://k.example/{off}", "text": f"kafka doc term{off % 7}", "lang": "en"}
        rows.append((None, _json.dumps(payload).encode(), "pages", off % 2, off, ts, 0))
    rows.append((None, b"not json at all", "pages", 0, 99, ts, 0))
    msgs = spark.createDataFrame(rows, KAFKA_MESSAGE_SCHEMA)
    docs = kafka_messages_to_docs(msgs)
    got = {r.url: r for r in docs.collect()}
    assert got["https://k.example/3"].text == "kafka doc term3"
    assert got["kafka://pages/0/99"].lang == "und"  # unparseable → fallback id
    assert set(docs.columns) == {"url", "warc_ts", "html", "text", "lang"}

    out = str(tmp_path_factory.mktemp("kafka_idx"))
    assert index_batch(spark, docs, out, 0, n_buckets=8) is True
    assert bm25_topk(spark, out, "term3", 5).count() > 0


def test_streaming_minute_metrics(spark, sf001):
    events = spark.read.parquet(f"{sf001}/events.parquet")
    # batch-mode check of the same op graph first
    batch = streaming_minute_metrics(events).orderBy("minute", "event_type")
    want = (
        events.groupBy(F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("minute"), "event_type")
        .agg(F.count("*").alias("count"))
        .orderBy("minute", "event_type")
    )
    got = [(r.minute, r.event_type, r["count"]) for r in batch.collect()]
    exp = [(r.minute, r.event_type, r["count"]) for r in want.collect()]
    assert got == exp


def test_streaming_minute_metrics_stream_mode(spark, sf001, tmp_path_factory):
    import shutil

    d = tmp_path_factory.mktemp("ev_stream")
    shutil.copy(f"{sf001}/events.parquet", d / "events.parquet")
    events = spark.read.parquet(str(d))
    stream = spark.readStream.schema(events.schema).parquet(str(d))
    out = streaming_minute_metrics(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("mm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only windows closed by the watermark — with a single
    # batch nothing may close; assert the query ran without error
    assert q.lastProgress is not None
    spark.sql("DROP TABLE IF EXISTS mm_test")
