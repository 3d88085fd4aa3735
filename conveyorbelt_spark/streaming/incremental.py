"""Structured-Streaming half of the engine (SURVEY.md §2.10, §7 Phase 5).

Reference analogues:
- EventHub consumer per source, checkpoint ≤1/min
  (EventHub/EventHubConsumer.cs:33-108)  → readStream + checkpointLocation
- GracePeriodMinutes late-data allowance (W1,
  MinuteTableShardScheduler.cs:27-32)     → withWatermark
- 1-minute shards / daily indexes (W2)    → F.window / days(ts)
- idempotent re-delivery via deterministic ids (NestBatchPusher.cs:71)
  → manifest-gated batch commits (a replayed foreachBatch epoch is a no-op)

``incremental_index_stream`` turns the batch index builder into a streaming
conveyor: each micro-batch appends delta segments + manifest rows keyed by
batch id; the dictionary is re-derived after (Lucene-style segment model —
df/idf always come from the dictionary aggregation, avgdl from stats.json,
so a query over base+delta segments scores exactly).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..functions.tokenize import tokenize_to_postings, with_doc_id
from ..index.build import (
    BLOCKS_SCHEMA,
    DEFAULT_BLOCK_SIZE,
    DEFAULT_N_BUCKETS,
    DEFAULT_TERM_BUCKETS,
    _bucket_col,
    _doclens_kernel,
    _make_block_builder,
    refresh_dictionary,
)
from ..textutils import BM25_B, BM25_K1


def _committed_runs(spark: SparkSession, man_dir: str) -> set[str]:
    if not os.path.isdir(man_dir):
        return set()
    return {r.run_id for r in spark.read.parquet(man_dir).select("run_id").distinct().collect()}


def index_batch(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    batch_id: int | str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    n_buckets: int = DEFAULT_N_BUCKETS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    refresh_dict: bool = True,
) -> bool:
    """Append one batch of documents as a delta segment. Idempotent: if the
    manifest already has this batch's run_id the call is a no-op (replayed
    foreachBatch epochs after a failure do nothing — the reference's
    advance-offset-after-push ordering). Returns True if work was done."""
    run_id = f"batch_{batch_id}"
    man_dir = os.path.join(out_dir, "manifest")
    if run_id in _committed_runs(spark, man_dir):
        return False

    docs = with_doc_id(docs, url_col).select("doc_id", F.col(text_col).alias("text"))

    # doclens + stats roll forward (exact: agg over the appended table)
    doclens = (
        docs.mapInPandas(_doclens_kernel, schema="doc_id long, dl long")
        .groupBy("doc_id")
        .agg(F.min("dl").alias("dl"))
    )
    dl_dir = os.path.join(out_dir, "doclens")
    doclens.write.mode("append").parquet(dl_dir)
    row = spark.read.parquet(dl_dir).agg(
        F.count("*").alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs, total_tokens = int(row["n"]), int(row["total"] or 0)
    stats_path = os.path.join(out_dir, "stats.json")
    stats = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": total_tokens / n_docs if n_docs else 0.0,
        "k1": k1,
        "b": b,
        "n_buckets": n_buckets,
        "block_size": block_size,
        "n_term_buckets": n_term_buckets,
    }
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            prev = json.load(f)
        for key in ("k1", "b", "n_buckets", "block_size", "n_term_buckets"):
            stats[key] = prev[key]
    os.makedirs(out_dir, exist_ok=True)
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)

    tokens = tokenize_to_postings(docs, "doc_id", "text").withColumn(
        "bucket", _bucket_col(stats["n_buckets"])
    )
    builder = _make_block_builder(stats["block_size"])
    blocks = (
        tokens.repartition("term", "bucket")
        .sortWithinPartitions("term", "bucket", "doc_id")
        .mapInPandas(builder, schema=BLOCKS_SCHEMA)
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(stats["n_term_buckets"])).cast("int"))
        .repartition(stats["n_term_buckets"], "tb")
        .sortWithinPartitions("term", "bucket", "blk")
    )
    seg_dir = os.path.join(out_dir, "segments")
    blocks.write.mode("append").partitionBy("tb").parquet(seg_dir)

    # manifest AFTER segment write (commit ordering) — one snapshot row per
    # bucket tagged with this batch's run_id
    man = (
        spark.read.parquet(seg_dir)
        .groupBy("bucket")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(F.crc32(F.concat_ws("|", "term", "blk", "n", "min_doc", "max_doc"))).alias(
                "checksum"
            ),
        )
        .withColumn("committed_at", F.lit(time.time()).cast("timestamp"))
        .withColumn("run_id", F.lit(run_id))
    )
    man.write.mode("append").parquet(man_dir)
    if refresh_dict:
        refresh_dictionary(spark, out_dir, stats["n_term_buckets"])
    return True


def incremental_index_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    *,
    available_now: bool = True,
    trigger_seconds: int = 30,
    max_files_per_trigger: int = 1,
    **index_kw,
):
    """File-source streaming conveyor: new parquet files under
    ``input_path`` are tokenized and appended as delta segments.
    30 s trigger ↔ the reference's schedule loop (WorkerRole.cs:233-247);
    ``checkpointLocation`` ↔ its 1-min stream checkpoints. Returns the
    StreamingQuery (caller awaits/stops)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(input_path)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        index_batch(spark, batch_df, out_dir, batch_id, **index_kw)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def streaming_minute_metrics(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    grace_minutes: int = 5,
) -> DataFrame:
    """W1+W2+A1 in one streaming op: watermark = GracePeriodMinutes, tumbling
    1-minute window, count/sum/min/max/avg quintet (the InsightMetrics shape
    computed natively instead of ingested pre-aggregated)."""
    return (
        events.withColumn("_ts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_ts", f"{grace_minutes} minutes")
        .groupBy(F.window("_ts", "1 minute").alias("win"), *key_cols)
        .agg(
            F.count("*").alias("count"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("minimum"),
            F.max(value_col).alias("maximum"),
            F.avg(value_col).alias("average"),
        )
        .select(F.col("win.start").alias("minute"), *key_cols, "count", "total", "minimum", "maximum", "average")
    )
