"""Segment compaction (hierarchical merge): many delta segments → dense
blocks, rank-identical before/after, duplicates collapsed."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W  # noqa: N817
from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.corpus import corpus_spark_df, reference_query_set
from conveyorbelt_spark.index.build import compact_segments
from conveyorbelt_spark.index.query import bm25_topk
from conveyorbelt_spark.streaming.incremental import index_batch


@pytest.fixture(scope="module")
def frag_index(spark, tmp_path_factory):
    """5 small delta batches → heavily fragmented segments."""
    out = str(tmp_path_factory.mktemp("frag_idx"))
    for i in range(5):
        docs = corpus_spark_df(spark, 100, seed=42 + i, n_parts=1, part_offset=i)
        index_batch(spark, docs, out, i, n_buckets=8)
    return out


def test_compaction_preserves_results(spark, frag_index):
    queries = [c["q"] for c in reference_query_set()[:6]] + ["term00000 term00123"]
    before = {
        q: [(r.doc_id, r.score) for r in bm25_topk(spark, frag_index, q, 10).collect()]
        for q in queries
    }
    stats = compact_segments(spark, frag_index)
    assert stats["blocks_after"] < stats["blocks_before"]
    after = {
        q: [(r.doc_id, r.score) for r in bm25_topk(spark, frag_index, q, 10).collect()]
        for q in queries
    }
    assert before == after


def test_compaction_merges_group_blocks(spark, frag_index):
    """Post-compaction a (term,bucket) group has dense blocks: every block
    except the last holds exactly block_size postings."""
    seg = spark.read.parquet(f"{frag_index}/segments")
    from conveyorbelt_spark.index.build import load_stats

    bs = load_stats(frag_index)["block_size"]
    bad = (
        seg.withColumn(
            "max_blk", F.max("blk").over(W.partitionBy("term", "bucket")),
        )
        .where((F.col("blk") < F.col("max_blk")) & (F.col("n") != bs))
        .count()
    )
    assert bad == 0


def test_compaction_dedupes_reingested(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dup_idx"))
    docs = corpus_spark_df(spark, 150, seed=7, n_parts=1)
    index_batch(spark, docs, out, 0, n_buckets=8)
    index_batch(spark, docs, out, 1, n_buckets=8)  # full re-ingestion
    seg0 = spark.read.parquet(f"{out}/segments")
    postings_before = seg0.agg(F.sum("n")).collect()[0][0]
    before = [(r.doc_id, r.score) for r in bm25_topk(spark, out, "term00001", 10).collect()]
    compact_segments(spark, out)
    seg = spark.read.parquet(f"{out}/segments")
    # duplicates collapsed: the re-ingested copy vanishes (exactly half)
    assert seg.agg(F.sum("n")).collect()[0][0] * 2 == postings_before
    after = [(r.doc_id, r.score) for r in bm25_topk(spark, out, "term00001", 10).collect()]
    assert [d for d, _ in before] == [d for d, _ in after]
