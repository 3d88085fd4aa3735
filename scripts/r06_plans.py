"""Capture .explain('formatted') evidence for the round-6 build-pipeline
changes into plans/r06/. The index gates return tiny driver-built frames, so
the meaningful plans are the internal build pipelines; 'before' is produced
by running the SAME code with the round-5 parameters (n_term_buckets=64,
reorg exchange forced via CB_REORG_MIN_DOCS=0 semantics)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.functions.tokenize import tokenize_to_postings
from conveyorbelt_spark.index.build import (
    _bucket_col,
    _make_block_builder,
    BLOCKS_SCHEMA,
)
from conveyorbelt_spark.session import get_spark

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write(name: str, text: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        f.write(text)
    print("wrote", name)


def blocks_df(docs, n_buckets: int, n_term_buckets: int, reorg: bool):
    builder = _make_block_builder(128)
    tokens = tokenize_to_postings(docs, "doc_id", "text").withColumn(
        "bucket", _bucket_col(n_buckets)
    )
    blocks = (
        tokens.repartition("term", "bucket")
        .sortWithinPartitions("term", "bucket", "doc_id", "tf", "dl")
        .mapInPandas(builder, schema=BLOCKS_SCHEMA)
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int"))
        .withColumn("run", F.lit("full-g0"))
    )
    if reorg:
        blocks = blocks.repartition(n_term_buckets, "tb").sortWithinPartitions(
            "term", "bucket", "blk"
        )
    return blocks


def main() -> None:
    spark = get_spark("r06_plans", master="local[8]", shuffle_partitions=32)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )

    # segments pipeline: r05 shape (tb=64 + reorg exchange) vs r06 shape
    # (adaptive tb=8 for 5k docs, reorg exchange removed below threshold)
    write(
        "index_build_segments_before.txt",
        cap(blocks_df(docs, 8, 64, reorg=True)),
    )
    write(
        "index_build_segments_after.txt",
        cap(blocks_df(docs, 8, 8, reorg=False)),
    )

    # manifest commit: r05 shape = per-bucket agg -> full_outer join vs tiny
    # doc_stats -> parquet write (plan captured up to the write); r06 shape
    # = ONE per-bucket aggregation that is collect()ed, commit is a driver-
    # side pyarrow append (no Spark plan at all — the agg plan is shown).
    import tempfile, shutil

    from conveyorbelt_spark.index.build import build_index, KEYWORD_SEP

    idx = tempfile.mkdtemp(prefix="r06_plans_idx_")
    try:
        build_index(spark, docs, idx, url_col=None, n_buckets=8)
        delta = spark.read.parquet(os.path.join(idx, "segments"))
        blk_old = delta.groupBy("bucket").agg(
            F.countDistinct("term").alias("n_terms"),
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(
                F.crc32(F.concat_ws("|", "term", "blk", "n", "min_doc", "max_doc"))
            ).alias("checksum"),
        )
        sum_dl = (
            delta.where(~F.col("term").contains(KEYWORD_SEP))
            .groupBy("bucket")
            .agg(F.sum("sum_tf").alias("sum_dl"))
        )
        doc_stats = spark.createDataFrame(
            [(b, 0, 0) for b in range(8)], "bucket int, n_docs long, sum_dl long"
        ).drop("sum_dl").join(sum_dl, "bucket", "left").na.fill({"sum_dl": 0})
        man_old = blk_old.join(doc_stats, "bucket", "full_outer")
        write("index_build_manifest_before.txt", cap(man_old))

        blk_new = delta.groupBy("bucket").agg(
            F.countDistinct("term").alias("n_terms"),
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(
                F.crc32(F.concat_ws("|", "term", "blk", "n", "min_doc", "max_doc"))
            ).alias("checksum"),
            F.sum(
                F.when(~F.col("term").contains(KEYWORD_SEP), F.col("sum_tf")).otherwise(
                    F.lit(0)
                )
            ).alias("sum_dl"),
        )
        write("index_build_manifest_after.txt", cap(blk_new))

        # term_index derivation: r05 = repartitionByRange over the FULL
        # segment-agg lineage (note the repeated Scan+HashAggregate subtree
        # that also ran a third time for the sampling pass) vs r06 = a
        # coalesced read of the just-written dictionary parquet
        dictionary = delta.groupBy("term", "tb").agg(
            F.sum("n").alias("df"),
            F.sum("sum_tf").alias("cf"),
            F.count("*").alias("n_blocks"),
        )
        ti_old = (
            dictionary.select("term", "df", "cf")
            .withColumn("run", F.lit("full"))
            .repartitionByRange(8, "term")
            .sortWithinPartitions("term")
        )
        write("index_build_term_index_before.txt", cap(ti_old))
        dict_read = spark.read.parquet(os.path.join(idx, "dictionary")).drop("run")
        ti_new = (
            dict_read.select("term", "df", "cf")
            .withColumn("run", F.lit("full"))
            .coalesce(1)
            .sortWithinPartitions("term")
        )
        write("index_build_term_index_after.txt", cap(ti_new))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
