"""Pure-Python xxh64 must match Spark's F.xxhash64 bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.functions.hashing import doc_id_of, spark_xxhash64, term_bucket


def test_matches_spark(spark):
    vals = [
        "", "a", "abc", "term00000", "hello world",
        "https://site1.example/abc/page1", "x" * 7, "y" * 8, "z" * 31,
        "w" * 32, "q" * 100, "unicode: żółć 中文 🎉",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r.s: r.h for r in df.collect()}
    for v in vals:
        assert spark_xxhash64(v) == got[v], v


def test_doc_id_and_bucket_twins(spark):
    urls = [f"https://site{i}.example/p{i}" for i in range(20)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url",
        F.shiftrightunsigned(F.xxhash64("url"), 1).alias("doc_id"),
        F.pmod(F.xxhash64("url"), F.lit(64)).alias("tb"),
    )
    for r in df.collect():
        assert doc_id_of(r.url) == r.doc_id
        assert term_bucket(r.url, 64) == r.tb
