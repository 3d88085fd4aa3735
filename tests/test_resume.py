"""Checkpoint-resume: kill after commit group i, re-run, identical index
(SURVEY §5: "kill after partition i, re-run, identical segments";
reference analogue: LastOffsetPoint advanced only post-push,
MinuteTableShardScheduler.cs:44)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.index.build import build_index

N_DOCS = 400


def _segment_fingerprint(spark, out_dir):
    seg = spark.read.parquet(f"{out_dir}/segments")
    rows = seg.select(
        "term", "bucket", "blk", "n", "min_doc", "max_doc",
        F.crc32("docs").alias("cd"), F.crc32("tfs").alias("ct"), F.crc32("dls").alias("cl"),
    ).collect()
    return sorted(tuple(r) for r in rows)


@pytest.fixture(scope="module")
def docs(spark):
    return corpus_spark_df(spark, N_DOCS, seed=7, n_parts=2)


def test_resume_identical(spark, docs, tmp_path_factory):
    full = str(tmp_path_factory.mktemp("full"))
    build_index(spark, docs, full, n_buckets=8, commit_groups=1)
    want = _segment_fingerprint(spark, full)

    # interrupted build: only the first of 4 commit groups lands
    part = str(tmp_path_factory.mktemp("part"))

    class Boom(RuntimeError):
        pass

    calls = {"n": 0}
    import conveyorbelt_spark.index.build as B

    orig = B.tokenize_to_postings

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 1:  # let group 1 finish, die before group 2
            raise Boom()
        return orig(*a, **kw)

    B.tokenize_to_postings = flaky
    try:
        with pytest.raises(Boom):
            build_index(spark, docs, part, n_buckets=8, commit_groups=4)
    finally:
        B.tokenize_to_postings = orig

    done = {r.bucket for r in spark.read.parquet(f"{part}/manifest").collect()}
    assert 0 < len(done) < 8  # partial manifest committed

    # resume: skips committed buckets, completes the rest
    build_index(spark, docs, part, n_buckets=8, commit_groups=4, resume=True)
    assert _segment_fingerprint(spark, part) == want
    done = {r.bucket for r in spark.read.parquet(f"{part}/manifest").collect()}
    assert done == set(range(8))


def test_manifest_counts(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("man"))
    build_index(spark, docs, out, n_buckets=8)
    man = spark.read.parquet(f"{out}/manifest")
    total_postings = man.agg(F.sum("n_postings")).collect()[0][0]
    seg_postings = spark.read.parquet(f"{out}/segments").agg(F.sum("n")).collect()[0][0]
    assert total_postings == seg_postings
