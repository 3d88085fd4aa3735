"""S4/S6 incremental file listing + J4 MUST_NOT exclusion."""

from __future__ import annotations

import os
import time

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.query import bm25_topk, posting_docs
from conveyorbelt_spark.sources.filescan import FileBatch, list_new_files, read_files
from conveyorbelt_spark.sources.planner import FileOffset


def test_list_new_files_incremental(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("scan")
    (d / "i1").mkdir()
    (d / "i2").mkdir()
    corpus_spark_df(spark, 20, seed=1).coalesce(1).write.parquet(str(d / "i1" / "a"))
    corpus_spark_df(spark, 20, seed=2).coalesce(1).write.parquet(str(d / "i2" / "b"))

    def files_under(sub):
        return [
            os.path.join(str(d / sub), x, f)
            for x in os.listdir(d / sub)
            for f in os.listdir(d / sub / x)
            if f.endswith(".parquet")
        ]

    # flatten: list parquet part-files per instance dir
    batch = FileBatch([], None)
    b1 = list_new_files(str(d / "i1" / "a"), None)
    assert len(b1.files) == 1 and b1.new_offset is not None
    # nothing new on re-list from the advanced offset (F6 freshness)
    b2 = list_new_files(str(d / "i1" / "a"), b1.new_offset)
    assert b2.files == []
    # a newer file appears
    time.sleep(0.05)
    corpus_spark_df(spark, 10, seed=3, part_offset=5).coalesce(1).write.mode(
        "append"
    ).parquet(str(d / "i1" / "a"))
    b3 = list_new_files(str(d / "i1" / "a"), b1.new_offset)
    assert len(b3.files) >= 1
    # lineage column present on read
    df = read_files(spark, b3)
    assert "_source_file" in df.columns and df.count() == 10


def test_file_offset_in_scan_roundtrip(tmp_path):
    f = tmp_path / "x.parquet"
    f.write_bytes(b"")
    b = list_new_files(str(tmp_path), None)
    rendered = b.new_offset.render()
    parsed = FileOffset.parse(rendered)
    assert parsed.file_name.endswith("x.parquet")


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mn_idx"))
    docs = corpus_spark_df(spark, 500, seed=42, n_parts=2)
    build_index(spark, docs, out, n_buckets=8)
    return out


def test_must_not_excludes(spark, small_index):
    # k larger than any df so results are complete candidate sets
    cand = {r.doc_id for r in posting_docs(spark, small_index, "term00050").collect()}
    excl = {r.doc_id for r in posting_docs(spark, small_index, "term00400").collect()}
    got = {
        r.doc_id
        for r in bm25_topk(spark, small_index, "term00050", 1000, must_not="term00400").collect()
    }
    assert got == cand - excl and got
    # absent must_not term excludes nothing
    base = {r.doc_id for r in bm25_topk(spark, small_index, "term00050", 1000).collect()}
    same = {
        r.doc_id
        for r in bm25_topk(spark, small_index, "term00050", 1000, must_not="zzzmissing").collect()
    }
    assert same == base == cand
