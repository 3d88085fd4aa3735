"""Corpus input adapter (Iceberg-table / parquet dispatch + schema contract).

The Iceberg path is exercised through ``spark.read.table`` against a
registered view — the exact call a configured Iceberg catalog serves; the
runtime jar is a deployment concern, not an engine code path (see
sources/tables.py for the deployment guidance)."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.sources.tables import CORPUS_COLUMNS, read_corpus


def test_parquet_path_dispatch(spark, tmp_path):
    p = str(tmp_path / "pages.parquet")
    corpus_spark_df(spark, 50, seed=1, n_parts=2).write.parquet(p)
    df = read_corpus(spark, p)
    assert tuple(df.columns) == CORPUS_COLUMNS
    assert df.count() == 50
    assert dict(df.dtypes)["html"] == "binary"


def test_table_name_dispatch(spark):
    corpus_spark_df(spark, 30, seed=2, n_parts=2).createOrReplaceTempView("cb_pages")
    df = read_corpus(spark, "cb_pages")
    assert tuple(df.columns) == CORPUS_COLUMNS
    assert df.count() == 30
    # explicit format="table" takes the same route
    assert read_corpus(spark, "cb_pages", format="table").count() == 30


def test_schema_contract(spark):
    # optional columns null-filled, required columns enforced
    partial = spark.createDataFrame(
        [("u1", "2016-09-16 05:00:00", "hello")], "url string, warc_ts string, text string"
    )
    partial.createOrReplaceTempView("cb_partial")
    df = read_corpus(spark, "cb_partial")
    row = df.collect()[0]
    assert row.html is None and row.lang is None and row.text == "hello"

    bad = spark.createDataFrame([("x",)], "text string")
    bad.createOrReplaceTempView("cb_bad")
    with pytest.raises(ValueError, match="missing required"):
        read_corpus(spark, "cb_bad")

    extra = spark.createDataFrame(
        [("u", "2016-09-16", "t", 1)], "url string, warc_ts string, text string, junk int"
    )
    extra.createOrReplaceTempView("cb_extra")
    read_corpus(spark, "cb_extra")  # lax mode tolerates extras
    with pytest.raises(ValueError, match="unexpected"):
        read_corpus(spark, "cb_extra", strict=True)
