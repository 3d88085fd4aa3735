"""Corpus input adapter: Iceberg catalog tables or parquet paths.

The north-star deployment reads the web-page corpus from an **Iceberg
table** (``url string, warc_ts timestamp, html binary, text string, lang
string``) at 10^12-document scale. Spark addresses Iceberg through the
ordinary table API — ``spark.read.table("catalog.db.pages")`` — once the
runtime jar and catalog are configured on the cluster
(``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`` …), so
the ENGINE code is format-agnostic: the same call serves Iceberg, Hive
tables, or registered views, and Catalyst still gets full pushdown
(Iceberg exposes partition pruning + min/max file skipping through the
DataSourceV2 scan, so a ``warc_ts`` window or ``lang`` filter prunes
manifests before any data file opens).

Deployment guidance for the 10^12-doc table (documented here because the
sandbox has no Iceberg runtime to demonstrate it):

- partition by ``days(warc_ts)`` (hidden partitioning) — aligns with the
  daily sub-index build (`index/daily.py`), so each day's build scans
  exactly one partition;
- sort order ``url`` within files — groups a site's pages for better
  column compression and locality in the doc-id (url-hash) space;
- snapshot isolation gives the build a consistent corpus view: pass
  ``option("snapshot-id", …)`` for reproducible re-runs, and incremental
  ingest (`streaming/incremental.index_stream`) can follow appends via
  the Iceberg streaming source.

This module is the thin dispatch + schema contract; no Iceberg-specific
code is needed beyond it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

CORPUS_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def ensure_corpus_schema(df: DataFrame, *, strict: bool = False) -> DataFrame:
    """Project/cast to the canonical corpus shape. Missing optional columns
    (html, lang) become typed nulls; a missing url/warc_ts/text column
    raises (there is no sane default for identity, event time, or
    content). ``strict=True`` also rejects extra columns."""
    cols = set(df.columns)
    required = {"url", "warc_ts", "text"}
    missing = sorted(required - cols)
    if missing:
        raise ValueError(f"corpus input is missing required columns: {missing}")
    if strict:
        extra = sorted(cols - set(CORPUS_COLUMNS))
        if extra:
            raise ValueError(f"corpus input has unexpected columns: {extra}")
    return df.select(
        F.col("url").cast("string"),
        F.col("warc_ts").cast("timestamp"),
        (F.col("html") if "html" in cols else F.lit(None)).cast("binary").alias("html"),
        F.col("text").cast("string"),
        (F.col("lang") if "lang" in cols else F.lit(None)).cast("string").alias("lang"),
    )


def read_corpus(
    spark: SparkSession,
    source: str,
    *,
    format: str | None = None,  # noqa: A002 — the Spark reader option name
    strict: bool = False,
) -> DataFrame:
    """Load the corpus from ``source`` and normalize its schema.

    Dispatch rule:
    - explicit ``format=`` wins (``"iceberg"``/``"delta"``/… →
      ``spark.read.format(fmt).load(source)``; ``"table"`` forces the
      catalog path);
    - a path-looking source (contains a separator, a URI scheme, or ends in
      ``.parquet``) → ``spark.read.parquet``;
    - anything else (``db.table``, ``catalog.db.table``, a view name) →
      ``spark.read.table`` — the Iceberg entry point on a configured
      cluster, and plain Hive/views elsewhere.
    """
    if format == "table":
        df = spark.read.table(source)
    elif format is not None:
        df = spark.read.format(format).load(source)
    elif (
        os.sep in source
        or "/" in source
        or "://" in source
        or source.endswith(".parquet")
    ):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    return ensure_corpus_schema(df, strict=strict)
