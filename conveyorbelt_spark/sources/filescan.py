"""Incremental file-listing scans (S4/S6) + freshness filter (F6).

Reference: IisBlobScheduler.DoSchedule lists blob containers, keeps blobs
with ``LastModified > LastOffsetPoint`` ordered by LastModified, and emits
per-file work units (Scheduling/IisBlobScheduler.cs:19-92,
SimpleBlobScheduler.cs:22-73). In Spark the work unit is the file split;
this module provides the incremental listing + offset bookkeeping for batch
mode (Structured Streaming's file source subsumes it in stream mode —
sources W4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from .planner import FileOffset


@dataclass
class FileBatch:
    files: list[str]
    new_offset: FileOffset | None


def list_new_files(
    root: str,
    last: FileOffset | None,
    *,
    suffix: str = ".parquet",
    instances: list[str] | None = None,
) -> FileBatch:
    """Files under ``root`` (or ``root/{instance}`` per instance — the
    multi-instance path enumeration of IisBlobScheduler.cs:48-56) with
    mtime > last offset, ordered by (mtime, name). The returned offset
    points at the newest file seen (advance AFTER processing)."""
    roots = [os.path.join(root, i) for i in instances] if instances else [root]
    found: list[tuple[float, str]] = []
    last_ts = last.time_offset.timestamp() if last else -1.0
    for r in roots:
        if not os.path.isdir(r):
            continue
        for name in os.listdir(r):
            p = os.path.join(r, name)
            if not name.endswith(suffix) or not os.path.isfile(p):
                continue
            mt = os.path.getmtime(p)
            # 1 µs tolerance: the offset stores µs-precision timestamps while
            # getmtime is ns-precision — without it the newest file re-lists
            if mt > last_ts + 1e-6 or (
                last and abs(mt - last_ts) <= 1e-6 and p > (last.file_name or "")
            ):
                found.append((mt, p))
    found.sort()
    if not found:
        return FileBatch([], last)
    newest_mt, newest = found[-1]
    return FileBatch(
        [p for _, p in found],
        FileOffset(datetime.fromtimestamp(newest_mt, tz=timezone.utc), newest),
    )


def read_files(spark: SparkSession, batch: FileBatch, schema: str | None = None) -> DataFrame:
    """Read a listed batch with lineage: adds ``_source_file`` via
    input_file_name() (filename/path recovery — SURVEY §2.9)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    df = reader.parquet(*batch.files)
    return df.withColumn("_source_file", F.input_file_name())


def modified_after_read(spark: SparkSession, root: str, since: datetime) -> DataFrame:
    """The built-in alternative: Spark's own modifiedAfter pushdown."""
    return (
        spark.read.option("modifiedAfter", since.strftime("%Y-%m-%dT%H:%M:%S"))
        .parquet(root)
        .withColumn("_source_file", F.input_file_name())
    )
