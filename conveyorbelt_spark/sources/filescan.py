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
from datetime import datetime, timedelta, timezone

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


# --------------------------------------------------------------------------
# S5/P4 — hour-file name-convention planner + growing-file chase window
# (IisBlobConventionScheduler.cs:20-93, name synthesis :68-85;
#  BlobFileConventionActor.cs:41-135 chase/stop rules)
# --------------------------------------------------------------------------

IIS_HOUR_TEMPLATE = "u_ex%y%m%d%H.log"
CHASE_MINUTES = 80  # StopChasingAfter = fileHour + 80 min


@dataclass
class ChaseUnit:
    """One predicted hourly file to consume/chase (BlobFileScheduled.cs:9-31)."""

    file: str
    hour: datetime
    previous: str
    next: str
    stop_chasing_after: datetime
    last_position: int = 0

    def stop_chasing(self, now: datetime, next_exists: bool) -> bool:
        """Chase ends when the next hour's file appears or the window
        passes (BlobFileConventionActor.cs:107-118)."""
        return next_exists or now >= self.stop_chasing_after


def hour_file_name(hour: datetime, template: str = IIS_HOUR_TEMPLATE) -> str:
    """Synthesize the convention name from the clock — 'u_ex16091605.log'
    for 2016-09-16T05 (IisBlobConventionScheduler.cs:68-85)."""
    return hour.strftime(template)


def hour_convention_units(
    root: str,
    last_hour: datetime,
    now: datetime,
    *,
    instances: list[str] | None = None,
    template: str = IIS_HOUR_TEMPLATE,
    chase_minutes: int = CHASE_MINUTES,
) -> list[ChaseUnit]:
    """One work unit per elapsed hour per instance, names derived from the
    clock instead of a listing (the convention scheduler's whole point:
    listing a huge container is slow; names are predictable)."""
    units: list[ChaseUnit] = []
    hour = last_hour.replace(minute=0, second=0, microsecond=0)
    top = now.replace(minute=0, second=0, microsecond=0)
    while hour < top:
        hour = hour + timedelta(hours=1)
        for inst in instances or [""]:
            base = os.path.join(root, inst) if inst else root
            units.append(
                ChaseUnit(
                    file=os.path.join(base, hour_file_name(hour, template)),
                    hour=hour,
                    previous=os.path.join(base, hour_file_name(hour - timedelta(hours=1), template)),
                    next=os.path.join(base, hour_file_name(hour + timedelta(hours=1), template)),
                    stop_chasing_after=hour + timedelta(minutes=chase_minutes),
                )
            )
    return units


def convention_partition_path(root: str, hour: datetime) -> str:
    """The partition-path convention variant: '{root}/dt=YYYYMMDDHH/'
    (SURVEY S5 Spark mapping — load exactly one hour directory)."""
    return os.path.join(root, f"dt={hour:%Y%m%d%H}")


# --------------------------------------------------------------------------
# X8 — mid-file byte-offset resume (ParseCursor.cs:3-15; mid-line landing
# IisLogParser.cs:74-79: a cursor inside a line resumes at the NEXT line,
# which the start-offset line assignment reproduces exactly)
# --------------------------------------------------------------------------

def apply_parse_cursor(lines: DataFrame, cursor: FileOffset) -> DataFrame:
    """Drop the already-consumed byte prefix of the cursor's file: lines
    whose START offset is below the cursor were parsed in a previous pass
    (their RowKey = offset-after-line is already committed). Lines of other
    files pass through. A cursor landing mid-line skips that partial line —
    the reference's ParseCursor(RowOffsets[i]+1) contract."""
    if not cursor or not cursor.file_name:
        return lines
    return lines.where(
        (F.col("file") != F.lit(cursor.file_name))
        | (F.col("byte_offset") >= F.lit(int(cursor.position)))
    )


def advance_parse_cursor(lines: DataFrame, file: str, prev: FileOffset | None = None) -> FileOffset:
    """New cursor after consuming ``lines`` of ``file``: position = end
    offset of the last line (offset + length + newline) — the parser's
    update-as-it-advances contract (BlobFileConventionActor.cs:94-97)."""
    row = (
        lines.where(F.col("file") == file)
        .agg(F.max(F.col("byte_offset") + F.length("line") + 1).alias("pos"))
        .collect()[0]
    )
    pos = int(row["pos"]) if row["pos"] is not None else (prev.position if prev else 0)
    t = prev.time_offset if prev else datetime.now(timezone.utc)
    return FileOffset(t, file, pos)


def modified_after_read(spark: SparkSession, root: str, since: datetime) -> DataFrame:
    """The built-in alternative: Spark's own modifiedAfter pushdown."""
    return (
        spark.read.option("modifiedAfter", since.strftime("%Y-%m-%dT%H:%M:%S"))
        .parquet(root)
        .withColumn("_source_file", F.input_file_name())
    )
