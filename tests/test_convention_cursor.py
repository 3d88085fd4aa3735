"""S5/P4 hour-file convention planner + X8 mid-file byte-offset resume
(IisBlobConventionScheduler.cs:68-85 name synthesis; ParseCursor.cs:3-15 +
mid-line landing IisLogParser.cs:74-79, pinned by the reference's
IisLogTests.cs ParseCursor(RowOffsets[5]+1) case)."""

from __future__ import annotations

import datetime as dt

from conveyorbelt_spark.sources.filescan import (
    advance_parse_cursor,
    apply_parse_cursor,
    convention_partition_path,
    hour_convention_units,
    hour_file_name,
)
from conveyorbelt_spark.sources.parsers import parse_iis_logs
from conveyorbelt_spark.sources.planner import FileOffset


def test_hour_file_name_synthesis():
    assert hour_file_name(dt.datetime(2016, 9, 16, 5)) == "u_ex16091605.log"


def test_hour_convention_units():
    units = hour_convention_units(
        "wad-iis-logfiles",
        dt.datetime(2016, 9, 16, 4, 30),
        dt.datetime(2016, 9, 16, 7, 10),
        instances=["i1", "i2"],
    )
    assert len(units) == 6  # hours 05,06,07 × 2 instances
    u = next(x for x in units if x.hour.hour == 5 and "/i1/" in x.file)
    assert u.file == "wad-iis-logfiles/i1/u_ex16091605.log"
    assert u.previous.endswith("u_ex16091604.log")
    assert u.next.endswith("u_ex16091606.log")
    # chase window: hour + 80 min (BlobFileConventionActor.cs:107-118)
    assert u.stop_chasing_after == dt.datetime(2016, 9, 16, 6, 20)
    assert not u.stop_chasing(dt.datetime(2016, 9, 16, 6, 0), next_exists=False)
    assert u.stop_chasing(dt.datetime(2016, 9, 16, 6, 0), next_exists=True)
    assert u.stop_chasing(dt.datetime(2016, 9, 16, 6, 21), next_exists=False)


def test_convention_partition_path():
    assert convention_partition_path("/data", dt.datetime(2016, 9, 16, 5)) == (
        "/data/dt=2016091605"
    )


IIS_LINES = [
    "#Fields: date time s-ip cs-method cs-uri-stem sc-status",
    "2016-09-16 05:00:01 10.0.0.1 GET /a 200",
    "2016-09-16 05:00:02 10.0.0.2 GET /b 200",
    "2016-09-16 05:00:03 10.0.0.3 GET /c 200",
    "2016-09-16 05:00:04 10.0.0.4 GET /d 200",
]
FNAME = "logs/i1/u_ex16091605.log"


def _lines_df(spark, lines):
    rows, off = [], 0
    for i, line in enumerate(lines):
        rows.append((FNAME, i + 1, off, line))
        off += len(line) + 1
    return spark.createDataFrame(
        rows, "file string, line_no long, byte_offset long, line string"
    )


def test_parse_cursor_midline_resume(spark):
    """Cursor landing 1 byte INTO line 3 resumes at line 4 — the reference's
    RowOffsets[i]+1 contract — and resumed ∪ already-parsed == whole parse."""
    lines = _lines_df(spark, IIS_LINES)
    offsets = [r.byte_offset for r in lines.orderBy("line_no").collect()]
    whole = {r.RowKey for r in parse_iis_logs(lines).collect()}

    cursor = FileOffset(dt.datetime(2016, 9, 16, 5, tzinfo=dt.timezone.utc), FNAME, offsets[2] + 1)
    resumed = parse_iis_logs(lines, cursor=cursor)
    got = {r.RowKey for r in resumed.collect()}
    # lines 1-3 (header + 2 data rows + the mid-landed line) skipped
    assert got == {"u_ex16091605_" + str(offsets[4] + len(IIS_LINES[4]) + 1),
                   "u_ex16091605_" + str(offsets[3] + len(IIS_LINES[3]) + 1)}
    assert got < whole


def test_parse_cursor_growing_file_chase(spark):
    """W4 chase: parse, advance the cursor, append lines, re-parse from the
    cursor → exactly the new rows; union == whole-file parse."""
    first = _lines_df(spark, IIS_LINES[:3])
    cursor = FileOffset(dt.datetime(2016, 9, 16, 5, tzinfo=dt.timezone.utc), FNAME, 0)
    batch1 = parse_iis_logs(first, cursor=cursor)
    rk1 = {r.RowKey for r in batch1.collect()}
    cursor = advance_parse_cursor(first, FNAME, cursor)

    grown = _lines_df(spark, IIS_LINES)  # same file, 2 more lines appended
    batch2 = parse_iis_logs(grown, cursor=cursor)
    rk2 = {r.RowKey for r in batch2.collect()}
    assert rk1 and rk2 and not (rk1 & rk2)
    whole = {r.RowKey for r in parse_iis_logs(grown).collect()}
    assert rk1 | rk2 == whole
    # idempotent: advancing again over unchanged data yields nothing new
    cursor = advance_parse_cursor(grown, FNAME, cursor)
    assert parse_iis_logs(grown, cursor=cursor).count() == 0
