"""Golden-fixture parser tests — mirrors the reference's test strategy
(SURVEY.md §5: IisLogTests.cs, SitecoreLogParserShould.cs,
GenericJsonParserTests.cs, InsightMetricsParserTests.cs,
TableEntityExtensionsTest.cs). Fixtures are authored here in the same
formats (not copied)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.sources.parsers import (
    eav_to_doc,
    parse_akamai_logs,
    parse_generic_json,
    parse_iis_logs,
    parse_insight_metrics,
    parse_sitecore_logs,
)

# --------------------------------------------------------------------------
# IIS (X1): header-driven parse, mid-file header change, '-' missing,
# malformed timestamp drop, CustomAttributes explode, RowKey recipe
# --------------------------------------------------------------------------

IIS_LINES = [
    "#Software: Internet Information Services 8.0",
    "#Fields: date time s-ip cs-method cs-uri-stem sc-status",
    "2016-09-16 05:00:01 10.0.0.1 GET /index.html 200",
    "2016-09-16 05:00:02 10.0.0.2 GET - 404",
    "2016-9-16 05:00:03 10.0.0.3 GET /bad 200",
    "#Fields: date time s-ip cs-method cs-uri-stem sc-status cs-bytes time-taken CustomAttributes",
    "2016-09-16 06:00:01 10.0.0.4 POST /api 201 512 44 foo=bar;baz=qux",
]


def _lines_df(spark, lines, fname="logs/instance1/u_ex160916.log"):
    rows, off = [], 0
    for i, line in enumerate(lines):
        rows.append((fname, i + 1, off, line))
        off += len(line) + 1
    return spark.createDataFrame(
        rows, "file string, line_no long, byte_offset long, line string"
    )


@pytest.fixture(scope="module")
def iis_parsed(spark):
    return parse_iis_logs(_lines_df(spark, IIS_LINES)).orderBy("ts").collect()


def test_iis_row_count_and_malformed_drop(iis_parsed):
    # 4 data lines, 1 malformed timestamp dropped (IisLogParser.cs:131-163)
    assert len(iis_parsed) == 3


def test_iis_fields_and_types(iis_parsed):
    r = iis_parsed[0]
    assert r.ts == dt.datetime(2016, 9, 16, 5, 0, 1)
    assert r.s_ip == "10.0.0.1" and r.cs_method == "GET"
    assert r.cs_uri_stem == "/index.html" and r.sc_status == 200
    assert r.cs_bytes is None  # not in first header


def test_iis_missing_dash(iis_parsed):
    r = iis_parsed[1]
    assert r.cs_uri_stem is None  # '-' omitted (IisLogParser.cs:178-179)
    assert r.sc_status == 404


def test_iis_header_change_and_custom_attrs(iis_parsed):
    r = iis_parsed[2]
    assert r.cs_bytes == 512 and r.time_taken == 44
    assert r.custom == {"foo": "bar", "baz": "qux"}


def test_iis_identity(iis_parsed):
    # PartitionKey from path, RowKey = {stem}_{offset after line}
    # (IisLogParser.cs:59-61,114)
    r = iis_parsed[0]
    assert r.PartitionKey == "logs_instance1"
    off = sum(len(line) + 1 for line in IIS_LINES[:3])
    assert r.RowKey == f"u_ex160916_{off}"


def test_iis_strict_mismatch_raises(spark):
    bad = ["#Fields: date time s-ip", "2016-09-16 05:00:01 10.0.0.1 EXTRA"]
    with pytest.raises(Exception, match="(?i)mismatch"):
        parse_iis_logs(_lines_df(spark, bad)).collect()
    # non-strict drops the row instead
    assert parse_iis_logs(_lines_df(spark, bad), strict=False).count() == 0


def _rows_set(df):
    return sorted(
        (r.RowKey, r.ts, r.s_ip, r.cs_method, r.cs_uri_stem, r.sc_status,
         r.cs_bytes, r.time_taken, r.custom)
        for r in df.collect()
    )


def test_iis_byte_splits_match_whole_file(spark):
    """Byte-range splits (ParseCursor contract): parsing with many small
    splits — boundaries landing MID-LINE and splits starting with no header
    in them — must equal the whole-file parse bit for bit."""
    lines = _lines_df(spark, IIS_LINES)
    whole = _rows_set(parse_iis_logs(lines, split_bytes=None))
    total = sum(len(line) + 1 for line in IIS_LINES)
    # every split size from pathological (7 bytes: all boundaries mid-line,
    # most splits header-less) to bigger-than-file
    for sb in (7, 23, 40, 64, total + 10):
        got = _rows_set(parse_iis_logs(lines, split_bytes=sb))
        assert got == whole, f"split_bytes={sb}"
    assert len(whole) == 3


def test_iis_split_without_header_before_first_header_drops(spark):
    """Lines before the FILE's first '#Fields:' stay dropped even when they
    are alone in a split (no governing header exists)."""
    lines = _lines_df(spark, IIS_LINES)
    got = parse_iis_logs(lines, split_bytes=10).orderBy("ts").collect()
    assert [r.RowKey for r in got] == [
        r.RowKey for r in parse_iis_logs(lines, split_bytes=None).orderBy("ts").collect()
    ]


def test_akamai_tab_and_quotes(spark):
    lines = [
        "#Fields: date time cs-method sc-status",
        '2016-09-16\t05:00:01\t"GET"\t"200"',
    ]
    r = parse_akamai_logs(_lines_df(spark, lines)).collect()[0]
    assert r.cs_method == "GET" and r.sc_status == 200


# --------------------------------------------------------------------------
# Sitecore (X3): stitch, redaction, banner/blank skip, rollover, RowKey
# --------------------------------------------------------------------------

SC_FILE = "site/prod/mylog.log.20160916.050000.txt"
SC_LINES = [
    "ManagedPoolThread #5 05:01:10 INFO Job started: refresh",
    "ManagedPoolThread #5 05:01:11 ERROR Exception occurred",
    "   at Sitecore.Something()",
    "",
    "4608 05:02:00 WARN Connection failed password=Secret123;user id=admin;rest",
    "9999 05:03:00 INFO ***** banner noise",
    "400 04:59:00 INFO next day entry",
]


@pytest.fixture(scope="module")
def sc_parsed(spark):
    rows = [(SC_FILE, i + 1, line) for i, line in enumerate(SC_LINES)]
    df = spark.createDataFrame(rows, "file string, line_no long, line string")
    return parse_sitecore_logs(df).orderBy("RowKey").collect()


def test_sitecore_stitch_and_counts(sc_parsed):
    assert len(sc_parsed) == 4  # banner + blank skipped, stack line stitched
    by_rk = {r.RowKey: r for r in sc_parsed}
    e2 = by_rk["mylog.log.20160916.050000_2"]
    assert e2.Payload == "Exception occurred\n   at Sitecore.Something()"
    assert e2.SitecoreLevel == "ERROR"
    assert e2.SitecoreProcessId == "ManagedPoolThread #5"


def test_sitecore_redaction(sc_parsed):
    e = {r.RowKey: r for r in sc_parsed}["mylog.log.20160916.050000_5"]
    assert "Secret123" not in e.Payload and "admin" not in e.Payload
    assert "password=**PASSWORD**REDACTED**;" in e.Payload
    assert "user id=**USER**REDACTED**;rest" in e.Payload


def test_sitecore_timestamps_and_rollover(sc_parsed):
    by_rk = {r.RowKey: r for r in sc_parsed}
    assert by_rk["mylog.log.20160916.050000_1"].ts == dt.datetime(2016, 9, 16, 5, 1, 10)
    # hour 4 < file start hour 5 ⇒ next day (SitecoreLogLineParser.cs:68-70)
    assert by_rk["mylog.log.20160916.050000_7"].ts == dt.datetime(2016, 9, 17, 4, 59, 0)


def test_sitecore_cross_split_stitch(spark):
    """An entry whose continuation lines land in a LATER split must stitch
    identically to the single-split parse (distributed entry numbering)."""
    rows = [(SC_FILE, i + 1, line) for i, line in enumerate(SC_LINES)]
    df = spark.createDataFrame(rows, "file string, line_no long, line string")

    def snap(split_lines):
        return sorted(
            (r.RowKey, r.ts, r.SitecoreLevel, r.SitecoreProcessId, r.Payload)
            for r in parse_sitecore_logs(df, split_lines=split_lines).collect()
        )

    whole = snap(100_000)
    for sl in (1, 2, 3):  # split after every line / every 2 / every 3
        assert snap(sl) == whole, f"split_lines={sl}"
    assert len(whole) == 4


# --------------------------------------------------------------------------
# Generic JSON (X4): heuristic ladder, array explode, stringification
# --------------------------------------------------------------------------

def _json_df(spark, docs):
    return spark.createDataFrame([(d,) for d in docs], "doc string")


def test_json_timestamp_ladder(spark):
    docs = [
        '{"EventDate": "2016-01-02T03:04:05Z", "created_date": "2015-01-01T00:00:00Z", "v": 1}',
        '{"created_date": "2015-01-01T00:00:00Z", "v": 2}',
        '{"some_col": "2014-05-05T01:02:03Z", "v": 3}',
        '{"v": 4}',
    ]
    rows = parse_generic_json(_json_df(spark, docs)).collect()
    ts = {r.doc.get("v"): r.ts for r in rows}
    assert ts["1"].startswith("2016-01-02T03:04:05")  # good: EventDate wins
    assert ts["2"].startswith("2015-01-01")  # ok: name contains 'date'
    assert ts["3"].startswith("2014-05-05")  # any date value
    assert ts["4"].startswith("1970-01-01")  # deterministic 'now' stand-in


def test_json_array_and_values(spark):
    doc = '[{"this": "a", "thisIsNumber": 12, "thisIsFloat": 2.5, "flag": true}, {"this": "b"}]'
    rows = parse_generic_json(_json_df(spark, [doc])).collect()
    assert len(rows) == 2
    d = next(r.doc for r in rows if r.doc["this"] == "a")
    assert d["thisIsNumber"] == "12" and d["thisIsFloat"] == "2.5" and d["flag"] == "True"
    # synthesized identity is deterministic (md5) and unique per element
    rks = {r.RowKey for r in rows}
    assert len(rks) == 2 and all(r.PartitionKey == "nopart_" for r in rows)


def test_json_keeps_provided_keys(spark):
    doc = '{"PartitionKey": "pk1", "RowKey": "rk1", "x": 1}'
    r = parse_generic_json(_json_df(spark, [doc])).collect()[0]
    assert r.PartitionKey == "pk1" and r.RowKey == "rk1"


# --------------------------------------------------------------------------
# Insight metrics (X5): PK/RK recipe + quintet passthrough
# --------------------------------------------------------------------------

def test_insight_metrics(spark):
    rid = "/SUBSCRIPTIONS/9614FC94-9519-46FA-B7EC-DD1B0411DB13/RESOURCEGROUPS/MYRG/PROVIDERS/MICROSOFT.CACHE/REDIS/MYCACHE"
    blob = (
        '{"records":[{"count":4,"total":126.0,"minimum":0.0,"maximum":63.0,'
        f'"average":31.5,"resourceId":"{rid}","time":"2018-01-18T12:55:00Z",'
        '"metricName":"connectedclients","timeGrain":"PT1M"}]}'
    )
    df = spark.createDataFrame([(blob,)], "records string")
    r = parse_insight_metrics(df).collect()[0]
    # PK = {subGuidHead}_{tail3 reversed}_{metric} (InsightMetricsParser.cs:41-43)
    assert r.PartitionKey == "9614FC94_MYCACHE_REDIS_MICROSOFT.CACHE_connectedclients"
    assert r.RowKey == "20180118125500"
    assert r["count"] == 4 and r.average == 31.5 and r.timeGrain == "PT1M"


# --------------------------------------------------------------------------
# EAV→doc (X6) + event-time coalesce (X7)
# --------------------------------------------------------------------------

def test_eav_to_doc(spark):
    from conveyorbelt_spark.sources.parsers import timestamp_to_ticks

    df = spark.createDataFrame(
        [
            ("pk", "rk1", dt.datetime(2016, 1, 1, 10, 0, 0), dt.datetime(2016, 1, 1, 9, 0, 0), None, True, "", 5),
            ("pk", "rk2", dt.datetime(2016, 1, 1, 10, 0, 0), None, 635872464000000000, False, "x", 7),
        ],
        "PartitionKey string, RowKey string, Timestamp timestamp, EventDate timestamp, "
        "EventTickCount long, flag boolean, note string, n long",
    )
    rows = {r.RowKey: r for r in eav_to_doc(df, "WADLogsTable").collect()}
    # EventDate wins; ISO 's' render; bool lowercase; empty dropped (null)
    assert rows["rk1"].ts == "2016-01-01T09:00:00"
    assert rows["rk1"].flag == "true" and rows["rk1"].note is None
    assert rows["rk1"].cb_type == "WADLogsTable"
    # ticks fallback: 635872464000000000 ticks = 2016-01-01T12:00:00Z
    assert rows["rk2"].ts == "2016-01-01T12:00:00"
    # round-trip sanity for the ticks helpers
    back = df.select(timestamp_to_ticks("Timestamp").alias("t")).collect()[0].t
    assert back == 635872392000000000  # 2016-01-01T10:00:00Z in .NET ticks
