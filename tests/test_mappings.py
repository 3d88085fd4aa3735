"""Mapping-JSON registry (S10): declarations → StructType + analyzed /
not_analyzed / store flags; the IIS parser's field set derives from the
mapping file (MasterScheduler.cs:205-239 SetupMappingsAsync parity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T  # noqa: N812

from conveyorbelt_spark.sources.mappings import (
    analyzed_fields,
    apply_mapping,
    available_mappings,
    ensure_mapping,
    mapping_struct,
    not_analyzed_fields,
    unstored_fields,
)
from conveyorbelt_spark.sources.parsers import (
    IIS_ALL_FIELDS,
    IIS_LONG_FIELDS,
    IIS_STR_FIELDS,
)


def test_registry_lists_mappings():
    names = available_mappings()
    assert {"AzureIisLog", "WADLogsTable", "WADPerformanceCountersTable"} <= set(names)


def test_iis_fields_come_from_mapping():
    assert IIS_LONG_FIELDS == {
        "s_port", "sc_status", "sc_substatus", "sc_win32_status",
        "sc_bytes", "cs_bytes", "time_taken",
    }
    assert IIS_STR_FIELDS[:4] == ["s_sitename", "s_computername", "s_ip", "cs_method"]
    assert "cs_Cookie" in IIS_ALL_FIELDS
    # cs_Cookie is declared store:false (mappings/AzureIisLog.json parity
    # with the reference's cs_Cookie store:false)
    assert unstored_fields("AzureIisLog") == ["cs_Cookie"]


def test_mapping_struct_types():
    st = mapping_struct("WADPerformanceCountersTable")
    by_name = {f.name: f.dataType for f in st.fields}
    assert by_name["ts"] == T.TimestampType()
    assert by_name["CounterValue"] == T.DoubleType()
    assert by_name["CounterName"] == T.StringType()


def test_analyzed_vs_not_analyzed():
    # WADLogsTable: Message is full-text (analyzed → tokenizer/BM25 input),
    # Role etc. are keyword columns
    assert analyzed_fields("WADLogsTable") == ["Message"]
    assert "Role" in not_analyzed_fields("WADLogsTable")


def test_apply_mapping_casts(spark):
    df = spark.createDataFrame(
        [("2016-01-01T10:00:00", "12.5", "cpu", "extra")],
        "ts string, CounterValue string, CounterName string, other string",
    )
    out = apply_mapping(df, "WADPerformanceCountersTable")
    r = out.collect()[0]
    assert r.ts == dt.datetime(2016, 1, 1, 10, 0, 0)
    assert r.CounterValue == 12.5
    assert r.other == "extra"  # unmapped columns pass through
    assert dict(out.dtypes)["CounterValue"] == "double"


def test_ensure_mapping_ddl(tmp_path):
    idx = str(tmp_path / "idx")
    p1 = ensure_mapping(idx, "AzureIisLog")
    p2 = ensure_mapping(idx, "AzureIisLog")  # memoized no-op
    assert p1 == p2
    import json

    with open(p1) as f:
        assert "properties" in next(iter(json.load(f).values()))


def test_full_registry_ships_all_six():
    """All six reference mapping declarations ship in the package
    (reference mappings/: AzureIisLog, WADLogsTable,
    WADPerformanceCountersTable, SLABLogsTable, SitecoreLogTable,
    WADWindowsEventLogsTable)."""
    assert {
        "AzureIisLog", "WADLogsTable", "WADPerformanceCountersTable",
        "SLABLogsTable", "SitecoreLogTable", "WADWindowsEventLogsTable",
    } <= set(available_mappings())
    # each one loads into a typed struct with ts first
    for name in ("SLABLogsTable", "SitecoreLogTable", "WADWindowsEventLogsTable"):
        st = mapping_struct(name)
        assert st.fields[0].name == "ts"
        assert isinstance(st.fields[0].dataType, T.TimestampType)


def test_slab_two_date_fields_and_event_time(spark):
    """SLABLogsTable is the SURVEY §1.2 two-date-field case (reference
    mappings/SLABLogsTable.json:8-11 declares @timestamp AND EventDate):
    both map to timestamps, and X7's event_time prefers EventDate over the
    storage Timestamp (TableEntityExtensions.cs:12-31 ladder)."""
    from conveyorbelt_spark.sources.mappings import fields_of_type
    from conveyorbelt_spark.sources.parsers import event_time

    assert fields_of_type("SLABLogsTable", "date") == ["ts", "EventDate"]
    assert "Payload" in analyzed_fields("SLABLogsTable")
    assert "ProviderId" in not_analyzed_fields("SLABLogsTable")

    rows = [
        # EventDate present → wins over Timestamp
        ("p1", "r1", dt.datetime(2016, 9, 16, 10, 0), dt.datetime(2016, 9, 16, 12, 0)),
        # EventDate null → falls back to Timestamp
        ("p1", "r2", None, dt.datetime(2016, 9, 16, 12, 5)),
    ]
    df = spark.createDataFrame(
        rows,
        "PartitionKey string, RowKey string, EventDate timestamp, Timestamp timestamp",
    )
    got = {
        r.RowKey: r.et
        for r in df.withColumn("et", event_time(df)).collect()
    }
    assert got["r1"] == dt.datetime(2016, 9, 16, 10, 0)
    assert got["r2"] == dt.datetime(2016, 9, 16, 12, 5)


def test_windows_event_and_sitecore_flags(spark):
    """WADWindowsEventLogsTable: RawXml is not_analyzed (exact blob),
    Description analyzed; SitecoreLogTable: Payload analyzed."""
    assert "RawXml" in not_analyzed_fields("WADWindowsEventLogsTable")
    assert "Description" in analyzed_fields("WADWindowsEventLogsTable")
    assert "Payload" in analyzed_fields("SitecoreLogTable")
    assert "SitecoreLevel" in analyzed_fields("SitecoreLogTable")
    # WADWindowsEventLogs rows route event_time through EventTickCount
    from conveyorbelt_spark.sources.parsers import event_time

    df = spark.createDataFrame(
        [("p", "r", 636095808000000000, dt.datetime(2016, 9, 20))],
        "PartitionKey string, RowKey string, EventTickCount long, Timestamp timestamp",
    )
    (row,) = df.withColumn("et", event_time(df)).collect()
    assert row.et == dt.datetime(2016, 9, 16, 0, 0)
