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
