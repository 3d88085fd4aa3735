"""End-to-end conveyor: registry → plan → pruned scan → index → offset
advance (the MasterScheduler loop re-expressed; SURVEY §3.1)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.conveyor import SourceRegistry, SourceSpec, plan_source, run_sources
from conveyorbelt_spark.corpus import EPOCH, corpus_spark_df
from conveyorbelt_spark.index.query import bm25_topk

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def web_table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("webtbl") / "pages")
    corpus_spark_df(spark, 400, seed=42, n_parts=2).write.parquet(d)
    return d


def test_plan_guards():
    spec = SourceSpec("biz", "live_web", "/x", is_active=False,
                      last_offset_point="2016-09-16T05:00:00+00:00")
    assert plan_source(spec, dt.datetime(2016, 9, 16, 6, 0, tzinfo=UTC)) == ([], None)
    spec.is_active = True
    keys, new_last = plan_source(spec, dt.datetime(2016, 9, 16, 6, 0, tzinfo=UTC))
    assert len(keys) == 57  # planner math parity
    spec.stop_offset_point = "2016-09-16T04:00:00+00:00"
    spec.last_offset_point = "2016-09-16T05:00:00+00:00"
    assert plan_source(spec, dt.datetime(2016, 9, 16, 6, 0, tzinfo=UTC)) == ([], None)


def test_conveyor_cycle(spark, web_table, tmp_path_factory):
    reg_path = str(tmp_path_factory.mktemp("reg") / "sources.json")
    idx = str(tmp_path_factory.mktemp("cidx"))
    reg = SourceRegistry(reg_path)
    start = EPOCH.replace(tzinfo=UTC) - dt.timedelta(minutes=1)
    # LastOffsetPoint semantics: the minute AT the offset is already done;
    # scheduling starts at last+1 (MinuteTableShardScheduler.cs:33)
    spec = SourceSpec(
        "biz", "live_web", web_table,
        ts_col="warc_ts",
        last_offset_point=start.isoformat(),
        grace_period_minutes=3,
    )
    reg.save([spec])

    # docs span EPOCH..EPOCH+400s (~7 min); schedule 5 min past grace
    now = start + dt.timedelta(minutes=8)
    counts = run_sources(spark, reg, idx, now=now)
    n1 = counts["biz_live_web"]
    assert 0 < n1 < 400  # only the scheduled window ingested

    # offset advanced AFTER commit; a second pass with same `now` is a no-op
    spec2 = reg.get_sources()[0]
    assert spec2.last_offset_point > start.isoformat()
    counts2 = run_sources(spark, reg, idx, now=now)
    assert counts2["biz_live_web"] == 0

    # later pass picks up the rest
    counts3 = run_sources(spark, reg, idx, now=start + dt.timedelta(minutes=30))
    assert n1 + counts3["biz_live_web"] == 400

    # the index is queryable and complete
    total_docs = spark.read.parquet(f"{idx}/manifest").count() >= 1
    assert total_docs
    assert bm25_topk(spark, idx, "term00000", 5).count() == 5


def test_conveyor_with_filter(spark, web_table, tmp_path_factory):
    reg_path = str(tmp_path_factory.mktemp("regf") / "sources.json")
    idx = str(tmp_path_factory.mktemp("cidxf"))
    reg = SourceRegistry(reg_path)
    start = EPOCH.replace(tzinfo=UTC) - dt.timedelta(minutes=1)
    spec = SourceSpec(
        "biz", "en_only", web_table,
        ts_col="warc_ts",
        last_offset_point=start.isoformat(),
        filter="lang == en",
    )
    reg.save([spec])
    run_sources(spark, reg, idx, now=start + dt.timedelta(minutes=30))
    n_docs = spark.read.parquet(f"{idx}/doclens").count()
    src = spark.read.parquet(web_table)
    n_en = src.where(F.col("lang") == "en").count()
    assert n_docs == n_en


def test_replayed_epoch_does_not_hang(spark, web_table, tmp_path_factory):
    """Crash window: run committed (manifest row exists) but the registry
    update was lost. The replayed cycle's index_batch is a no-op that never
    touches the observed DataFrame — run_source must skip obs.get (which
    would block forever) and just advance the offset."""
    from conveyorbelt_spark.conveyor import run_source

    reg_path = str(tmp_path_factory.mktemp("regr") / "sources.json")
    idx = str(tmp_path_factory.mktemp("cidxr"))
    reg = SourceRegistry(reg_path)
    start = EPOCH.replace(tzinfo=UTC) - dt.timedelta(minutes=1)
    spec = SourceSpec(
        "biz", "replay", web_table,
        ts_col="warc_ts",
        last_offset_point=start.isoformat(),
    )
    reg.save([spec])
    now = start + dt.timedelta(minutes=8)
    n1 = run_source(spark, spec, idx, reg, now=now)
    assert n1 > 0
    advanced = spec.last_offset_point

    # simulate the lost registry update: rewind the offset, replay the cycle
    spec.last_offset_point = start.isoformat()
    n2 = run_source(spark, spec, idx, reg, now=now)  # hangs without the guard
    assert n2 == 0
    # the replay still advances the offset past the committed run
    assert spec.last_offset_point == advanced
    assert reg.get_sources()[0].last_offset_point == advanced


def test_conveyor_ingest_pipeline(spark, web_table, tmp_path_factory):
    """Ingest pipeline between parse/filter and the index write
    (NestBatchPusher.cs:76-77 server-side ES pipeline analogue): ES
    processor JSON compiles to JVM column expressions; derived/renamed
    fields land in the docstore; registry-named callables work too."""
    from conveyorbelt_spark.conveyor import (
        build_ingest_pipeline,
        register_pipeline,
        run_sources,
    )

    reg_path = str(tmp_path_factory.mktemp("regp") / "sources.json")
    idx = str(tmp_path_factory.mktemp("cidxp"))
    reg = SourceRegistry(reg_path)
    start = EPOCH.replace(tzinfo=UTC) - dt.timedelta(minutes=1)
    spec = SourceSpec(
        "biz", "piped", web_table,
        ts_col="warc_ts",
        last_offset_point=start.isoformat(),
        custom={
            "pipeline_processors": [
                {"copy": {"field": "lang", "target_field": "lang_raw"}},
                {"uppercase": {"field": "lang"}},
                {"set": {"field": "env", "value": "prod"}},
                {"gsub": {"field": "url", "pattern": "^https://", "replacement": ""}},
            ],
        },
    )
    reg.save([spec])
    run_sources(spark, reg, idx, now=start + dt.timedelta(minutes=30))
    # pipeline output is what got indexed: verify via a direct transform twin
    src = spark.read.parquet(web_table)
    twin = build_ingest_pipeline(spec.custom["pipeline_processors"])(src)
    assert twin.where(F.col("lang") == "EN").count() == src.where(
        F.col("lang") == "en"
    ).count()
    assert {r.env for r in twin.select("env").distinct().collect()} == {"prod"}
    assert twin.where(F.col("url").startswith("https://")).count() == 0

    # registry-named pipeline: a plain callable, resolved like parsers
    register_pipeline("drop_non_en", lambda df: df.where(F.col("lang") == "en"))
    reg2 = SourceRegistry(str(tmp_path_factory.mktemp("regp2") / "sources.json"))
    idx2 = str(tmp_path_factory.mktemp("cidxp2"))
    spec2 = SourceSpec(
        "biz", "piped2", web_table,
        ts_col="warc_ts",
        last_offset_point=start.isoformat(),
        pipeline="drop_non_en",
    )
    reg2.save([spec2])
    run_sources(spark, reg2, idx2, now=start + dt.timedelta(minutes=30))
    n_docs = spark.read.parquet(f"{idx2}/doclens").count()
    assert n_docs == src.where(F.col("lang") == "en").count()


def test_source_summary_dto():
    """DiagnosticsSourceSummary twin (DiagnosticsSourceSummary.cs:12-49,
    DiagnosticsSourceSummaryTests.cs:15-74): JSON round-trip, ToSummary
    field mapping, dynamic property bag, AlternateTypeName override."""
    from conveyorbelt_spark.conveyor import SourceSummary

    spec = SourceSpec(
        "pk", "rk", "/tbl",
        filter="lang == en",
        last_offset_point="2016-09-16T05:00:00+00:00",
        custom={"dpi": 2, "dps": "man", "dpb": True},
    )
    s = spec.to_summary()
    assert (s.partition_key, s.row_key) == ("pk", "rk")
    assert s.type_name == "pk_rk" == spec.type_key
    assert s.filter == "lang == en"
    assert s.last_time_offset == spec.last_offset_point
    assert s.get_dynamic_property("dpi") == 2
    assert s.get_dynamic_property("dps") == "man"
    assert s.get_dynamic_property("dpb") is True
    assert s.get_dynamic_property("nope", "dflt") == "dflt"
    # config knobs flatten into the bag (ToSummary copies entity props)
    assert s.get_dynamic_property("scheduler_type") == "MinuteTableShardScheduler"
    # JSON round-trip (CanBeSerialised/CanBeDeserialised)
    s2 = SourceSummary.from_json(s.to_json())
    assert s2 == s
    # AlternateTypeName override (CanConvertFromSourceToSummary_WithAlternateTypeName)
    spec2 = SourceSpec("pk", "rk", "/tbl", custom={"AlternateTypeName": "vahshi"})
    assert spec2.to_summary().type_name == "vahshi"
