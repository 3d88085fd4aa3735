"""S3 JDBC shard-scan adapter: predicate construction is pure and tested
here; the network read is env-gated like the reference's IntegrationTests
(test/.../IntegrationTests.cs requires connection-string env vars)."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.conveyor import SourceSpec, plan_source
from conveyorbelt_spark.sources.jdbc import (
    sql_range_predicate,
    sql_shard_predicates,
)


def test_shard_predicates_shape():
    preds = sql_shard_predicates("MinuteKey", ["0636000000000000000", "0636000000600000000"])
    assert preds == [
        "MinuteKey = '0636000000000000000'",
        "MinuteKey = '0636000000600000000'",
    ]


def test_shard_predicates_escape_quotes():
    assert sql_shard_predicates("k", ["o'brien"]) == ["k = 'o''brien'"]


def test_unsafe_field_rejected():
    with pytest.raises(ValueError):
        sql_shard_predicates("k; DROP TABLE x", ["v"])
    with pytest.raises(ValueError):
        sql_range_predicate("a b", "1", "2")


def test_range_predicate():
    assert sql_range_predicate("pk", "10", "20") == "pk >= '10' AND pk <= '20'"


def test_registry_dispatches_sql_scheduler():
    """A SqlShardKeyQuery source plans minute keys like any other source;
    run_source routes its scan through read_sql_shards (unit: the plan)."""
    from datetime import datetime

    spec = SourceSpec(
        partition_key="db",
        row_key="orders",
        table_path="dbo.Orders",
        scheduler_type="SqlShardKeyQuery",
        last_offset_point="2016-01-01T00:00:00",
        custom={"jdbc_url": "jdbc:postgresql://example/db", "shard_field": "MinuteKey"},
    )
    keys, new_last = plan_source(spec, datetime(2016, 1, 1, 0, 10))
    assert len(keys) == 7  # minutes 00:01..00:07 (10 elapsed − 3 grace)
    assert new_last is not None


# --------------------------------------------------------------------------
# Wire test over embedded Apache Derby (ships in pyspark/jars for the Hive
# metastore) — a REAL JDBC round-trip: write a shard table through the JDBC
# sink, read it back through read_sql_shards' predicate partitions.
# Skips if the Derby driver is absent (non-Spark-bundled environments).
# --------------------------------------------------------------------------

def _derby_available() -> bool:
    import glob
    import os

    import pyspark

    return bool(glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar")))


@pytest.mark.skipif(not _derby_available(), reason="no embedded Derby jar")
def test_read_sql_shards_roundtrip_embedded_derby(spark, tmp_path_factory):
    from conveyorbelt_spark.sources.jdbc import read_sql_shards, read_sql_range

    db = str(tmp_path_factory.mktemp("derby") / "cbdb")
    url = f"jdbc:derby:{db};create=true"
    drv = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}

    rows = [(f"0636{i:015d}", i, f"msg-{i}") for i in range(40)]
    # Derby folds unquoted identifiers to upper case while the Spark JDBC
    # writer quotes exact-case names — use upper-case columns so the
    # reference-parity unquoted predicates resolve
    src = spark.createDataFrame(rows, "MINUTEKEY string, N int, MSG string")
    (
        src.write.format("jdbc").option("url", url).option("dbtable", "app.events")
        .option("driver", drv["driver"])
        # Derby maps StringType to CLOB, which literals can't compare to
        .option("createTableColumnTypes", "MINUTEKEY VARCHAR(32), MSG VARCHAR(64)")
        .mode("overwrite").save()
    )

    keys = [f"0636{i:015d}" for i in (3, 7, 11)]
    got = read_sql_shards(spark, url, "app.events", "MINUTEKEY", keys, **drv)
    assert got.rdd.getNumPartitions() == 3  # one predicate partition per key
    data = {r.MINUTEKEY: (r.N, r.MSG) for r in got.collect()}
    assert data == {k: (i, f"msg-{i}") for k, i in zip(keys, (3, 7, 11))}

    rng = read_sql_range(
        spark, url, "app.events", "MINUTEKEY",
        "0636000000000000005", "0636000000000000009", num_partitions=2, **drv,
    )
    assert sorted(r.N for r in rng.collect()) == [5, 6, 7, 8, 9]


@pytest.mark.skipif(not _derby_available(), reason="no embedded Derby jar")
def test_conveyor_sql_source_end_to_end(spark, tmp_path_factory):
    """Full conveyor cycle with scheduler_type=SqlShardKeyQuery: plan minute
    keys → partitioned JDBC scan → index delta — S3 wire-tested."""
    import datetime as dt

    from conveyorbelt_spark.conveyor import SourceRegistry, run_source
    from conveyorbelt_spark.index.query import bm25_topk
    from pyspark.sql import functions as F

    db = str(tmp_path_factory.mktemp("derby2") / "cbdb2")
    url = f"jdbc:derby:{db};create=true"
    drv = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}

    # shard-keyed docs: minute keys are .NET tick strings (d19)
    from conveyorbelt_spark.sources.planner import minute_shard_keys

    start = dt.datetime(2016, 9, 16, 5, 0, tzinfo=dt.timezone.utc)
    keys, _ = minute_shard_keys(start, start + dt.timedelta(minutes=9), grace_minutes=3)
    rows = [
        (k, f"https://db.example/{i}-{j}", f"term{(7 * i + j) % 50:05d} term00001")
        for i, k in enumerate(keys)
        for j in range(5)
    ]
    (
        spark.createDataFrame(rows, "SHARD_KEY string, URL string, TEXT string")
        .write.format("jdbc").option("url", url).option("dbtable", "app.docs")
        .option("driver", drv["driver"])
        .option(
            "createTableColumnTypes",
            "SHARD_KEY VARCHAR(32), URL VARCHAR(128), TEXT VARCHAR(256)",
        )
        .mode("overwrite").save()
    )

    idx = str(tmp_path_factory.mktemp("sqlidx"))
    reg = SourceRegistry(str(tmp_path_factory.mktemp("sqlreg") / "sources.json"))
    spec = SourceSpec(
        "db", "docs", "app.docs",
        scheduler_type="SqlShardKeyQuery",
        last_offset_point=(start - dt.timedelta(minutes=1)).isoformat(),
        ts_col="SHARD_KEY",
        custom={"jdbc_url": url, "shard_field": "SHARD_KEY", "jdbc_options": drv,
                "text_col": "TEXT"},
    )
    reg.save([spec])
    n = run_source(spark, spec, idx, reg, now=start + dt.timedelta(minutes=9))
    assert n == len(keys) * 5
    assert bm25_topk(spark, idx, "term00001", 5).count() == 5
