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
