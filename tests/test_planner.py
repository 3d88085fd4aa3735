"""Planner math, shard keys, SimpleFilter truth table, IndexNamer,
FileOffset round-trips (reference tests: MinuteTableShardSchedulerTests.cs,
FilterTests.cs, IndexNamerTests.cs, FileOffsetTests.cs)."""

from __future__ import annotations

import datetime as dt

from conveyorbelt_spark.sources.planner import (
    FileOffset,
    from_ticks,
    index_name,
    minute_shard_keys,
    shard_key_time,
    simple_filter,
    to_ticks,
)

T0 = dt.datetime(2016, 9, 16, 5, 0, 0, tzinfo=dt.timezone.utc)


def test_planner_57_shards():
    # 1h backlog, grace 3 ⇒ exactly 57 minute shards
    # (MinuteTableShardSchedulerTests.cs:22-39)
    keys, new_last = minute_shard_keys(T0, T0 + dt.timedelta(hours=1), grace_minutes=3)
    assert len(keys) == 57
    assert new_last == T0 + dt.timedelta(minutes=57)
    assert all(len(k) == 19 and k.isdigit() for k in keys)
    assert shard_key_time(keys[0]) == T0 + dt.timedelta(minutes=1)


def test_planner_max_items_cap():
    keys, _ = minute_shard_keys(
        T0, T0 + dt.timedelta(hours=2), grace_minutes=3, max_items=10
    )
    assert len(keys) == 10


def test_salted_keys():
    keys, _ = minute_shard_keys(
        T0, T0 + dt.timedelta(minutes=10), grace_minutes=3, key_style="salted"
    )
    # 10 salts per minute (Modulo10MinuteTableShardScheduler.cs:13-28)
    assert len(keys) % 10 == 0
    assert keys[0].startswith("0000000000000000000___")
    assert keys[9].startswith("0000000000000000009___")
    assert shard_key_time(keys[0]) == T0 + dt.timedelta(minutes=1)


def test_key_encodings():
    d18, _ = minute_shard_keys(T0, T0 + dt.timedelta(minutes=5), grace_minutes=3, key_style="d18")
    rev, _ = minute_shard_keys(T0, T0 + dt.timedelta(minutes=5), grace_minutes=3, key_style="reverse")
    assert all(len(k) == 18 for k in d18)
    assert all(len(k) == 19 for k in rev)


def test_ticks_roundtrip():
    assert from_ticks(to_ticks(T0)) == T0
    assert to_ticks(dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)) == 621355968000000000


def test_simple_filter_truth_table(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a", True, None), (2, 15.0, "b", False, "x"), (3, None, "c", None, "y")],
        "id long, level double, name string, flag boolean, maybe string",
    )
    def ids(expr):
        return sorted(r.id for r in df.filter(simple_filter(expr)).collect())

    # NULL level on row 3 → PASSES (SimpleFilter.cs:54-55)
    assert ids("level > 10") == [2, 3]
    assert ids("level <= 5") == [1, 3]
    assert ids("name == b") == [2]
    assert ids("name != b") == [1, 3]
    assert ids("flag == true") == [1, 3]
    # invalid: no operator / multiple operators ⇒ accept all
    assert ids("gibberish") == [1, 2, 3]
    assert ids("a > 1 < 2") == [1, 2, 3]
    assert ids(None) == [1, 2, 3]
    # pipe OR
    assert ids("name == a|name == b") == [1, 2]


def test_index_namer():
    # IndexNamerTests.cs:17-48 shape
    assert index_name("2016-09-16T05:00:00", "WADLogsTable") == "20160916"
    assert index_name("2016-09-16T05:00:00", "WADLogsTable", prefix="cb-") == "cb-20160916"
    assert (
        index_name("2016-09-16T05:00:00", "WADLogsTable", prefix="cb-", one_index_per_type=True)
        == "cb-wadlogstable-20160916"
    )
    assert index_name(None, "T", prefix="p-") == "p-"
    assert index_name(None, "T", prefix="p-", one_index_per_type=True) == "p-t"


def test_file_offset_roundtrip():
    fo = FileOffset(T0, "u_ex16091605.log", 1024)
    parsed = FileOffset.parse(fo.render())
    assert parsed.file_name == "u_ex16091605.log"
    assert parsed.position == 1024
    assert parsed.time_offset == T0
    # invalid forms (FileOffsetTests.cs:14-25)
    assert FileOffset.parse(None) is None
    assert FileOffset.parse("") is None
    assert FileOffset.parse("notadate\tf\t1") is None
    assert FileOffset.parse("a\tb\tc\td") is None
    assert FileOffset.parse("2016-09-16T05:00:00+00:00\tf\tNaN") is None
    # timestamp-only offset still parses (LastOffsetPoint ISO form)
    assert FileOffset.parse("2016-09-16T05:00:00+00:00").position == 0
