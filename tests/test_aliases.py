"""Index aliases + multi-index search: the ES daily-rotation idiom
(writers push to dated indexes, readers query one alias). Merge is ES
query_then_fetch — per-index statistics, coordinating-node-style reduce."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.aliases import (
    get_aliases,
    search_body_alias,
    search_body_multi,
    update_aliases,
)
from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body


def _two_indexes(spark, tmp_path):
    docs = with_doc_id(corpus_spark_df(spark, 120, seed=29, n_parts=2))
    a = docs.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    b = docs.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    da, db = str(tmp_path / "idx-2026.01.01"), str(tmp_path / "idx-2026.01.02")
    for d, part in ((da, a), (db, b)):
        build_index(spark, part, d, url_col=None, n_buckets=2)
        write_docstore(
            spark,
            part.withColumn("nc", F.length("text").cast("long")),
            d, url_col=None, extra_cols=("nc",),
        )
    return da, db


def test_alias_registry(tmp_path):
    reg = str(tmp_path / "reg")
    update_aliases(reg, {"actions": [
        {"add": {"index": "/data/idx-a", "alias": "logs"}},
        {"add": {"index": "/data/idx-b", "alias": "logs"}},
    ]})
    assert get_aliases(reg, "logs") == {"logs": ["/data/idx-a", "/data/idx-b"]}
    update_aliases(reg, {"actions": [
        {"remove": {"index": "/data/idx-a", "alias": "logs"}},
    ]})
    assert get_aliases(reg)["logs"] == ["/data/idx-b"]
    update_aliases(reg, {"actions": [{"remove_index": {"index": "/data/idx-b"}}]})
    assert get_aliases(reg) == {}
    with pytest.raises(UnsupportedDSL):
        update_aliases(reg, {"actions": [{"rename": {"x": 1}}]})
    with pytest.raises(ValueError, match="matched no"):
        update_aliases(reg, {"actions": [
            {"add": {"index": str(tmp_path / "nope-*"), "alias": "x"}},
        ]})


def test_multi_index_search_merges_like_es(spark, tmp_path):
    da, db = _two_indexes(spark, tmp_path)
    body = {"query": {"match": {"text": "term00001 term00003"}},
            "size": 15, "track_total_hits": True}

    ra = search_body(spark, da, {**body, "size": 200})["hits"]
    rb = search_body(spark, db, {**body, "size": 200})["hits"]
    manual = sorted(
        [(h["_score"], h["_id"], da) for h in ra["hits"]]
        + [(h["_score"], h["_id"], db) for h in rb["hits"]],
        key=lambda t: (-t[0], t[1], t[2]),
    )[:15]

    got = search_body_multi(spark, [da, db], body)
    hits = got["hits"]["hits"]
    assert [(h["_score"], h["_id"], h["_index"]) for h in hits] == manual
    assert got["hits"]["total"] == {
        "value": ra["total"]["value"] + rb["total"]["value"],
        "relation": "eq",
    }
    # both indexes surface once the merge window is wide enough
    wide = search_body_multi(spark, [da, db], {**body, "size": 120})
    assert {h["_index"] for h in wide["hits"]["hits"]} == {da, db}

    # from/size pages the MERGED ranking
    page2 = search_body_multi(spark, [da, db], {**body, "from": 5, "size": 5})
    assert [h["_id"] for h in page2["hits"]["hits"]] == [
        t[1] for t in manual[5:10]
    ]


def test_multi_index_sorted_and_alias(spark, tmp_path):
    da, db = _two_indexes(spark, tmp_path)
    reg = str(tmp_path / "reg")
    update_aliases(reg, {"actions": [
        {"add": {"index": str(tmp_path / "idx-*"), "alias": "logs"}},
    ]})
    assert get_aliases(reg, "logs") == {"logs": [da, db]}

    body = {"query": {"match": {"text": "term00001"}},
            "sort": [{"nc": "desc"}], "size": 12}
    got = search_body_alias(spark, reg, "logs", body)["hits"]["hits"]
    ra = search_body(spark, da, {**body, "size": 200})["hits"]["hits"]
    rb = search_body(spark, db, {**body, "size": 200})["hits"]["hits"]
    manual = sorted(
        ra + rb, key=lambda h: (-h["sort"][0], h["sort"][1])
    )[:12]
    assert [h["_id"] for h in got] == [h["_id"] for h in manual]
    # descending by the stored sort key across BOTH indexes
    ncs = [h["sort"][0] for h in got]
    assert ncs == sorted(ncs, reverse=True)

    with pytest.raises(ValueError, match="unknown alias"):
        search_body_alias(spark, reg, "nope", body)
    with pytest.raises(UnsupportedDSL, match="aggs"):
        search_body_multi(spark, [da, db], {
            "query": {"match": {"text": "x"}},
            "aggs": {"a": {"terms": {"field": "nc"}}},
        })
