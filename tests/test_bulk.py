"""ES _bulk: NDJSON action stream (index/create/update/delete with
explicit ids — the reference pusher's contract, NestBatchPusher.cs:68-82),
sequential per-doc semantics, net effect applied as one delete pass + one
update delta run, ES-shaped per-item responses."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.dsl import (
    UnsupportedDSL,
    bulk_body,
    count_body,
    mget,
    search_body,
)

N = 50


def _setup(spark, tmp_path, name):
    out = str(tmp_path / name)
    docs = with_doc_id(corpus_spark_df(spark, N, seed=19, n_parts=1))
    build_index(spark, docs, out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text",))
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    return out, ids


def test_bulk_mixed_actions(spark, tmp_path):
    out, ids = _setup(spark, tmp_path, "idx")
    new_id = max(ids) + 1000
    payload = "\n".join(
        json.dumps(x) for x in [
            {"index": {"_id": new_id}},
            {"text": "brandnew bulk document xyzterm", "url": "u://new"},
            {"update": {"_id": ids[0]}},
            {"doc": {"text": "patched text abcterm"}},
            {"delete": {"_id": ids[1]}},
            {"delete": {"_id": 999_999_999}},          # not found, no error
            {"create": {"_id": ids[2]}},               # conflict → error item
            {"text": "should conflict"},
            {"update": {"_id": 888_888_888}},          # missing → error item
            {"doc": {"text": "nope"}},
            {"create": {"_id": new_id + 1}},
            {"text": "created via create", "url": "u://c"},
        ]
    )
    resp = bulk_body(spark, out, payload, batch_id="b1")
    assert resp["errors"] is True
    st = [next(iter(i.values()))["status"] for i in resp["items"]]
    assert st == [201, 200, 200, 404, 409, 404, 201]
    ops = [next(iter(i.keys())) for i in resp["items"]]
    assert ops == ["index", "update", "delete", "delete", "create", "update",
                   "create"]

    # net state through the query path
    assert count_body(spark, out, {"query": {"match": {"text": "xyzterm"}}}) \
        == {"count": 1}
    assert count_body(spark, out, {"query": {"match": {"text": "abcterm"}}}) \
        == {"count": 1}
    hits = search_body(
        spark, out, {"query": {"match": {"text": "abcterm"}}, "size": 2}
    )["hits"]["hits"]
    assert [h["_id"] for h in hits] == [ids[0]]
    # deleted doc is gone everywhere
    m = mget(out, {"ids": [ids[1], new_id, new_id + 1]})
    assert [d["found"] for d in m["docs"]] == [False, True, True]
    assert m["docs"][1]["_source"]["text"] == "brandnew bulk document xyzterm"

    # total doc count: N - 1 deleted + 2 new
    assert count_body(spark, out, {"query": {"match_all": {}}}) == {
        "count": N + 1
    }


def test_bulk_sequential_per_doc(spark, tmp_path):
    out, ids = _setup(spark, tmp_path, "idx2")
    d = ids[0]
    payload = [
        {"delete": {"_id": d}},
        {"index": {"_id": d}}, {"text": "reborn seqterm"},
        {"update": {"_id": d}}, {"doc": {"text": "reborn seqterm patched"}},
    ]
    resp = bulk_body(spark, out, payload, batch_id="b2")
    assert resp["errors"] is False
    st = [next(iter(i.values()))["status"] for i in resp["items"]]
    assert st == [200, 201, 200]   # delete, then created (was dead), update
    assert mget(out, {"ids": [d]})["docs"][0]["_source"]["text"] \
        == "reborn seqterm patched"
    assert count_body(spark, out, {"query": {"match": {"text": "patched"}}}) \
        == {"count": 1}

    # doc_as_upsert on a missing doc
    resp2 = bulk_body(
        spark, out,
        [{"update": {"_id": 777}},
         {"doc": {"text": "upserted"}, "doc_as_upsert": True}],
        batch_id="b3",
    )
    assert resp2["errors"] is False
    assert mget(out, {"ids": [777]})["docs"][0]["found"]


def test_bulk_guards(spark, tmp_path):
    out, ids = _setup(spark, tmp_path, "idx3")
    with pytest.raises(UnsupportedDSL, match="_id"):
        bulk_body(spark, out, [{"index": {}}, {"text": "x"}], batch_id="g1")
    with pytest.raises(UnsupportedDSL, match="unsupported bulk action"):
        bulk_body(spark, out, [{"upsert": {"_id": 1}}], batch_id="g2")
    with pytest.raises(UnsupportedDSL, match="source line"):
        bulk_body(spark, out, [{"index": {"_id": 1}}], batch_id="g3")
    with pytest.raises(UnsupportedDSL, match="non-stored fields"):
        bulk_body(
            spark, out,
            [{"index": {"_id": 1}}, {"text": "x", "bogus": 1}],
            batch_id="g4",
        )
