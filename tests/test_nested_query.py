"""ES nested query (filter context) over stored array<struct> columns:
same-element semantics (conditions must hold on ONE array element, the
thing a flattened object mapping gets wrong), null/absent arrays never
match, exact totals, guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.dsl import UnsupportedDSL, count_body, search_body
from conveyorbelt_spark.index.query import nested_filter_ids

N_DOCS = 400


@pytest.fixture(scope="module")
def nidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nested_idx"))
    docs = with_doc_id(corpus_spark_df(spark, N_DOCS, seed=17, n_parts=2))
    # two comments per doc with entangled fields: one element has
    # (author=alice, stars=doc_id%5), the other (author=bob,
    # stars=(doc_id+2)%5) — so "alice AND stars>=4" differs from the
    # flattened cross-element reading; every third doc has NO comments
    a = F.struct(
        F.lit("alice").alias("author"),
        F.pmod(F.col("doc_id"), F.lit(5)).cast("long").alias("stars"),
    )
    b = F.struct(
        F.lit("bob").alias("author"),
        F.pmod(F.col("doc_id") + 2, F.lit(5)).cast("long").alias("stars"),
    )
    docs = docs.withColumn(
        "comments",
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit(None))
        .otherwise(F.array(a, b)),
    )
    build_index(
        spark, docs.select("doc_id", "text", "comments"), out, url_col=None,
        n_buckets=4, store_cols=("comments",),
    )
    rows = docs.select("doc_id", "comments").collect()
    truth = {
        r.doc_id: [(c.author, c.stars) for c in (r.comments or [])]
        for r in rows
    }
    return out, truth


def _want(truth, pred):
    return sorted(d for d, cs in truth.items() if any(pred(a, s) for a, s in cs))


def test_nested_same_element_semantics(spark, nidx):
    """alice AND stars>=4 must hold on ONE element; docs where alice has
    <4 stars but bob has >=4 must NOT match (the flattened reading
    would include them)."""
    out, truth = nidx
    clauses = [("term", "author", "alice"), ("range", "stars", {"gte": 4})]
    got = sorted(
        r.doc_id for r in nested_filter_ids(spark, out, "comments", clauses).collect()
    )
    want = _want(truth, lambda a, s: a == "alice" and s >= 4)
    assert got == want and got
    # the flattened (wrong) reading is strictly larger on this fixture
    cross = sorted(
        d for d, cs in truth.items()
        if any(a == "alice" for a, _ in cs) and any(s >= 4 for _, s in cs)
    )
    assert set(want) < set(cross)


def test_nested_clause_kinds(spark, nidx):
    """terms / exists / bounded range clause kinds, and null arrays
    never match."""
    out, truth = nidx
    got = sorted(
        r.doc_id
        for r in nested_filter_ids(
            spark, out, "comments", [("terms", "author", ["bob", "carol"])]
        ).collect()
    )
    assert got == _want(truth, lambda a, s: a in ("bob", "carol"))
    got = sorted(
        r.doc_id
        for r in nested_filter_ids(
            spark, out, "comments", [("exists", "author", None)]
        ).collect()
    )
    # exists(author) == any comments at all (docs with None arrays out)
    assert got == sorted(d for d, cs in truth.items() if cs)
    got = sorted(
        r.doc_id
        for r in nested_filter_ids(
            spark, out, "comments",
            [("range", "stars", {"gt": 1, "lte": 3}), ("term", "author", "bob")],
        ).collect()
    )
    assert got == _want(truth, lambda a, s: a == "bob" and 1 < s <= 3)


def test_nested_dsl(spark, nidx):
    """The ES body: nested bool.must through search_body with exact
    totals and the _count twin; doc_id-ordered constant-score hits."""
    out, truth = nidx
    body = {
        "query": {"nested": {
            "path": "comments",
            "query": {"bool": {"must": [
                {"term": {"comments.author": "alice"}},
                {"range": {"comments.stars": {"gte": 4}}},
            ]}},
        }},
        "size": 5, "track_total_hits": True,
    }
    resp = search_body(spark, out, body)
    want = _want(truth, lambda a, s: a == "alice" and s >= 4)
    assert [h["_id"] for h in resp["hits"]["hits"]] == want[:5]
    assert all(h["_score"] == 1.0 for h in resp["hits"]["hits"])
    assert resp["hits"]["total"] == {"value": len(want), "relation": "eq"}
    assert count_body(spark, out, {"query": body["query"]}) == {
        "count": len(want)
    }
    # single bare clause (no bool wrapper)
    one = search_body(spark, out, {
        "query": {"nested": {
            "path": "comments",
            "query": {"term": {"comments.author": "bob"}},
        }},
        "size": 3,
    })
    wb = _want(truth, lambda a, s: a == "bob")
    assert [h["_id"] for h in one["hits"]["hits"]] == wb[:3]


def test_nested_guards(spark, nidx):
    out, _ = nidx
    ok = {"path": "comments",
          "query": {"term": {"comments.author": "alice"}}}
    with pytest.raises(UnsupportedDSL, match="under path"):
        search_body(spark, out, {"query": {"nested": {
            "path": "comments", "query": {"term": {"author": "alice"}}}}})
    with pytest.raises(UnsupportedDSL, match="inner_hits"):
        search_body(spark, out, {"query": {"nested": {**ok, "inner_hits": {}}}})
    with pytest.raises(UnsupportedDSL, match="sub-clauses"):
        search_body(spark, out, {"query": {"nested": {
            "path": "comments",
            "query": {"match": {"comments.author": "alice"}}}}})
    with pytest.raises(UnsupportedDSL, match="filter-context retrieval"):
        search_body(spark, out, {"query": {"nested": ok},
                                 "sort": [{"doc_id": "asc"}]})
    with pytest.raises(UnsupportedDSL, match="filter-context retrieval"):
        search_body(spark, out, {"query": {"nested": ok},
                                 "aggs": {"n": {"terms": {"field": "lang"}}}})
