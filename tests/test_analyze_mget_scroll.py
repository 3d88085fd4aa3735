"""ES _analyze (token stream with increments + offsets), _mget (ordered
bulk point lookups, deleted docs found:false), and scroll (generator of
search_after-threaded pages, snapshot-pinned via one Searcher)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.delete import delete_docs
from conveyorbelt_spark.index.dsl import (
    UnsupportedDSL,
    analyze_body,
    mget,
    scroll_body,
    search_body,
)
from conveyorbelt_spark.index.query import Searcher


def test_analyze_body_plain_and_chain(tmp_path):
    r = analyze_body(None, {"text": "The Quick-Brown foxes 42 jumped"})
    toks = r["tokens"]
    assert [t["token"] for t in toks] == [
        "the", "quick", "brown", "foxes", "42", "jumped"
    ]
    assert [t["position"] for t in toks] == [0, 1, 2, 3, 4, 5]
    # offsets index the lowercased (same-length) text
    assert (toks[1]["start_offset"], toks[1]["end_offset"]) == (4, 9)
    assert toks[4]["type"] == "<NUM>" and toks[0]["type"] == "<ALPHANUM>"

    r2 = analyze_body(
        None,
        {
            "text": "The Quick-Brown foxes 42 jumped",
            "analyzer": {"stopwords": "english", "stem": "s"},
        },
    )
    toks2 = r2["tokens"]
    # 'the' dropped, positions keep the gap; 'foxes' minimal-stems to
    # 'foxe' (Lucene EnglishMinimalStemFilter semantics) but offsets
    # still cover the surface form
    assert [t["token"] for t in toks2] == ["quick", "brown", "foxe", "42", "jumped"]
    assert [t["position"] for t in toks2] == [1, 2, 3, 4, 5]
    fox = toks2[2]
    assert (fox["start_offset"], fox["end_offset"]) == (16, 21)

    with pytest.raises(UnsupportedDSL, match="text"):
        analyze_body(None, {})


def test_analyze_body_uses_index_analyzer(spark, tmp_path):
    out = str(tmp_path / "idx")
    docs = corpus_spark_df(spark, 30, seed=4, n_parts=1)
    build_index(
        spark, docs, out, n_buckets=2,
        analyzer={"stopwords": "english", "stem": "s"},
    )
    r = analyze_body(out, {"text": "the windows that joins"})
    assert [t["token"] for t in r["tokens"]] == ["window", "join"]
    assert [t["position"] for t in r["tokens"]] == [1, 3]
    # explicit override beats the index default
    r2 = analyze_body(out, {"text": "the windows", "analyzer": None})
    assert [t["token"] for t in r2["tokens"]] == ["the", "windows"]


def test_mget_and_deleted_termvectors(spark, tmp_path):
    out = str(tmp_path / "idx2")
    docs = with_doc_id(corpus_spark_df(spark, 60, seed=8, n_parts=1))
    build_index(spark, docs, out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text",))
    ids = [r.doc_id for r in docs.select("doc_id").orderBy("doc_id").collect()]

    resp = mget(out, {"ids": [ids[2], 12345, ids[0]]})
    assert [d["_id"] for d in resp["docs"]] == [ids[2], 12345, ids[0]]
    assert [d["found"] for d in resp["docs"]] == [True, False, True]
    assert "text" in resp["docs"][0]["_source"]

    # docs form
    resp2 = mget(out, {"docs": [{"_id": ids[1]}]})
    assert resp2["docs"][0]["found"]
    with pytest.raises(UnsupportedDSL):
        mget(out, {})

    # a fully deleted doc disappears from _mget and _termvectors
    delete_docs(spark, out, [ids[0]], op_id="d1")
    resp3 = mget(out, {"ids": [ids[0], ids[1]]})
    assert [d["found"] for d in resp3["docs"]] == [False, True]
    assert Searcher(spark, out).termvectors(ids[0]) == {
        "_id": ids[0], "found": False,
    }


def test_scroll_matches_from_size_truth(spark, tmp_path):
    out = str(tmp_path / "idx3")
    docs = corpus_spark_df(spark, 80, seed=13, n_parts=2)
    build_index(spark, docs, out, n_buckets=2)
    write_docstore(
        spark,
        with_doc_id(docs).withColumn(
            "nc", F.length("text").cast("long")
        ),
        out, url_col=None, extra_cols=("nc",),
    )

    body = {"query": {"match": {"text": "term00001 term00002"}},
            "track_total_hits": True}
    truth = search_body(spark, out, {**body, "size": 1000})["hits"]["hits"]
    assert len(truth) > 10

    pages = list(scroll_body(spark, out, {**body, "size": 7}))
    got = [h["_id"] for p in pages for h in p["hits"]["hits"]]
    assert got == [h["_id"] for h in truth]
    assert all(len(p["hits"]["hits"]) <= 7 for p in pages)
    # every page reports the same exact total
    assert {p["hits"]["total"]["value"] for p in pages} == {len(truth)}

    # field-sorted scroll agrees with the sorted truth
    sbody = {**body, "sort": [{"nc": "desc"}], "size": 9}
    struth = search_body(spark, out, {**body, "sort": [{"nc": "desc"}],
                                      "size": 1000})["hits"]["hits"]
    sgot = [
        h["_id"]
        for p in scroll_body(spark, out, sbody)
        for h in p["hits"]["hits"]
    ]
    assert sgot == [h["_id"] for h in struth]

    with pytest.raises(UnsupportedDSL, match="from"):
        next(scroll_body(spark, out, {**body, "from": 3}))
    with pytest.raises(UnsupportedDSL, match="search_after"):
        next(scroll_body(spark, out, {**body, "search_after": [1.0, 2]}))
