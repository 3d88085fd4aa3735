"""Point-in-time search: a PIT snapshot pins posting visibility, BM25
statistics, tombstones, and stored-version resolution — searches through
the PIT return the same pages while index_batch deltas, deletes, and
updates land underneath; live searches see the new state immediately."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.delete import delete_docs, update_docs
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body
from conveyorbelt_spark.index.pit import close_pit, open_pit
from conveyorbelt_spark.streaming.incremental import index_batch

N_DOCS = 400
QUERY = {"match": {"text": "term00000 term00001"}}


@pytest.fixture()
def mut_idx(spark, tmp_path):
    out = str(tmp_path / "pit_idx")
    docs = with_doc_id(corpus_spark_df(spark, N_DOCS, seed=29, n_parts=2))
    build_index(
        spark, docs.select("doc_id", "text"), out, url_col=None,
        n_buckets=4, store_cols=("text",),
    )
    return out


def test_pit_pins_visibility_and_stats(spark, mut_idx):
    """New delta docs and deletes are invisible through the PIT; the live
    view moves. Scores (df/avgdl-dependent) stay bit-identical too."""
    out = mut_idx
    pid = open_pit(out)
    before = search_body(spark, out, {"query": QUERY, "size": 10,
                                      "pit": {"id": pid}})
    hits0 = [(h["_id"], h["_score"]) for h in before["hits"]["hits"]]
    assert hits0

    # mutate: add docs stuffed with the query terms + delete the top hit
    extra = spark.createDataFrame(
        [(f"https://new/{i}", "term00000 term00001 " * 20) for i in range(30)],
        "url string, text string",
    )
    assert index_batch(spark, extra, out, 900, n_buckets=4) is True
    delete_docs(spark, out, [hits0[0][0]])

    live = search_body(spark, out, {"query": QUERY, "size": 10})
    live_hits = [(h["_id"], h["_score"]) for h in live["hits"]["hits"]]
    assert live_hits != hits0
    assert hits0[0][0] not in {d for d, _ in live_hits}

    again = search_body(spark, out, {"query": QUERY, "size": 10,
                                     "pit": {"id": pid}})
    assert [(h["_id"], h["_score"]) for h in again["hits"]["hits"]] == hits0
    assert close_pit(pid) is True
    assert close_pit(pid) is False
    with pytest.raises(ValueError, match="unknown or closed"):
        search_body(spark, out, {"query": QUERY, "pit": {"id": pid}})


def test_pit_deep_pagination_is_seamless(spark, mut_idx):
    """The PIT use case: score-order search_after pages taken BEFORE and
    AFTER a mutation tile the frozen ranking with no gap or repeat."""
    out = mut_idx
    pid = open_pit(out)
    full = search_body(spark, out, {"query": QUERY, "size": 30,
                                    "pit": {"id": pid}})
    want = [(h["_id"], h["_score"]) for h in full["hits"]["hits"]]
    p1 = search_body(spark, out, {"query": QUERY, "size": 10,
                                  "pit": {"id": pid}, "sort": ["_score"]})
    cur = p1["hits"]["hits"][-1]["sort"]
    # mutate between pages
    extra = spark.createDataFrame(
        [("https://new/x", "term00000 term00001 " * 30)],
        "url string, text string",
    )
    assert index_batch(spark, extra, out, 901, n_buckets=4) is True
    p2 = search_body(spark, out, {
        "query": QUERY, "size": 10, "pit": {"id": pid},
        "search_after": cur, "sort": ["_score"],
    })
    got = (
        [(h["_id"], h["_score"]) for h in p1["hits"]["hits"]]
        + [(h["_id"], h["_score"]) for h in p2["hits"]["hits"]]
    )
    assert got == want[:len(got)]
    close_pit(pid)


def test_pit_pins_stored_source(spark, mut_idx):
    """An update after the open serves the NEW _source live and the OLD
    _source through the PIT (stored-version snapshot)."""
    out = mut_idx
    base = search_body(spark, out, {"query": QUERY, "size": 1,
                                    "_source": True})
    d = base["hits"]["hits"][0]["_id"]
    old_text = base["hits"]["hits"][0]["_source"]["text"]
    pid = open_pit(out)
    upd = spark.createDataFrame(
        [(d, "term00000 term00001 rewritten")], "doc_id long, text string"
    )
    update_docs(spark, upd, out, 902, url_col=None, n_buckets=4,
                store_cols=("text",))
    live = search_body(spark, out, {"query": {"match": {"text": "rewritten"}},
                                    "size": 5, "_source": True})
    live_src = {h["_id"]: h["_source"]["text"] for h in live["hits"]["hits"]}
    assert live_src.get(d) == "term00000 term00001 rewritten"
    # through the PIT, d is still the pre-update top hit and serves the
    # pre-update stored text
    pinned = search_body(spark, out, {"query": QUERY, "size": 1,
                                      "_source": True, "pit": {"id": pid}})
    assert pinned["hits"]["hits"][0]["_id"] == d
    assert pinned["hits"]["hits"][0]["_source"]["text"] == old_text
    close_pit(pid)


def test_pit_guards(spark, mut_idx):
    out = mut_idx
    pid = open_pit(out)
    with pytest.raises(UnsupportedDSL, match="live index state"):
        search_body(spark, out, {"query": QUERY, "pit": {"id": pid},
                                 "aggs": {"x": {"terms": {"field": "lang"}}}})
    with pytest.raises(UnsupportedDSL, match="live index state"):
        search_body(spark, out, {"query": QUERY, "pit": {"id": pid},
                                 "track_total_hits": True})
    with pytest.raises(UnsupportedDSL, match="serving kernel shapes"):
        search_body(spark, out, {"query": {"prefix": {"text": "term"}},
                                 "pit": {"id": pid}})
    with pytest.raises(UnsupportedDSL, match="different index"):
        search_body(spark, "/some/other/idx", {"query": QUERY,
                                               "pit": {"id": pid}})
    with pytest.raises(UnsupportedDSL, match="index dir or a pit"):
        search_body(spark, None, {"query": QUERY})
    close_pit(pid)
