"""ES terms_set query: per-doc minimum_should_match read from a stored
numeric field, score = the bool-should BM25 sum over the doc's matched
terms — bit-exact vs a pure-python truth on both the matching set and
the top-k page, plus the DSL surface (track_total_hits, guard rails)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body
from conveyorbelt_spark.index.oracle import BM25Oracle
from conveyorbelt_spark.index.query import terms_set_match, terms_set_topk

N_DOCS = 700
TERMS = ["term00000", "term00001", "term00002", "term00003"]


@pytest.fixture(scope="module")
def tsidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ts_idx"))
    docs = with_doc_id(corpus_spark_df(spark, N_DOCS, seed=41, n_parts=3))
    # per-doc required-match counts 1..4 (ES: a field the ingest wrote)
    docs = docs.withColumn(
        "req", (F.pmod(F.col("doc_id"), F.lit(4)) + 1).cast("long")
    )
    build_index(
        spark, docs.select("doc_id", "text", "req"), out, url_col=None,
        n_buckets=8, store_cols=("req",),
    )
    rows = docs.select("doc_id", "text", "req").collect()
    oracle = BM25Oracle([(r.doc_id, r.text) for r in rows])
    req = {r.doc_id: int(r.req) for r in rows}
    return out, oracle, req


def _truth(oracle, req, terms, k=None):
    """Pure-python terms_set: docs containing >= req[doc] of the exact
    terms; score = ascending-term BM25 sum (the kernel's association)."""
    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for t in sorted(set(terms)):
        ti = oracle.idf(t)
        for d, tf in oracle.postings.get(t, {}).items():
            dl = oracle.dl[d]
            w = (tf * (oracle.k1 + 1.0)) / (
                tf + oracle.k1 * (1.0 - oracle.b + oracle.b * (dl / oracle.avgdl))
            )
            scores[d] = scores.get(d, 0.0) + ti * w
            counts[d] = counts.get(d, 0) + 1
    hits = [(d, s) for d, s in scores.items() if counts[d] >= req[d]]
    hits.sort(key=lambda kv: (-kv[1], kv[0]))
    return hits[:k] if k else hits


def test_terms_set_matches_truth(spark, tsidx):
    """Distributed matching set and top-k page match the python truth
    bit for bit (score association pinned to the WAND kernel's)."""
    out, oracle, req = tsidx
    want = _truth(oracle, req, TERMS)
    got_all = {
        r.doc_id: r.score
        for r in terms_set_match(spark, out, TERMS, "req").collect()
    }
    assert got_all == dict(want)
    got_top = [
        (r.doc_id, r.score)
        for r in terms_set_topk(spark, out, TERMS, "req", 15).collect()
    ]
    assert got_top == want[:15]
    # at least one doc matched per req level, and high-req docs really
    # needed more terms (the fixture exercises every threshold)
    matched_reqs = {req[d] for d, _ in want}
    assert matched_reqs == {1, 2, 3, 4}


def test_terms_set_absent_and_unknown_terms(spark, tsidx):
    """Terms indexed nowhere drop out of both the score and the count;
    an all-unknown terms list matches nothing."""
    out, oracle, req = tsidx
    withghost = TERMS[:2] + ["zzzz_not_a_term"]
    want = _truth(oracle, req, TERMS[:2])
    got = {
        r.doc_id: r.score
        for r in terms_set_match(spark, out, withghost, "req").collect()
    }
    assert got == dict(want)
    assert terms_set_match(spark, out, ["zzzz_not_a_term"], "req").count() == 0


def test_terms_set_dsl(spark, tsidx):
    """The ES body shape: hits page + exact track_total_hits, and the
    _count API twin."""
    out, oracle, req = tsidx
    body = {
        "query": {"terms_set": {"text": {
            "terms": TERMS, "minimum_should_match_field": "req",
        }}},
        "size": 10, "track_total_hits": True,
    }
    resp = search_body(spark, out, body)
    want = _truth(oracle, req, TERMS)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want[:10]
    assert resp["hits"]["total"] == {"value": len(want), "relation": "eq"}

    from conveyorbelt_spark.index.dsl import count_body

    got = count_body(spark, out, {"query": body["query"]})
    assert got == {"count": len(want)}


def test_terms_set_guards(spark, tsidx):
    """Non-main fields, scripts, empty terms, sort, and aggs are honest
    rejections, never silent misparses."""
    out, _oracle, _req = tsidx
    with pytest.raises(UnsupportedDSL, match="main text field"):
        search_body(spark, out, {"query": {"terms_set": {"lang": {
            "terms": ["en"], "minimum_should_match_field": "req"}}}})
    with pytest.raises(UnsupportedDSL, match="minimum_should_match_field"):
        search_body(spark, out, {"query": {"terms_set": {"text": {
            "terms": TERMS,
            "minimum_should_match_script": {"source": "params.n"}}}}})
    with pytest.raises(UnsupportedDSL, match="non-empty terms"):
        search_body(spark, out, {"query": {"terms_set": {"text": {
            "terms": [], "minimum_should_match_field": "req"}}}})
    ok = {"terms": TERMS, "minimum_should_match_field": "req"}
    with pytest.raises(UnsupportedDSL, match="relevance only"):
        search_body(spark, out, {
            "query": {"terms_set": {"text": ok}},
            "sort": [{"req": "desc"}],
        })
    with pytest.raises(UnsupportedDSL, match="aggs"):
        search_body(spark, out, {
            "query": {"terms_set": {"text": ok}},
            "aggs": {"by_req": {"terms": {"field": "req"}}},
        })
