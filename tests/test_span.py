"""span_near / span_term queries over the positional index: ordered
(greedy-chain window) and unordered (anchor-window) span matching with
BM25 spanFreq scoring, bit-exact vs the pure-python oracle on BOTH the
zero-job serving path and the distributed Spark path, plus the ES DSL
surface (clauses, slop, in_order, track_total_hits)."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body
from conveyorbelt_spark.index.oracle import BM25Oracle
from conveyorbelt_spark.index.query import (
    Searcher,
    span_near_doc_ids,
    span_near_topk,
)

N_DOCS = 900


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("span_idx"))
    docs = corpus_spark_df(spark, N_DOCS, seed=33, n_parts=3)
    build_index(spark, docs, out, n_buckets=8, positions=True)
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    return out, BM25Oracle([(r.doc_id, r.text) for r in rows])


CASES = [
    (["term00000", "term00001"], 0, True),
    (["term00000", "term00001"], 2, True),
    (["term00001", "term00000"], 3, True),
    (["term00000", "term00001"], 1, False),
    (["term00000", "term00002", "term00005"], 4, True),
    (["term00005", "term00002", "term00000"], 6, False),
]


@pytest.mark.parametrize("terms,slop,in_order", CASES)
def test_span_near_matches_oracle(spark, sidx, terms, slop, in_order):
    """Serving rows, Spark top-k, and the uncapped doc-id set all match
    the pure-python span truth bit for bit."""
    out, oracle = sidx
    want = oracle.span_near_search(terms, 10, slop=slop, in_order=in_order)
    s = Searcher(spark, out)
    got = s.span_near_rows(terms, 10, slop=slop, in_order=in_order)
    assert got == want, (terms, slop, in_order)
    via_spark = [
        (r.doc_id, r.score)
        for r in span_near_topk(
            spark, out, terms, 10, slop=slop, in_order=in_order
        ).collect()
    ]
    assert via_spark == want
    all_want = {
        d for d, _ in oracle.span_near_search(
            terms, 10**6, slop=slop, in_order=in_order
        )
    }
    all_got = {
        r.doc_id
        for r in span_near_doc_ids(
            spark, out, terms, slop=slop, in_order=in_order
        ).collect()
    }
    assert all_got == all_want


def test_span_semantics_pinned(spark, tmp_path_factory):
    """Hand-built docs pin the window arithmetic: adjacency at slop=0,
    one intervening token needs slop=1, reversed order only matches
    unordered, spanFreq counts anchors."""
    out = str(tmp_path_factory.mktemp("span_pin"))
    docs = [
        (0, "alpha beta gap"),           # adjacent, in order
        (1, "alpha gap beta"),           # one gap
        (2, "beta alpha gap"),           # reversed, adjacent
        (3, "alpha gap gap gap beta"),   # three gaps
        (4, "alpha beta alpha beta x"),  # two ordered matches
    ]
    spark_df = spark.createDataFrame(docs, "doc_id long, text string")
    build_index(spark, spark_df, out, url_col=None, n_buckets=2, positions=True)
    s = Searcher(spark, out)

    def ids(terms, slop, in_order):
        return sorted(
            d for d, _ in s.span_near_rows(
                terms, 100, slop=slop, in_order=in_order
            )
        )

    assert ids(["alpha", "beta"], 0, True) == [0, 4]
    assert ids(["alpha", "beta"], 1, True) == [0, 1, 4]
    assert ids(["alpha", "beta"], 3, True) == [0, 1, 3, 4]
    assert ids(["alpha", "beta"], 0, False) == [0, 2, 4]
    assert ids(["beta", "alpha"], 0, True) == [2, 4]
    # spanFreq: doc 4 has two ordered (alpha, beta) anchors, doc 0 one —
    # same dl would rank 4 first; both dl=5 vs 3: just assert pf order
    rows = s.span_near_rows(["alpha", "beta"], 10, slop=0, in_order=True)
    assert rows[0][0] == 4  # two anchors beat one at comparable dl


def test_span_dsl_surface(spark, sidx):
    """The ES body shape: span_near with span_term clauses (dict and bare
    values), slop / in_order knobs, exact track_total_hits; a lone
    span_term scores identically to the one-term match; malformed bodies
    raise UnsupportedDSL."""
    out, oracle = sidx
    terms = ["term00000", "term00001"]
    body = {
        "query": {"span_near": {
            "clauses": [
                {"span_term": {"text": {"value": terms[0]}}},
                {"span_term": {"text": terms[1]}},
            ],
            "slop": 2, "in_order": False,
        }},
        "size": 10, "track_total_hits": True,
    }
    resp = search_body(spark, out, body)
    want = oracle.span_near_search(terms, 10, slop=2, in_order=False)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want
    assert resp["hits"]["total"] == {
        "value": len(oracle.span_near_search(terms, 10**6, slop=2,
                                             in_order=False)),
        "relation": "eq",
    }

    one = search_body(spark, out, {
        "query": {"span_term": {"text": {"value": "term00000"}}}, "size": 5,
    })
    match = search_body(spark, out, {
        "query": {"match": {"text": "term00000"}}, "size": 5,
    })
    assert one["hits"]["hits"] == match["hits"]["hits"]

    with pytest.raises(UnsupportedDSL, match="two span clauses"):
        search_body(spark, out, {
            "query": {"span_near": {
                "clauses": [{"span_term": {"text": "term00000"}}],
            }},
        })
    with pytest.raises(UnsupportedDSL, match="span_term / span_or"):
        search_body(spark, out, {
            "query": {"span_near": {
                "clauses": [{"match": {"text": "x"}},
                            {"span_term": {"text": "y"}}],
            }},
        })
    with pytest.raises(ValueError, match="duplicate"):
        search_body(spark, out, {
            "query": {"span_near": {
                "clauses": [{"span_term": {"text": "term00000"}},
                            {"span_term": {"text": "term00000"}}],
            }},
        })


def test_span_needs_positions(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("span_nopos"))
    docs = corpus_spark_df(spark, 50, seed=7, n_parts=1)
    build_index(spark, docs, out, n_buckets=2, positions=False)
    with pytest.raises(ValueError, match="positions"):
        span_near_topk(spark, out, ["term00000", "term00001"], 5)


def test_intervals_dsl(spark, sidx):
    """ES intervals bodies reduce exactly to the span kernel: a match
    rule with max_gaps/ordered equals the corresponding span_near (hits
    and totals), all_of over single-term matches composes the same
    clause list, a one-term source is the plain match, and the ES
    unbounded default (max_gaps absent or -1) is rejected rather than
    misparsed."""
    out, oracle = sidx
    terms = ["term00000", "term00001"]
    resp = search_body(spark, out, {
        "query": {"intervals": {"text": {"match": {
            "query": " ".join(terms), "max_gaps": 2, "ordered": True,
        }}}},
        "size": 10, "track_total_hits": True,
    })
    want = oracle.span_near_search(terms, 10, slop=2, in_order=True)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want
    assert resp["hits"]["total"] == {
        "value": len(oracle.span_near_search(terms, 10**6, slop=2,
                                             in_order=True)),
        "relation": "eq",
    }

    # unordered is the ES default; all_of composes single-term matches
    tri = ["term00000", "term00002", "term00005"]
    via_match = search_body(spark, out, {
        "query": {"intervals": {"text": {"match": {
            "query": " ".join(tri), "max_gaps": 4,
        }}}},
        "size": 10,
    })
    via_all_of = search_body(spark, out, {
        "query": {"intervals": {"text": {"all_of": {
            "intervals": [{"match": {"query": t}} for t in tri],
            "max_gaps": 4,
        }}}},
        "size": 10,
    })
    want3 = oracle.span_near_search(tri, 10, slop=4, in_order=False)
    got = [(h["_id"], h["_score"]) for h in via_match["hits"]["hits"]]
    assert got == want3
    assert via_all_of["hits"]["hits"] == via_match["hits"]["hits"]

    one = search_body(spark, out, {
        "query": {"intervals": {"text": {"match": {"query": "term00000"}}}},
        "size": 5,
    })
    match = search_body(spark, out, {
        "query": {"match": {"text": "term00000"}}, "size": 5,
    })
    assert one["hits"]["hits"] == match["hits"]["hits"]

    with pytest.raises(UnsupportedDSL, match="max_gaps"):
        search_body(spark, out, {
            "query": {"intervals": {"text": {"match": {
                "query": "term00000 term00001",
            }}}},
        })
    with pytest.raises(UnsupportedDSL, match="intervals rule"):
        search_body(spark, out, {
            "query": {"intervals": {"text": {"any_of": {
                "intervals": [{"match": {"query": "x"}}],
            }}}},
        })
    with pytest.raises(UnsupportedDSL, match="single plain terms"):
        search_body(spark, out, {
            "query": {"intervals": {"text": {"all_of": {
                "intervals": [{"match": {"query": "a b"}},
                              {"match": {"query": "c"}}],
                "max_gaps": 1,
            }}}},
        })


# --------------------------------------------------------------------------
# Span algebra: span_or clauses, span_first, span_not
# --------------------------------------------------------------------------

def test_span_or_clause_in_near(spark, sidx):
    """A span_or clause matches any member position (Lucene SpanOrQuery
    union); serving path, distributed path, and oracle agree bit-exact."""
    out, oracle = sidx
    clauses = [["term00000", "term00003"], "term00001"]
    want = oracle.span_search(clauses, 25, slop=2, in_order=True)
    s = Searcher(spark, out)
    assert s.span_near_rows(clauses, 25, slop=2, in_order=True) == want
    got = [
        (r.doc_id, r.score)
        for r in span_near_topk(spark, out, clauses, 25, slop=2).collect()
    ]
    assert got == want
    body = {"query": {"span_near": {"clauses": [
        {"span_or": {"clauses": [{"span_term": {"text": "term00000"}},
                                 {"span_term": {"text": "term00003"}}]}},
        {"span_term": {"text": "term00001"}},
    ], "slop": 2, "in_order": True}}, "size": 25}
    resp = search_body(spark, out, body)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want


def test_span_or_top_level(spark, sidx):
    out, oracle = sidx
    want = oracle.span_search([["term00007", "term00011"]], 15)
    resp = search_body(spark, out, {"query": {"span_or": {"clauses": [
        {"span_term": {"text": "term00007"}},
        {"span_term": {"text": "term00011"}},
    ]}}, "size": 15})
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want


def test_span_first(spark, sidx):
    """span_first end=3: only positions 0..2 count (width-1 spans end at
    p+1); exact totals agree with the oracle's matching set."""
    out, oracle = sidx
    want = oracle.span_search(["term00001"], 30, first_end=3)
    resp = search_body(spark, out, {"query": {"span_first": {
        "match": {"span_term": {"text": "term00001"}}, "end": 3,
    }}, "size": 30, "track_total_hits": True})
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want
    full = oracle.span_search(["term00001"], 10_000, first_end=3)
    assert resp["hits"]["total"] == {"value": len(full), "relation": "eq"}
    # end beyond any dl = plain span_term ranking
    all_resp = search_body(spark, out, {"query": {"span_first": {
        "match": {"span_term": {"text": "term00001"}}, "end": 10_000,
    }}, "size": 30})
    assert [(h["_id"], h["_score"]) for h in all_resp["hits"]["hits"]] == \
        oracle.span_search(["term00001"], 30)


def test_span_not(spark, sidx):
    """span_not drops include positions adjacent to exclude positions
    within [p-pre, p+post]; overlap-only by default is a no-op for
    distinct terms (distinct terms never share a position)."""
    out, oracle = sidx
    want = oracle.span_search(
        ["term00001"], 25, exclude=["term00000"], pre=1, post=1
    )
    resp = search_body(spark, out, {"query": {"span_not": {
        "include": {"span_term": {"text": "term00001"}},
        "exclude": {"span_term": {"text": "term00000"}},
        "pre": 1, "post": 1,
    }}, "size": 25})
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want
    # pre=post=0 (ES default): distinct single-term spans never overlap
    noop = search_body(spark, out, {"query": {"span_not": {
        "include": {"span_term": {"text": "term00001"}},
        "exclude": {"span_term": {"text": "term00000"}},
    }}, "size": 25})
    assert [(h["_id"], h["_score"]) for h in noop["hits"]["hits"]] == \
        oracle.span_search(["term00001"], 25)


def test_span_guards(spark, sidx):
    out, _ = sidx
    with pytest.raises(UnsupportedDSL, match="span_term / span_or"):
        search_body(spark, out, {"query": {"span_near": {"clauses": [
            {"span_first": {"match": {"span_term": {"text": "a"}}, "end": 1}},
            {"span_term": {"text": "b"}},
        ]}}})
    with pytest.raises(UnsupportedDSL, match="needs match and end"):
        search_body(spark, out, {"query": {"span_first": {
            "match": {"span_term": {"text": "a"}}}}})
