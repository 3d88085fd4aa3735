"""simple_query_string: the ES simple syntax over the main field —
whitespace terms via default_operator, infix + / | chains, -negation,
whole-query "phrase"~N / prefix*, lenient dangling operators — mapped to
the bool kernel (should / must / must_not / minimum_should_match)."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.dsl import UnsupportedDSL, parse_query, search_body
from conveyorbelt_spark.index.query import Searcher


def _plan(q, **kw):
    return parse_query({"simple_query_string": {"query": q, **kw}}, None)


def test_parse_shapes():
    p = _plan("spark join window")
    assert (p["query"], p["must"], p["must_not"], p["min_should"]) == (
        "spark join window", None, None, 0
    )
    p = _plan("spark join", default_operator="and")
    assert (p["query"], p["must"]) == ("", "spark join")
    p = _plan("spark + join window")          # infix + binds both neighbours
    assert (p["query"], p["must"]) == ("window", "spark join")
    p = _plan("spark+join window")            # no-spaces infix
    assert (p["query"], p["must"]) == ("window", "spark join")
    p = _plan("spark join | window", default_operator="and")
    assert (p["query"], p["must"], p["min_should"]) == ("join window", "spark", 1)
    p = _plan("spark -join -window")
    assert (p["query"], p["must_not"]) == ("spark", "join window")
    p = _plan('"spark join"~2')
    assert (p["phrase"], p["phrase_slop"]) == ("spark join", 2)
    p = _plan("spar*")
    assert p["expand"] == ("prefix", "spar", {})
    # ES leniency: dangling operators are dropped, never errors
    p = _plan("spark | ")
    assert p["query"] == "spark"
    p = _plan("+ spark -")
    assert p["query"] == "spark"
    assert _plan("")["match_all"] is True
    p = _plan("spark", fields=["title"])
    assert p["mm"] == {"query": "spark", "fields": ["title"],
                       "type": "best_fields"}


def test_parse_rejections():
    with pytest.raises(UnsupportedDSL, match="precedence"):
        _plan("(spark join) | window")
    with pytest.raises(UnsupportedDSL, match="mixing"):
        _plan("spark + join | window")
    with pytest.raises(UnsupportedDSL, match="OR-of-NOT"):
        _plan("spark | -join")
    with pytest.raises(UnsupportedDSL, match="entire query"):
        _plan('spark "join window"')
    with pytest.raises(UnsupportedDSL, match="entire query"):
        _plan("spark join*")
    with pytest.raises(UnsupportedDSL, match="fuzziness"):
        _plan("spark~2")
    with pytest.raises(UnsupportedDSL, match="flags"):
        _plan("spark", flags="OR|AND")
    with pytest.raises(UnsupportedDSL, match="fields"):
        _plan("spark -join", fields=["title"])


def test_end_to_end_matches_bool(spark, tmp_path):
    """A simple_query_string body scores identically to the equivalent
    explicit bool body (same kernel plan)."""
    out = str(tmp_path / "sqs_idx")
    rows = [
        (1, "spark join window"), (2, "spark window"), (3, "join frame"),
        (4, "spark join merge"), (5, "window pane"), (6, "spark"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=2)
    s = Searcher(spark, out)
    sqs = search_body(spark, out, {"query": {"simple_query_string": {
        "query": "spark join | window -merge", "default_operator": "and",
    }}, "size": 10, "track_total_hits": True}, searcher=s)
    boolq = search_body(spark, out, {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "should": [{"match": {"text": "join"}}, {"match": {"text": "window"}}],
        "must_not": [{"match": {"text": "merge"}}],
        "minimum_should_match": 1,
    }}, "size": 10, "track_total_hits": True}, searcher=s)
    pick = lambda r: [(h["_id"], h["_score"]) for h in r["hits"]["hits"]]  # noqa: E731
    assert pick(sqs) == pick(boolq)
    assert {h["_id"] for h in sqs["hits"]["hits"]} == {1, 2}
    assert sqs["hits"]["total"] == {"value": 2, "relation": "eq"}
