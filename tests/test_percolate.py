"""ES percolator (reverse search): registered queries × streamed docs →
(doc, query) matches. Two-phase plan: broadcast term-routing join for
candidates (ES's term-extraction pre-filter, corpus-at-a-time), exact
vectorized verify on candidates only. Truth = per-row python evaluation."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.operators.percolate import (
    UnsupportedPercolateQuery,
    compile_query,
    percolate,
    percolate_doc,
)
from conveyorbelt_spark.textutils import analyze

ROWS = [
    (1, "spark join window frame", "en", 100),
    (2, "spark shuffle merge", "en", 250),
    (3, "window pane glass", "de", 250),
    (4, "spark window plan", "fr", 400),
    (5, "join the window club", "en", 50),
    (6, "nothing relevant here", "de", 999),
    (7, "frame window join spark", "en", 300),
]
QUERIES = [
    ("q_match_or", {"match": {"text": "spark window"}}),
    ("q_match_and", {"match": {"text": {"query": "spark window",
                                        "operator": "and"}}}),
    ("q_phrase", {"match_phrase": {"text": "window frame"}}),
    ("q_bool", {"bool": {
        "must": [{"match": {"text": "window"}}],
        "must_not": [{"match": {"text": "glass"}}],
        "filter": [{"term": {"lang": "en"}}],
    }}),
    ("q_range_only", {"range": {"n_chars": {"gte": 250, "lt": 999}}}),
    ("q_should_msm", {"bool": {
        "should": [{"match": {"text": "frame"}}, {"match": {"text": "plan"}},
                   {"match": {"text": "merge"}}],
        "minimum_should_match": 1,
    }}),
]


def _truth():
    want = set()
    for did, text, lang, n_chars in ROWS:
        toks = analyze(text, None)
        s = set(toks)
        if {"spark", "window"} & s:
            want.add((did, "q_match_or"))
        if {"spark", "window"} <= s:
            want.add((did, "q_match_and"))
        if any(toks[i:i + 2] == ["window", "frame"] for i in range(len(toks))):
            want.add((did, "q_phrase"))
        if "window" in s and "glass" not in s and lang == "en":
            want.add((did, "q_bool"))
        if 250 <= n_chars < 999:
            want.add((did, "q_range_only"))
        if {"frame", "plan", "merge"} & s:
            want.add((did, "q_should_msm"))
    return want


def test_percolate_matches_truth(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, n_chars long"
    ).repartition(3)
    got = {
        (r.doc_id, r.query_id)
        for r in percolate(spark, docs, QUERIES).collect()
    }
    want = _truth()
    assert got == want
    # sanity on the fixture: every query matches something, none all
    per_q = {q: {d for d, qq in want if qq == q} for q, _ in QUERIES}
    assert all(per_q.values()) and all(len(v) < len(ROWS) for v in per_q.values())


def test_percolate_doc_serving_twin(spark):
    for did, text, lang, n_chars in ROWS:
        doc = {"text": text, "lang": lang, "n_chars": n_chars}
        got = set(percolate_doc(doc, QUERIES))
        want = {q for d, q in _truth() if d == did}
        assert got == want, f"doc {did}"


def test_percolate_with_analyzer(spark):
    """A stemming analyzer applies the SAME chain to routing tokens and
    verify: 'windows' (doc) matches a 'window' query via stem."""
    analyzer = {"stopwords": ["the"], "min_len": 1, "stem": "s"}
    docs = spark.createDataFrame(
        [(1, "many windows everywhere"), (2, "no matches at all")],
        "doc_id long, text string",
    )
    qs = [("w", {"match": {"text": "window"}})]
    got = {(r.doc_id, r.query_id)
           for r in percolate(spark, docs, qs, analyzer=analyzer).collect()}
    assert got == {(1, "w")}


def test_compile_guards():
    with pytest.raises(UnsupportedPercolateQuery, match="positive clause"):
        compile_query("x", {"bool": {"must_not": [{"match": {"text": "a"}}]}})
    with pytest.raises(UnsupportedPercolateQuery, match="unsupported"):
        compile_query("x", {"fuzzy": {"text": "abc"}})
    with pytest.raises(UnsupportedPercolateQuery, match="stored columns"):
        compile_query("x", {"range": {"text": {"gte": "a"}}})
    c = compile_query("x", {"match": {"text": "rare common"}})
    assert c["routing"] == ["common", "rare"]
    c = compile_query("x", {"match": {"text": {"query": "rare common",
                                               "operator": "and"}}})
    assert len(c["routing"]) == 1  # smallest sufficient group
    c = compile_query("x", {"range": {"n": {"gte": 1}}})
    assert c["routing"] is None  # column-only: always candidate
