"""ES auxiliary read APIs: _termvectors (realtime re-analysis of stored
text, per-term stats from the live dictionary), _terms_enum (term-sorted
prefix enumeration), _msearch (aligned batch with error slots), and
_count (exact totals without a search phase)."""

from __future__ import annotations

from collections import Counter

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.dsl import count_body, msearch, search_body
from conveyorbelt_spark.index.query import Searcher, terms_enum
from conveyorbelt_spark.textutils import tokenize


@pytest.fixture(scope="module")
def tvidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tv_idx"))
    docs = corpus_spark_df(spark, 400, seed=44, n_parts=2)
    build_index(spark, docs, out, n_buckets=4)
    write_docstore(spark, docs, out, extra_cols=("text",))
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    return out, {r.doc_id: r.text for r in rows}


def test_termvectors_matches_reanalysis(spark, tvidx):
    """term_freq + positions come from re-analyzing the stored text;
    doc_freq / ttf / field_statistics match brute-force corpus counts."""
    out, texts = tvidx
    s = Searcher(spark, out)
    did = min(texts)
    tv = s.termvectors(did, term_statistics=True)
    assert tv["found"] and tv["_id"] == did
    toks = tokenize(texts[did])
    got = tv["term_vectors"]["text"]["terms"]
    assert {t: e["term_freq"] for t, e in got.items()} == dict(Counter(toks))
    for t, e in got.items():
        assert [x["position"] for x in e["tokens"]] == [
            i for i, x in enumerate(toks) if x == t
        ]
    dfs: Counter = Counter()
    ttfs: Counter = Counter()
    for txt in texts.values():
        tt = tokenize(txt)
        ttfs.update(tt)
        dfs.update(set(tt))
    for t, e in got.items():
        assert e["doc_freq"] == dfs[t], t
        assert e["ttf"] == ttfs[t], t
    fs = tv["term_vectors"]["text"]["field_statistics"]
    assert fs["doc_count"] == len(texts)
    assert fs["sum_ttf"] == sum(ttfs.values())
    assert fs["sum_doc_freq"] == sum(dfs.values())
    assert s.termvectors(12345)["found"] is False


def test_terms_enum_term_sorted(spark, tvidx):
    out, texts = tvidx
    vocab = sorted({t for x in texts.values() for t in tokenize(x)})
    want = [t for t in vocab if t.startswith("term0000")]
    assert len(want) > 5
    res = terms_enum(out, "term0000", size=5)
    assert res == {"terms": want[:5], "complete": False}
    assert terms_enum(out, "term0000", size=10_000) == {
        "terms": want, "complete": True,
    }
    assert terms_enum(out, "zzznope") == {"terms": [], "complete": True}


def test_msearch_aligned_with_error_slots(spark, tvidx):
    out, _texts = tvidx
    bodies = [
        {"query": {"match": {"text": "term00001 term00002"}}, "size": 5},
        {"query": {"no_such_query": {}}},
        {"query": {"match_phrase": {"text": "term00001 term00002"}}},
    ]
    res = msearch(spark, out, bodies)
    assert len(res) == 3
    assert res[0] == search_body(spark, out, bodies[0])
    assert res[1]["error"]["type"] == "UnsupportedDSL"
    # phrase on a positions=False index fails in ITS slot only
    assert "positions" in res[2]["error"]["reason"]


def test_count_matches_brute_force(spark, tvidx):
    out, texts = tvidx
    want = sum(1 for x in texts.values() if "term00001" in tokenize(x))
    assert count_body(
        spark, out, {"query": {"match": {"text": "term00001"}}}
    ) == {"count": want}
    both = sum(
        1 for x in texts.values()
        if {"term00001", "term00002"} <= set(tokenize(x))
    )
    assert count_body(spark, out, {"query": {"bool": {"must": [
        {"match": {"text": "term00001"}}, {"match": {"text": "term00002"}},
    ]}}}) == {"count": both}
    assert count_body(spark, out, {}) == {"count": len(texts)}
    assert count_body(spark, out, {"query": {"match_all": {}}}) == {
        "count": len(texts)
    }
