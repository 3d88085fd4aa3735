"""Request-level ES extras: min_score floors, _source includes/excludes
filtering, _search/template rendering ({{var}} mustache subset), and the
_field_caps capability listing derived from the index itself."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.dsl import (
    UnsupportedDSL,
    render_search_template,
    search_body,
    search_template_body,
)
from conveyorbelt_spark.index.query import field_caps


@pytest.fixture(scope="module")
def xidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("extras") / "idx")
    rows = [
        (1, "spark spark spark", "en", 10),
        (2, "spark spark other", "de", 20),
        (3, "spark other other", "en", 30),
        (4, "other words here", "fr", 40),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    build_index(spark, docs, out, url_col=None, n_buckets=2,
                keyword_cols=("lang",))
    write_docstore(spark, docs, out, url_col=None,
                   extra_cols=("lang", "n_chars"))
    return out


def test_min_score(spark, xidx):
    full = search_body(spark, xidx, {"query": {"match": {"text": "spark"}},
                                     "size": 10})
    scores = [h["_score"] for h in full["hits"]["hits"]]
    assert len(scores) == 3 and scores == sorted(scores, reverse=True)
    floor = scores[1]  # keep exactly the top two (ties by >=)
    floored = search_body(spark, xidx, {
        "query": {"match": {"text": "spark"}}, "size": 10,
        "min_score": floor,
    })
    assert [h["_score"] for h in floored["hits"]["hits"]] == scores[:2]
    with pytest.raises(UnsupportedDSL, match="min_score"):
        search_body(spark, xidx, {"query": {"match": {"text": "spark"}},
                                  "min_score": 0.1, "track_total_hits": True})
    with pytest.raises(UnsupportedDSL, match="min_score"):
        search_body(spark, xidx, {"query": {"match": {"text": "spark"}},
                                  "min_score": 0.1,
                                  "sort": [{"lang": "asc"}]})


def test_source_filtering(spark, xidx):
    body = {"query": {"match": {"text": "spark"}}, "size": 1}
    h = search_body(spark, xidx, {**body, "_source": True})["hits"]["hits"][0]
    assert set(h["_source"]) == {"doc_id", "url", "lang", "n_chars"}
    h = search_body(spark, xidx, {**body, "_source": ["lang"]})["hits"]["hits"][0]
    assert set(h["_source"]) == {"lang"}
    h = search_body(spark, xidx, {**body, "_source": "n_*"})["hits"]["hits"][0]
    assert set(h["_source"]) == {"n_chars"}
    h = search_body(spark, xidx, {
        **body, "_source": {"includes": ["*"], "excludes": ["url", "doc_id"]},
    })["hits"]["hits"][0]
    assert set(h["_source"]) == {"lang", "n_chars"}
    h = search_body(spark, xidx, {**body, "_source": False})["hits"]["hits"][0]
    assert "_source" not in h


def test_search_template(spark, xidx):
    tpl = {
        "query": {"bool": {
            "must": [{"match": {"text": "{{q}}"}}],
            "filter": [{"term": {"lang": "{{lang}}"}}],
        }},
        "size": "{{size}}",
    }
    resp = search_template_body(spark, xidx, {
        "source": tpl, "params": {"q": "spark", "lang": "en", "size": 5},
    })
    assert {h["_id"] for h in resp["hits"]["hits"]} == {1, 3}
    # typed whole-string substitution: size became the NUMBER 5
    assert render_search_template(tpl, {"q": "a", "lang": "x", "size": 5})[
        "size"] == 5
    # missing params render empty (mustache); sections raise
    assert render_search_template('{"q": "a {{gone}} b"}', {}) == {"q": "a  b"}
    with pytest.raises(UnsupportedDSL, match="sections"):
        render_search_template('{"x": "{{#loop}}y{{/loop}}"}', {})
    with pytest.raises(UnsupportedDSL, match="needs source"):
        search_template_body(spark, xidx, {"params": {}})


def test_field_caps(spark, xidx):
    caps = field_caps(xidx)["fields"]
    assert caps["text"] == {"text": {
        "type": "text", "searchable": True, "aggregatable": False,
    }}
    assert caps["lang"] == {"keyword": {
        "type": "keyword", "searchable": True, "aggregatable": True,
    }}
    # stored but not keyword-indexed: aggregatable, not searchable
    assert caps["n_chars"]["long"]["aggregatable"] is True
    assert caps["n_chars"]["long"]["searchable"] is False
    assert not {"doc_id", "bucket", "run"} & set(caps)
