"""ES explain API: per-document Lucene-style BM25 decomposition. The
weight nodes' idf × tfNorm children multiply to the node value and the
node values sum EXACTLY to the serving kernel's score for the same
query; non-matching docs explain WHY (matched: false), never a score."""

from __future__ import annotations

import random

import pytest

from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body
from conveyorbelt_spark.index.query import Searcher

W = ["spark", "join", "window", "shuffle", "plan", "query", "index", "merge"]


@pytest.fixture(scope="module")
def xroot(spark, tmp_path_factory):
    rng = random.Random(23)
    rows = [
        (i, " ".join(rng.choices(W, k=10)), ["en", "de"][i % 2])
        for i in range(120)
    ]
    out = str(tmp_path_factory.mktemp("explidx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
        keyword_cols=("lang",),
    )
    write_docstore(spark, docs, out, url_col=None, extra_cols=("lang",))
    return out, rows


def test_explain_sums_to_kernel_score(spark, xroot):
    out, rows = xroot
    s = Searcher(spark, out)
    hits = s.search_rows("spark join window", 10)
    assert hits
    for d, sc in hits:
        ex = s.explain("spark join window", d)
        assert ex["matched"] is True
        assert ex["value"] == pytest.approx(sc, rel=1e-12)
        # each weight node is the product of its idf and tfNorm children
        for node in ex["details"]:
            idf_v, tfn = (c["value"] for c in node["details"])
            assert node["value"] == pytest.approx(idf_v * tfn, rel=1e-12)
        assert sum(n["value"] for n in ex["details"]) == pytest.approx(
            ex["value"], rel=1e-12
        )
        # only terms actually present in the doc get weight nodes
        node_terms = {
            n["description"].split("text:")[1].split(" ")[0]
            for n in ex["details"]
        }
        text_by_id = {i: t for i, t, _ in rows}
        assert node_terms == {"spark", "join", "window"} & set(
            text_by_id[d].split()
        )


def test_explain_bool_clauses(spark, xroot):
    out, rows = xroot
    s = Searcher(spark, out)
    text_by_id = {i: t for i, t, _ in rows}
    lang_by_id = {i: lg for i, _, lg in rows}
    # must + must_not + filter, compared against the kernel
    hits = s.search_rows(
        "spark join", 5, must="window", must_not="merge",
        filters={"lang": "en"},
    )
    assert hits
    for d, sc in hits:
        ex = s.explain(
            "spark join", d, must="window", must_not="merge",
            filters={"lang": "en"},
        )
        assert ex["matched"] and ex["value"] == pytest.approx(sc, rel=1e-12)
    # membership failures name the clause
    no_window = next(
        i for i, t in text_by_id.items() if "window" not in t.split()
    )
    ex = s.explain("spark join", no_window, must="window")
    assert ex["matched"] is False and "window" in ex["description"]
    with_merge = next(i for i, t in text_by_id.items() if "merge" in t.split())
    ex = s.explain("spark join", with_merge, must_not="merge")
    assert ex["matched"] is False and "merge" in ex["description"]
    de_doc = next(
        i for i, t in text_by_id.items()
        if lang_by_id[i] == "de" and "spark" in t.split()
    )
    ex = s.explain("spark", de_doc, filters={"lang": "en"})
    assert ex["matched"] is False and "filter group" in ex["description"]
    # min_should
    one_of_three = next(
        i for i, t in text_by_id.items()
        if len({"spark", "join", "window"} & set(t.split())) == 1
    )
    ex = s.explain("spark join window", one_of_three, min_should=2)
    assert ex["matched"] is False and "minimum_should_match" in ex["description"]


def test_explain_through_dsl(spark, xroot):
    out, _ = xroot
    s = Searcher(spark, out)
    resp = search_body(spark, out, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark"}}],
            "should": [{"match": {"text": "join window"}}],
        }},
        "size": 5, "explain": True,
    }, searcher=s)
    assert resp["hits"]["hits"]
    for h in resp["hits"]["hits"]:
        ex = h["_explanation"]
        assert ex["matched"] is True
        assert ex["value"] == pytest.approx(h["_score"], rel=1e-12)
    with pytest.raises(UnsupportedDSL, match="explain"):
        search_body(spark, out, {
            "query": {"match_phrase": {"text": "spark join"}},
            "explain": True,
        }, searcher=s)
