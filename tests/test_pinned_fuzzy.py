"""pinned query (ids-first ranking), wrapper query (base64 round-trip),
AUTO fuzziness on fuzzy/match, and match-with-fuzziness dispatch."""

from __future__ import annotations

import base64
import json
import random

import pytest

from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body

W = ["spark", "join", "window", "shuffle", "plan", "query"]


@pytest.fixture(scope="module")
def pfroot(spark, tmp_path_factory):
    rng = random.Random(31)
    rows = [(i, " ".join(rng.choices(W, k=9))) for i in range(100)]
    # one doc holding a typo-target term
    rows.append((100, "sparkk join window"))
    out = str(tmp_path_factory.mktemp("pfidx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text",))
    return out, rows


def _ids(resp):
    return [h["_id"] for h in resp["hits"]["hits"]]


def test_pinned_ids_first_in_given_order(spark, pfroot):
    out, _ = pfroot
    organic = search_body(
        spark, out, {"query": {"match": {"text": "spark join"}}, "size": 10}
    )
    org_ids = _ids(organic)
    pins = [7, 99999, 3]  # 99999 doesn't exist — skipped, order kept
    resp = search_body(spark, out, {
        "query": {"pinned": {"ids": pins, "organic": {"match": {"text": "spark join"}}}},
        "size": 8,
    })
    got = _ids(resp)
    assert got[:2] == [7, 3]
    assert resp["hits"]["hits"][0]["_score"] > resp["hits"]["hits"][1]["_score"]
    want_tail = [d for d in org_ids if d not in (7, 3)][:6]
    assert got[2:] == want_tail
    # from/size pages the composed ranking
    page = search_body(spark, out, {
        "query": {"pinned": {"ids": pins, "organic": {"match": {"text": "spark join"}}}},
        "from": 1, "size": 3,
    })
    assert _ids(page) == got[1:4]
    with pytest.raises(UnsupportedDSL, match="pinned"):
        search_body(spark, out, {
            "query": {"pinned": {"ids": [1], "organic": {"match": {"text": "spark"}}}},
            "sort": [{"doc_id": "asc"}],
        })


def test_wrapper_round_trip(spark, pfroot):
    out, _ = pfroot
    inner = {"bool": {"must": [{"match": {"text": "spark join"}}]}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    direct = search_body(spark, out, {"query": inner, "size": 10})
    wrapped = search_body(spark, out, {"query": {"wrapper": {"query": b64}}, "size": 10})
    assert _ids(wrapped) == _ids(direct)
    with pytest.raises(UnsupportedDSL, match="decode"):
        search_body(spark, out, {"query": {"wrapper": {"query": "!!!"}}})


def test_fuzzy_auto_and_match_fuzziness(spark, pfroot):
    out, _ = pfroot
    # AUTO over a 6-char term → distance 2; "sparkk" is 1 edit from "spark"
    auto = search_body(spark, out, {
        "query": {"fuzzy": {"text": {"value": "sparkk", "fuzziness": "AUTO"}}},
        "size": 5,
    })
    assert len(_ids(auto)) > 0
    # match + fuzziness dispatches to the same expansion
    viam = search_body(spark, out, {
        "query": {"match": {"text": {"query": "sparkk", "fuzziness": "AUTO"}}},
        "size": 5,
    })
    assert _ids(viam) == _ids(auto)
    # AUTO on a short term → distance 0: exact-only
    exact = search_body(spark, out, {
        "query": {"fuzzy": {"text": {"value": "sp", "fuzziness": "AUTO"}}},
        "size": 5,
    })
    assert _ids(exact) == []
    with pytest.raises(UnsupportedDSL, match="single-token"):
        search_body(spark, out, {
            "query": {"match": {"text": {"query": "two words", "fuzziness": 1}}},
        })


def test_highlight_options(spark, pfroot):
    out, _ = pfroot
    resp = search_body(spark, out, {
        "query": {"match": {"text": "spark"}}, "size": 1,
        "highlight": {
            "fields": {"text": {"number_of_fragments": 3, "fragment_size": 24}},
            "pre_tags": ["<b>"], "post_tags": ["</b>"],
        },
    })
    frags = resp["hits"]["hits"][0]["highlight"]["text"]
    assert 1 <= len(frags) <= 3
    assert all("<b>spark</b>" in f for f in frags)
    assert all(len(f) <= 24 + f.count("<b>") * 7 for f in frags)
    # number_of_fragments 0 = the whole field, tagged
    whole = search_body(spark, out, {
        "query": {"match": {"text": "spark"}}, "size": 1,
        "highlight": {"fields": {"text": {"number_of_fragments": 0}}},
    })
    wf = whole["hits"]["hits"][0]["highlight"]["text"]
    assert len(wf) == 1 and "<em>spark</em>" in wf[0]
