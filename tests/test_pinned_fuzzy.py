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


def test_terms_lookup_and_stored_template(spark, pfroot, tmp_path):
    from conveyorbelt_spark.index.dsl import (
        count_body, delete_script, get_script, put_script,
        search_template_body,
    )

    out, rows = pfroot
    # terms lookup: doc 0's stored "text" column is a string → one term;
    # use a profile-style index holding a LIST column
    from conveyorbelt_spark.index.build import build_index, write_docstore

    prof = str(tmp_path / "profiles")
    pdocs = spark.createDataFrame(
        [(1, "profile", ["spark", "join"])],
        "doc_id long, text string, likes array<string>",
    )
    build_index(spark, pdocs.select("doc_id", "text"), prof, url_col=None, n_buckets=2)
    write_docstore(spark, pdocs, prof, url_col=None, extra_cols=("likes",))
    looked = search_body(spark, out, {
        "query": {"bool": {"filter": [{"terms": {
            "text": {"index": prof, "id": 1, "path": "likes"},
        }}]}},
        "size": 5,
    })
    # equivalent inline list gives the identical hits
    inline = search_body(spark, out, {
        "query": {"bool": {"filter": [{"terms": {"text": ["spark", "join"]}}]}},
        "size": 5,
    })
    assert _ids(looked) == _ids(inline) and _ids(inline)
    # counts resolve lookups too; a missing doc matches nothing
    n = count_body(spark, out, {"query": {"terms": {
        "text": {"index": prof, "id": 999, "path": "likes"},
    }}})
    assert n == {"count": 0}

    # stored template registry round-trip
    scripts = str(tmp_path / "scripts")
    put_script(scripts, "my-search", {"script": {
        "lang": "mustache",
        "source": {"query": {"match": {"text": "{{q}}"}}, "size": "{{size}}"},
    }})
    assert get_script(scripts, "my-search")["found"] is True
    via_tpl = search_template_body(
        spark, out, {"id": "my-search", "params": {"q": "spark", "size": 4}},
        scripts_dir=scripts,
    )
    direct = search_body(spark, out, {"query": {"match": {"text": "spark"}}, "size": 4})
    assert _ids(via_tpl) == _ids(direct)
    delete_script(scripts, "my-search")
    with pytest.raises(KeyError):
        get_script(scripts, "my-search")


def test_knn_filter_mtv_render_cat(spark, pfroot, tmp_path):
    """kNN pre-filter (candidate set restricted BEFORE the vector scan),
    _mtermvectors slots, _render/template, _msearch/template, and the
    _cat/indices ops rows."""
    import numpy as np

    from conveyorbelt_spark.index.build import build_index, write_docstore
    from conveyorbelt_spark.index.dsl import (
        mtermvectors, msearch_template, put_script, render_template_body,
        search_body,
    )
    from conveyorbelt_spark.index.query import cat_indices

    out, _ = pfroot
    # vector index with a keyword filter column
    vidx = str(tmp_path / "vecidx")
    rng = np.random.RandomState(7)
    vecs = rng.rand(40, 8).astype("float32")
    rows = [
        (i, "doc text", ["red", "blue"][i % 2], [float(x) for x in vecs[i]])
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, color string, emb array<float>"
    )
    build_index(
        spark, docs.select("doc_id", "text", "color"), vidx, url_col=None,
        n_buckets=2, keyword_cols=("color",),
    )
    write_docstore(spark, docs, vidx, url_col=None, extra_cols=("color", "emb"))
    qv = [float(x) for x in vecs[0]]
    filt = search_body(spark, vidx, {"knn": {
        "field": "emb", "query_vector": qv, "k": 5,
        "filter": [{"term": {"color": "red"}}],
    }})
    ids = [h["_id"] for h in filt["hits"]["hits"]]
    assert ids and all(i % 2 == 0 for i in ids)  # red = even ids only
    # parity: brute-force cosine over the red subset
    import numpy.linalg as la

    red = [(i, vecs[i]) for i in range(0, 40, 2)]
    q = np.array(qv)
    cos = sorted(
        ((i, float(v @ q / (la.norm(v) * la.norm(q)))) for i, v in red),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert ids == [i for i, _ in cos]

    # _mtermvectors over the text index (doc 7 exists, 99999 doesn't)
    mtv = mtermvectors(spark, out, [7, 99999])
    assert mtv["docs"][0]["found"] is True and mtv["docs"][1]["found"] is False

    # _render/template + _msearch/template
    scripts = str(tmp_path / "scripts2")
    put_script(scripts, "t1", {"script": {"source": {
        "query": {"match": {"text": "{{q}}"}}, "size": "{{n}}",
    }}})
    rendered = render_template_body(
        {"id": "t1", "params": {"q": "spark", "n": 3}}, scripts_dir=scripts,
    )
    assert rendered["template_output"] == {
        "query": {"match": {"text": "spark"}}, "size": 3,
    }
    ms = msearch_template(spark, out, [
        {"id": "t1", "params": {"q": "spark", "n": 3}},
        {"id": "missing", "params": {}},
    ], scripts_dir=scripts)
    assert len(ms[0]["hits"]["hits"]) == 3 and "error" in ms[1]

    # _cat/indices ops rows
    cat = cat_indices([out, vidx])
    assert [r["docs_count"] for r in cat] == sorted([101, 40]) or \
        {r["docs_count"] for r in cat} == {101, 40}
    assert all(r["store_bytes"] > 0 and r["n_runs"] >= 1 for r in cat)


def test_keyword_field_expansion(spark, tmp_path):
    """prefix/wildcard on a KEYWORD field expand the stored values over
    the term_index and filter (constant score) — previously these silently
    expanded against the main-text dictionary."""
    from conveyorbelt_spark.index.build import build_index, write_docstore
    from conveyorbelt_spark.index.dsl import count_body, search_body

    out = str(tmp_path / "kwidx")
    rows = [
        (i, "spark join", ["alpha", "alps", "beta", "gamma"][i % 4])
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, cat string")
    build_index(
        spark, docs, out, url_col=None, n_buckets=2, keyword_cols=("cat",),
    )
    write_docstore(spark, docs, out, url_col=None, extra_cols=("cat",))
    pre = search_body(spark, out, {
        "query": {"prefix": {"cat": {"value": "alp"}}},
        "sort": [{"doc_id": "asc"}], "size": 40, "track_total_hits": True,
    })
    ids = [h["_id"] for h in pre["hits"]["hits"]]
    assert ids == [i for i in range(40) if i % 4 in (0, 1)]
    assert pre["hits"]["total"]["value"] == 20
    wc = count_body(spark, out, {"query": {"wildcard": {"cat": "*ta"}}})
    assert wc == {"count": 10}  # beta only
    none = search_body(spark, out, {"query": {"prefix": {"cat": "zz"}}})
    assert none["hits"]["hits"] == [] and none["hits"]["total"]["value"] == 0
    # main-field expansion unchanged
    mf = search_body(spark, out, {"query": {"prefix": {"text": "spa"}}, "size": 3})
    assert len(mf["hits"]["hits"]) == 3


def test_filter_context_expansions(spark, tmp_path):
    """wildcard/prefix/fuzzy in FILTER and MUST_NOT context: constant
    score, expansion over the term_index; empty expansions match nothing
    (filter) / exclude nothing (must_not)."""
    from conveyorbelt_spark.index.build import build_index, write_docstore
    from conveyorbelt_spark.index.dsl import search_body

    out = str(tmp_path / "fxidx")
    rows = [
        (i, ("spark join" if i % 2 else "window merge"),
         ["alpha", "beta"][i % 2])
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, cat string")
    build_index(spark, docs, out, url_col=None, n_buckets=2, keyword_cols=("cat",))
    write_docstore(spark, docs, out, url_col=None, extra_cols=("cat",))
    # main-field wildcard filter: docs containing a token matching wind*
    r = search_body(spark, out, {
        "query": {"bool": {"filter": [{"wildcard": {"text": "wind*"}}]}},
        "sort": [{"doc_id": "asc"}], "size": 30,
    })
    assert [h["_id"] for h in r["hits"]["hits"]] == [i for i in range(30) if i % 2 == 0]
    # keyword prefix filter composes with a scored must
    r2 = search_body(spark, out, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark"}}],
            "filter": [{"prefix": {"cat": "al"}}],
        }},
        "size": 30,
    })
    assert [h["_id"] for h in r2["hits"]["hits"]] == []  # spark docs are beta
    # must_not wildcard excludes the matching expansion
    r3 = search_body(spark, out, {
        "query": {"bool": {
            "must": [{"match": {"text": "spark join"}}],
            "must_not": [{"wildcard": {"cat": "bet*"}}],
        }},
        "size": 30,
    })
    assert r3["hits"]["hits"] == []
    # empty filter expansion matches nothing
    r4 = search_body(spark, out, {
        "query": {"bool": {"filter": [{"prefix": {"cat": "zz"}}]}},
        "sort": [{"doc_id": "asc"}], "size": 5,
    })
    assert r4["hits"]["hits"] == []


def test_match_bool_prefix(spark, pfroot):
    from conveyorbelt_spark.index.query import Searcher

    out, _ = pfroot
    r = search_body(spark, out, {
        "query": {"match_bool_prefix": {"text": "join sp"}}, "size": 6,
    })
    # expansion bag: join + every sp* vocabulary term (spark, sparkk) —
    # rank-identical to the explicit OR bag
    s = Searcher(spark, out)
    truth = s.search_rows("join spark sparkk", 6)
    assert [(h["_id"], h["_score"]) for h in r["hits"]["hits"]] == [
        (d, pytest.approx(v)) for d, v in truth
    ]
    with pytest.raises(UnsupportedDSL, match="main text field"):
        search_body(spark, out, {
            "query": {"match_bool_prefix": {"other": "x y"}},
        })


def test_collapse_inner_hits(spark, tmp_path):
    """collapse.inner_hits: each group head carries its group's top-N
    members, heads ranked by best score — pinned against the recombined
    full-ranking truth."""
    import random as _random

    from conveyorbelt_spark.index.build import build_index, write_docstore
    from conveyorbelt_spark.index.query import Searcher

    rng = _random.Random(9)
    W = ["spark", "join", "window", "shuffle"]
    rows = [
        (i, " ".join(rng.choices(W, k=8)), ["g0", "g1", "g2", "g3"][i % 4])
        for i in range(80)
    ]
    out = str(tmp_path / "cidx")
    docs = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    build_index(spark, docs.select("doc_id", "text"), out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("grp",))
    resp = search_body(spark, out, {
        "query": {"match": {"text": "spark join"}},
        "collapse": {"field": "grp", "inner_hits": {"name": "top3", "size": 3}},
        "size": 3,
    })
    s = Searcher(spark, out)
    full = s.search_rows("spark join", 10_000, prune=False)
    grp = {i: g for i, _, g in rows}
    by_group: dict = {}
    for d, sc in sorted(full, key=lambda t: (-t[1], t[0])):
        by_group.setdefault(grp[d], []).append((d, sc))
    heads = sorted(
        ((mem[0][0], mem[0][1], g) for g, mem in by_group.items()),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    hits = resp["hits"]["hits"]
    assert [h["_id"] for h in hits] == [d for d, _, _ in heads]
    for h, (_, _, g) in zip(hits, heads):
        inner = h["inner_hits"]["top3"]["hits"]["hits"]
        want = by_group[g][:3]
        assert [(x["_id"], x["_score"]) for x in inner] == [
            (d, pytest.approx(sc)) for d, sc in want
        ]
        assert h["fields"]["grp"] == [g]


def test_match_params(spark, pfroot):
    """match boost scales scores (ranking unchanged), minimum_should_match
    (int and percent) thins the matching set, and the silently-dangerous
    shapes (analyzer override, zero_terms_query all, multi_match operator,
    per-clause bool boost) reject."""
    out, _ = pfroot
    plain = search_body(spark, out, {"query": {"match": {"text": "spark join"}}, "size": 5})
    boosted = search_body(spark, out, {
        "query": {"match": {"text": {"query": "spark join", "boost": 3.0}}},
        "size": 5,
    })
    assert [h["_id"] for h in boosted["hits"]["hits"]] == [
        h["_id"] for h in plain["hits"]["hits"]
    ]
    for b, p in zip(boosted["hits"]["hits"], plain["hits"]["hits"]):
        assert b["_score"] == pytest.approx(3.0 * p["_score"])
    # msm=2 over a 2-term OR query ≡ must semantics
    msm = search_body(spark, out, {
        "query": {"match": {"text": {"query": "spark join", "minimum_should_match": 2}}},
        "size": 50, "track_total_hits": True,
    })
    must = search_body(spark, out, {
        "query": {"match": {"text": {"query": "spark join", "operator": "and"}}},
        "size": 50, "track_total_hits": True,
    })
    assert msm["hits"]["total"] == must["hits"]["total"]
    # "100%" percent form parses to the same count
    pct = search_body(spark, out, {
        "query": {"match": {"text": {"query": "spark join", "minimum_should_match": "100%"}}},
        "size": 50, "track_total_hits": True,
    })
    assert pct["hits"]["total"] == must["hits"]["total"]
    for bad in (
        {"match": {"text": {"query": "x", "analyzer": "english"}}},
        {"match": {"text": {"query": "x", "zero_terms_query": "all"}}},
        {"multi_match": {"query": "x", "fields": ["text"], "operator": "and"}},
        {"bool": {"must": [{"match": {"text": {"query": "x", "boost": 2}}}]}},
    ):
        with pytest.raises(UnsupportedDSL):
            search_body(spark, out, {"query": bad})


def test_profile_option(spark, pfroot):
    out, _ = pfroot
    resp = search_body(spark, out, {
        "query": {"match": {"text": "spark join"}}, "size": 3,
        "profile": True, "_source": True,
    })
    prof = resp["profile"]
    assert set(prof) == {"query_ms", "fetch_ms", "took_ms"}
    assert prof["took_ms"] >= prof["query_ms"] >= 0
    assert prof["fetch_ms"] >= 0
    plain = search_body(spark, out, {"query": {"match": {"text": "spark join"}}, "size": 3})
    assert "profile" not in plain


def test_dis_max_side_field_and_mm_tie_breaker(spark, tmp_path):
    """dis_max sub-match on a SIDE field searches that field (was silently
    searching main); multi_match tie_breaker != 0 rejects."""
    from conveyorbelt_spark.index.build import build_index, write_docstore

    out = str(tmp_path / "dmidx")
    rows = [
        (1, "alpha beta", "gamma delta"),
        (2, "gamma delta", "alpha beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, title string")
    build_index(spark, docs, out, url_col=None, n_buckets=2, field_cols=("title",))
    write_docstore(spark, docs, out, url_col=None)
    resp = search_body(spark, out, {
        "query": {"dis_max": {"queries": [
            {"match": {"title": "alpha"}},
        ], "tie_breaker": 0.0}},
        "size": 5,
    })
    # "alpha" in TITLE only matches doc 2 — a main-field search would hit doc 1
    assert [h["_id"] for h in resp["hits"]["hits"]] == [2]
    with pytest.raises(UnsupportedDSL, match="tie_breaker"):
        search_body(spark, out, {
            "query": {"multi_match": {"query": "alpha", "fields": ["text", "title"],
                                      "tie_breaker": 0.5}},
        })


def test_sort_missing_values_last(spark, tmp_path):
    """ES sorts docs missing the sort field LAST in both directions —
    pinned (Spark's bare asc() would put them first)."""
    from conveyorbelt_spark.index.build import build_index, write_docstore
    from conveyorbelt_spark.index.query import search_sorted

    out = str(tmp_path / "nsidx")
    rows = [(1, "spark", 10), (2, "spark", None), (3, "spark", 5), (4, "spark", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, rank long")
    build_index(spark, docs.select("doc_id", "text"), out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("rank",))
    asc = [r[0] for r in search_sorted(spark, out, "spark", [("rank", "asc")], 10).collect()]
    assert asc == [3, 1, 2, 4]
    desc = [r[0] for r in search_sorted(spark, out, "spark", [("rank", "desc")], 10).collect()]
    assert desc == [1, 3, 2, 4]
