"""ES-request-body DSL: the JSON shapes the reference's users send to
Elasticsearch run verbatim against this engine (supported subset), with
ES-shaped responses. Each body is pinned against the direct API it
dispatches to."""

from __future__ import annotations

import random

import pytest

from conveyorbelt_spark.index.build import build_index, sortable_int_col, write_docstore
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body
from conveyorbelt_spark.index.query import Searcher

W = ["spark", "join", "window", "shuffle", "plan", "query", "index", "merge"]


@pytest.fixture(scope="module")
def droot(spark, tmp_path_factory):
    rng = random.Random(41)
    rows = [
        (i, " ".join(rng.choices(W, k=10)), ["en", "de", "fr"][i % 3], (i * 13) % 400)
        for i in range(150)
    ]
    out = str(tmp_path_factory.mktemp("dslidx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, nc long")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
        keyword_cols=("lang", ("nc", sortable_int_col("nc", 4))),
        positions=True,
    )
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text", "lang", "nc"))
    return out, rows


def _ids(resp):
    return [h["_id"] for h in resp["hits"]["hits"]]


def test_match_equals_search_rows(spark, droot):
    out, _ = droot
    resp = search_body(spark, out, {"query": {"match": {"text": "spark join"}}, "size": 7})
    want = Searcher(spark, out).search_rows("spark join", 7)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want


def test_bool_with_filter_and_range(spark, droot):
    out, _ = droot
    body = {
        "query": {"bool": {
            "should": [{"match": {"text": "spark join"}}],
            "must_not": [{"match": {"text": "merge"}}],
            "filter": [
                {"term": {"lang": "en"}},
                {"range": {"nc": {"gte": "0000", "lte": "0200"}}},
            ],
        }},
        "size": 50,
    }
    resp = search_body(spark, out, body)
    want = Searcher(spark, out).search_rows(
        "spark join", 50, must_not="merge",
        filters={"lang": "en"}, ranges={"nc": ("0000", "0200")},
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want


def test_from_size_pagination(spark, droot):
    out, _ = droot
    p1 = search_body(spark, out, {"query": {"match": {"text": "spark"}}, "size": 5})
    p2 = search_body(
        spark, out, {"query": {"match": {"text": "spark"}}, "size": 5, "from": 5}
    )
    full = Searcher(spark, out).search_rows("spark", 10)
    assert _ids(p1) + _ids(p2) == [d for d, _ in full]


def test_sorted_export_with_search_after(spark, droot):
    out, rows = droot
    body = {
        "query": {"bool": {"filter": [{"term": {"lang": "de"}}],
                           "should": [{"match": {"text": "spark join window shuffle plan query index merge"}}]}},
        "sort": [{"nc": {"order": "desc"}}],
        "size": 5,
    }
    r1 = search_body(spark, out, body)
    assert len(_ids(r1)) == 5
    cursor = r1["hits"]["hits"][-1]["sort"]
    r2 = search_body(spark, out, {**body, "search_after": cursor})
    de = sorted(
        (r for r in rows if r[2] == "de"), key=lambda r: (-r[3], r[0])
    )
    assert _ids(r1) + _ids(r2) == [r[0] for r in de[:10]]


def test_match_all_filter_only_aggs(spark, droot):
    out, rows = droot
    body = {
        "query": {"bool": {"filter": [{"term": {"lang": "fr"}}]}},
        "size": 0,
        "track_total_hits": True,
        "aggs": {"sizes": {"stats": {"field": "nc"}}},
    }
    resp = search_body(spark, out, body)
    fr = [r for r in rows if r[2] == "fr"]
    assert resp["hits"]["total"] == {"value": len(fr), "relation": "eq"}
    st = resp["aggregations"]["sizes"][0]
    assert st["count"] == len(fr) and st["sum"] == sum(r[3] for r in fr)


def test_source_and_highlight(spark, droot):
    out, rows = droot
    resp = search_body(spark, out, {
        "query": {"match": {"text": "spark join"}},
        "size": 3, "_source": True,
        "highlight": {"fields": {"text": {}}},
    })
    h = resp["hits"]["hits"][0]
    assert h["_source"]["lang"] in ("en", "de", "fr")
    assert "<em>" in h["highlight"]["text"][0]


def test_unsupported_shapes_raise(spark, droot):
    out, _ = droot
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {"query": {"match_all": {}}})
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {"query": {"nested": {"path": "x"}}})
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {"query": {"bool": {"filter": [
            {"range": {"nc": {"gt": "0001"}}}
        ]}}, "sort": ["nc"]})


def test_track_total_hits_all_shapes(spark, tmp_path_factory):
    """track_total_hits=True returns EXACT totals ("relation": "eq") on
    every supported query shape — match/bool, phrase, multi_match,
    prefix/fuzzy expansion, more_like_this — verified against brute-force
    python over the corpus."""
    rng = random.Random(77)
    rows = [
        (
            i,
            " ".join(rng.choices(W, k=8)) + (" exact phrase" if i % 5 == 0 else ""),
            " ".join(rng.choices(W, k=3)),
        )
        for i in range(120)
    ]
    out = str(tmp_path_factory.mktemp("ttidx"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, title string")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
        positions=True, field_cols=("title",),
    )
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text",))

    def total(body):
        resp = search_body(spark, out, {**body, "size": 3, "track_total_hits": True})
        assert resp["hits"]["total"]["relation"] == "eq"
        return resp["hits"]["total"]["value"]

    # match (union of docs containing any term)
    n = total({"query": {"match": {"text": "spark join"}}})
    assert n == sum(1 for _, t, _ in rows if "spark" in t.split() or "join" in t.split())
    # phrase
    n = total({"query": {"match_phrase": {"text": "exact phrase"}}})
    assert n == sum(1 for _, t, _ in rows if "exact phrase" in t)
    # multi_match: any field matches
    n = total({"query": {"multi_match": {"query": "spark", "fields": ["text", "title"]}}})
    assert n == sum(
        1 for _, t, ti in rows if "spark" in t.split() or "spark" in ti.split()
    )
    # prefix expansion: all terms starting sp/jo...
    n = total({"query": {"prefix": {"text": "sh"}}})
    assert n == sum(1 for _, t, _ in rows if any(w.startswith("sh") for w in t.split()))
    # fuzzy: 1 edit from 'spork' (prefix_length 1 keeps s-)
    n = total({"query": {"fuzzy": {"text": {"value": "spark", "fuzziness": 1}}}})
    assert n >= sum(1 for _, t, _ in rows if "spark" in t.split())
    # more_like_this by raw text, self not excluded (text form has no id)
    n = total({"query": {"more_like_this": {"like": "spark join window", "min_doc_freq": 1}}})
    assert n == sum(
        1
        for _, t, _ in rows
        if {"spark", "join", "window"} & set(t.split())
    )


def test_search_body_daily_window(spark, tmp_path_factory):
    """ES request bodies against a DAILY root with a time window (the
    Kibana index-pattern shape): match/bool, phrase, filters, sort, aggs,
    exact totals — each pinned against the DailySearcher direct APIs or
    brute force; unsupported window shapes reject cleanly."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index
    from conveyorbelt_spark.index.dsl import search_body_daily

    root = str(tmp_path_factory.mktemp("ddsl"))
    rows = [
        (
            i,
            ("spark join window" if i % 2 == 0 else "shuffle plan merge")
            + (" exact phrase" if i % 5 == 0 else ""),
            ["en", "de"][i % 2],
            100 + (i * 7) % 300,
            dt.datetime(2016, 9, 16 + (i % 4), 12),
        )
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, nc long, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        positions=True, keyword_cols=("lang",), store_cols=("lang", "nc"),
    )
    ds = DailySearcher(spark, root)
    win = (dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 19))

    # match == DailySearcher.search_rows
    resp = search_body_daily(
        spark, root, {"query": {"match": {"text": "spark join"}}, "size": 7},
        time_range=win,
    )
    want = ds.search_rows("spark join", 7, time_range=win)
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want

    # phrase + exact total
    resp = search_body_daily(
        spark, root,
        {"query": {"match_phrase": {"text": "exact phrase"}}, "size": 5,
         "track_total_hits": True},
        time_range=win,
    )
    n_want = sum(1 for i, t, _l, _n, ts in rows if "exact phrase" in t and i % 4 <= 2)
    assert resp["hits"]["total"] == {"value": n_want, "relation": "eq"}
    assert len(resp["hits"]["hits"]) == min(5, n_want)

    # bool + aggs + total
    resp = search_body_daily(
        spark, root,
        {"query": {"bool": {"should": [{"match": {"text": "spark"}}],
                            "filter": [{"term": {"lang": "en"}}]}},
         "size": 3, "track_total_hits": True,
         "aggs": {"langs": {"terms": {"field": "lang"}}}},
        time_range=win,
    )
    match = [r for r in rows if "spark" in r[1] and r[2] == "en" and r[0] % 4 <= 2]
    assert resp["hits"]["total"] == {"value": len(match), "relation": "eq"}
    assert resp["aggregations"]["langs"] == [{"key": "en", "n": len(match)}]

    # sorted export
    resp = search_body_daily(
        spark, root,
        {"query": {"bool": {"should": [{"match": {"text": "spark"}}]}},
         "sort": [{"nc": "desc"}], "size": 4},
        time_range=win,
    )
    ids = [h["_id"] for h in resp["hits"]["hits"]]
    want_ids = [
        i for _, i in sorted(
            ((-n, i) for i, t, _l, n, _ts in rows if "spark" in t and i % 4 <= 2)
        )
    ][:4]
    assert ids == want_ids

    # multi_match window totals are exact too (main-field multi_match)
    resp = search_body_daily(
        spark, root,
        {"query": {"multi_match": {"query": "spark", "fields": ["text"]}},
         "size": 3, "track_total_hits": True},
        time_range=win,
    )
    n_mm = sum(1 for i, t, _l, _n, _ts in rows if "spark" in t and i % 4 <= 2)
    assert resp["hits"]["total"] == {"value": n_mm, "relation": "eq"}


def test_daily_window_mm_expansion_mlt_rank_identity(spark, tmp_path_factory):
    """Windowed multi_match / expansion / more_like_this are rank- AND
    score-identical to a single flat index built over EXACTLY the window's
    documents (merged window stats == window sub-corpus stats), and run
    verbatim through search_body_daily."""
    import datetime as dt

    from conveyorbelt_spark.index.build import build_index, write_docstore
    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index
    from conveyorbelt_spark.index.dsl import search_body_daily

    rng = random.Random(91)
    rows = [
        (
            i,
            " ".join(rng.choices(W, k=10)),
            " ".join(rng.choices(W, k=3)),
            dt.datetime(2016, 9, 16 + (i % 4), 12),
        )
        for i in range(120)
    ]
    root = str(tmp_path_factory.mktemp("dmm"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, title string, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        field_cols=("title",), store_cols=("text",),
    )
    win = (dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 19))  # days 0-2
    flat = str(tmp_path_factory.mktemp("dmmflat"))
    win_docs = docs.where("pmod(doc_id, 4) <= 2")
    build_index(
        spark, win_docs.select("doc_id", "text", "title"), flat, url_col=None,
        n_buckets=2, n_term_buckets=4, field_cols=("title",),
    )
    write_docstore(spark, win_docs, flat, url_col=None, extra_cols=("text",))
    from conveyorbelt_spark.index.query import Searcher

    ds = DailySearcher(spark, root)
    s_flat = Searcher(spark, flat)

    def _r(rows_):
        return [(d, round(v, 9)) for d, v in rows_]

    for mtype in ("best_fields", "most_fields"):
        got = ds.multi_match_rows("spark join", ["text", "title^2"], 10,
                                  type=mtype, time_range=win)
        want = s_flat.multi_match_rows("spark join", ["text", "title^2"], 10, type=mtype)
        assert _r(got) == _r(want), mtype
    # expansions (prefix + fuzzy) — merged-df ranking == flat ranking
    got = ds.expansion_rows("prefix", "sh", 10, time_range=win)
    assert _r(got) == _r(s_flat.prefix_rows("sh", 10))
    got = ds.expansion_rows("fuzzy", "spark", 10, fuzziness=1, time_range=win)
    assert _r(got) == _r(s_flat.fuzzy_rows("spark", 10, fuzziness=1))
    # MLT by raw text and by docstore-resolved id
    got = ds.more_like_this("spark join window", 10, time_range=win, min_doc_freq=1)
    want = s_flat.more_like_this("spark join window", 10, min_doc_freq=1)
    assert _r(got) == _r(want)
    some_id = rows[0][0]
    got = ds.more_like_this(some_id, 5, time_range=win, min_doc_freq=1)
    want = s_flat.more_like_this(some_id, 5, min_doc_freq=1)
    assert _r(got) == _r(want)
    # the DSL routes all three shapes over the window
    resp = search_body_daily(
        spark, root,
        {"query": {"multi_match": {"query": "spark join",
                                   "fields": ["text", "title^2"]}}, "size": 10},
        time_range=win,
    )
    assert [(h["_id"], round(h["_score"], 9)) for h in resp["hits"]["hits"]] == _r(
        s_flat.multi_match_rows("spark join", ["text", "title^2"], 10)
    )
    resp = search_body_daily(
        spark, root, {"query": {"prefix": {"text": "sh"}}, "size": 10},
        time_range=win,
    )
    assert [h["_id"] for h in resp["hits"]["hits"]] == [
        d for d, _ in s_flat.prefix_rows("sh", 10)
    ]
    resp = search_body_daily(
        spark, root,
        {"query": {"more_like_this": {"like": "spark join window",
                                      "min_doc_freq": 1}}, "size": 10},
        time_range=win,
    )
    assert [h["_id"] for h in resp["hits"]["hits"]] == [
        d for d, _ in s_flat.more_like_this("spark join window", 10, min_doc_freq=1)
    ]


def test_daily_window_totals_all_shapes(spark, tmp_path_factory):
    """Windowed track_total_hits is exact on EVERY shape — match/bool,
    phrase, multi_match, expansion, MLT — verified against brute force."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import build_daily_index
    from conveyorbelt_spark.index.dsl import search_body_daily

    rng = random.Random(93)
    rows = [
        (
            i,
            " ".join(rng.choices(W, k=8)) + (" exact phrase" if i % 5 == 0 else ""),
            " ".join(rng.choices(W, k=3)),
            dt.datetime(2016, 9, 16 + (i % 4), 12),
        )
        for i in range(100)
    ]
    root = str(tmp_path_factory.mktemp("dtot"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, title string, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        positions=True, field_cols=("title",), store_cols=("text",),
    )
    win = (dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 19))  # days 0-2
    inwin = [r for r in rows if r[0] % 4 <= 2]

    def total(body):
        resp = search_body_daily(
            spark, root, {**body, "size": 3, "track_total_hits": True},
            time_range=win,
        )
        assert resp["hits"]["total"]["relation"] == "eq"
        return resp["hits"]["total"]["value"]

    n = total({"query": {"match": {"text": "spark join"}}})
    assert n == sum(
        1 for _, t, _ti, _ts in inwin if {"spark", "join"} & set(t.split())
    )
    n = total({"query": {"match_phrase": {"text": "exact phrase"}}})
    assert n == sum(1 for _, t, _ti, _ts in inwin if "exact phrase" in t)
    n = total({"query": {"multi_match": {"query": "spark", "fields": ["text", "title"]}}})
    assert n == sum(
        1 for _, t, ti, _ts in inwin if "spark" in t.split() or "spark" in ti.split()
    )
    n = total({"query": {"prefix": {"text": "sh"}}})
    assert n == sum(
        1 for _, t, _ti, _ts in inwin if any(w.startswith("sh") for w in t.split())
    )
    n = total({"query": {"more_like_this": {"like": "spark join window", "min_doc_freq": 1}}})
    assert n == sum(
        1 for _, t, _ti, _ts in inwin if {"spark", "join", "window"} & set(t.split())
    )


# --------------------------------------------------------------------------
# Round-5 compound DSL: nested bools, top-level filter queries, query_string
# --------------------------------------------------------------------------

def test_nested_bool_in_must_flattens(spark, droot):
    """A bool nested inside must flattens into the engine's single bool
    shape: its should group carries the request's minimum_should_match;
    results are identical to the flat engine call."""
    out, _ = droot
    body = {"query": {"bool": {
        "must": [
            {"match": {"text": "spark"}},
            {"bool": {"should": [{"match": {"text": "window"}},
                                 {"match": {"text": "plan"}}],
                      "minimum_should_match": 1}},
        ],
    }}, "size": 15}
    resp = search_body(spark, out, body)
    want = Searcher(spark, out).search_rows(
        "window plan", 15, must="spark", min_should=1
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want


def test_nested_filter_bool_cross_field_or(spark, droot):
    """bool.filter: [bool.should over DIFFERENT fields] — the Kibana
    multi-pill shape — becomes one cross-field OR posting group."""
    out, rows = droot
    body = {"query": {"bool": {
        "should": [{"match": {"text": "spark join"}}],
        "filter": [{"bool": {"should": [
            {"term": {"lang": "en"}},
            {"range": {"nc": {"gte": "0000", "lte": "0099"}}},
        ]}}],
    }}, "size": 200, "track_total_hits": True}
    resp = search_body(spark, out, body)
    want = {
        i for i, t, lang, nc in rows
        if ({"spark", "join"} & set(t.split())) and (lang == "en" or nc <= 99)
    }
    assert set(_ids(resp)) == want
    assert resp["hits"]["total"] == {"value": len(want), "relation": "eq"}


def test_top_level_term_terms_exists(spark, droot):
    """term / terms / exists as TOP-LEVEL queries: filter-context queries
    with constant score 1.0 in doc_id order (the ES contract)."""
    out, rows = droot
    r1 = search_body(
        spark, out,
        {"query": {"term": {"lang": "de"}}, "size": 100, "track_total_hits": True},
    )
    want1 = sorted(i for i, _, lang, _ in rows if lang == "de")
    assert _ids(r1) == want1[:100]
    assert all(h["_score"] == 1.0 for h in r1["hits"]["hits"])
    assert r1["hits"]["total"] == {"value": len(want1), "relation": "eq"}
    r2 = search_body(spark, out, {"query": {"terms": {"lang": ["en", "fr"]}}, "size": 200})
    assert _ids(r2) == sorted(i for i, _, lang, _ in rows if lang in ("en", "fr"))
    r3 = search_body(
        spark, out,
        {"query": {"exists": {"field": "lang"}}, "size": 200, "track_total_hits": True},
    )
    assert r3["hits"]["total"]["value"] == len(rows)  # every doc carries lang


def test_must_not_term_and_not_bool(spark, droot):
    """must_not accepts keyword clauses, and a nested bool that is a pure
    OR flattens by De Morgan (NOT(a OR b) = NOT a AND NOT b)."""
    out, rows = droot
    body = {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "must_not": [{"term": {"lang": "fr"}}],
    }}, "size": 200}
    got = set(_ids(search_body(spark, out, body)))
    assert got == {i for i, t, lang, _ in rows if "spark" in t.split() and lang != "fr"}
    body2 = {"query": {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "must_not": [{"bool": {"should": [
            {"term": {"lang": "fr"}},
            {"match": {"text": "merge"}},
        ]}}],
    }}, "size": 200}
    got2 = set(_ids(search_body(spark, out, body2)))
    want2 = {
        i for i, t, lang, _ in rows
        if "spark" in t.split() and lang != "fr" and "merge" not in t.split()
    }
    assert got2 == want2


def test_match_inside_filter_is_exact_nonscoring(spark, droot):
    """match in FILTER context: its analyzed tokens become posting
    constraints (OR by default, AND with operator=and) and hits keep their
    UNFILTERED corpus scores (filter context never rescores)."""
    out, rows = droot
    body = {"query": {"bool": {
        "should": [{"match": {"text": "spark"}}],
        "filter": [{"match": {"text": "window plan"}}],
    }}, "size": 200}
    got = {h["_id"]: h["_score"] for h in search_body(spark, out, body)["hits"]["hits"]}
    want = {
        i for i, t, *_ in rows
        if "spark" in t.split() and ({"window", "plan"} & set(t.split()))
    }
    assert set(got) == want
    base = dict(Searcher(spark, out).search_rows("spark", 200))
    assert all(abs(got[i] - base[i]) < 1e-12 for i in got)
    body2 = {"query": {"bool": {
        "should": [{"match": {"text": "spark"}}],
        "filter": [{"match": {"text": {"query": "window plan", "operator": "and"}}}],
    }}, "size": 200}
    got2 = set(_ids(search_body(spark, out, body2)))
    want2 = {
        i for i, t, *_ in rows
        if "spark" in t.split() and {"window", "plan"} <= set(t.split())
    }
    assert got2 == want2


def test_query_string_subset(spark, droot):
    """query_string: terms / +must / -not / field:value filters, and
    default_operator=and. Rank-identical to the flat engine calls."""
    out, _ = droot
    body = {"query": {"query_string": {"query": "+spark join -merge lang:en"}}, "size": 200}
    resp = search_body(spark, out, body)
    want = Searcher(spark, out).search_rows(
        "join", 200, must="spark", must_not="merge",
        or_groups=[[("eq", "lang", "en")]],
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want
    b2 = {"query": {"query_string": {
        "query": "spark join", "default_operator": "and"}}, "size": 50}
    want2 = Searcher(spark, out).search_rows("", 50, must="spark join")
    assert [(h["_id"], h["_score"]) for h in search_body(spark, out, b2)["hits"]["hits"]] == want2
    # a quoted phrase as the whole query dispatches to the phrase path
    from conveyorbelt_spark.index.dsl import parse_query

    assert parse_query({"query_string": {"query": '"spark join"'}})["phrase"] == "spark join"


def test_compound_unsupported_shapes_raise(spark, droot):
    out, _ = droot
    with pytest.raises(UnsupportedDSL):  # NOT of a conjunction
        search_body(spark, out, {"query": {"bool": {
            "must": [{"match": {"text": "spark"}}],
            "must_not": [{"bool": {"must": [
                {"match": {"text": "join"}}, {"match": {"text": "plan"}},
            ]}}],
        }}})
    with pytest.raises(UnsupportedDSL):  # two minimum_should_match groups
        search_body(spark, out, {"query": {"bool": {"must": [
            {"bool": {"should": [{"match": {"text": "join"}}],
                      "minimum_should_match": 1}},
            {"bool": {"should": [{"match": {"text": "plan"}}],
                      "minimum_should_match": 1}},
        ]}}})
    with pytest.raises(UnsupportedDSL):  # Lucene syntax beyond the subset
        search_body(spark, out, {"query": {"query_string": {"query": "(spark OR join)"}}})


def test_score_order_search_after(spark, droot):
    """sort: ["_score"] + search_after pages relevance order seamlessly:
    concatenated pages equal one big ranking (bool shape, with filter
    context); score ties break by doc_id; each hit carries the next
    cursor in "sort"."""
    out, _ = droot
    truth = Searcher(spark, out).search_rows("spark join window", 60)
    body = {"query": {"match": {"text": "spark join window"}},
            "sort": ["_score"], "size": 7}
    pages, cursor = [], None
    for _ in range(12):
        b = dict(body)
        if cursor is not None:
            b["search_after"] = cursor
        hits = search_body(spark, out, b)["hits"]["hits"]
        if not hits:
            break
        pages.extend((h["_id"], h["_score"]) for h in hits)
        cursor = hits[-1]["sort"]
    assert pages[:60] == truth

    truth2 = Searcher(spark, out).search_rows(
        "spark join", 40, or_groups=[[("eq", "lang", "en")]]
    )
    body2 = {"query": {"bool": {"should": [{"match": {"text": "spark join"}}],
                                "filter": [{"term": {"lang": "en"}}]}},
             "sort": [{"_score": {"order": "desc"}}], "size": 9}
    got2, cursor = [], None
    for _ in range(12):
        b = dict(body2)
        if cursor is not None:
            b["search_after"] = cursor
        hits = search_body(spark, out, b)["hits"]["hits"]
        if not hits:
            break
        got2.extend((h["_id"], h["_score"]) for h in hits)
        cursor = hits[-1]["sort"]
    assert got2[:40] == truth2
    with pytest.raises(UnsupportedDSL):  # from + search_after is an ES error
        search_body(spark, out, {
            "query": {"match": {"text": "spark"}}, "sort": ["_score"],
            "from": 3, "search_after": [1.0, 5],
        })
    with pytest.raises(UnsupportedDSL):  # ascending score order unsupported
        search_body(spark, out, {
            "query": {"match": {"text": "spark"}},
            "sort": [{"_score": {"order": "asc"}}],
        })


def test_score_search_after_phrase(spark, tmp_path):
    """Score-order search_after on the PHRASE path (positional kernel):
    pages concatenate to the one-shot phrase ranking."""
    rng = random.Random(77)
    rows = []
    for i in range(60):
        words = rng.choices(W, k=8)
        if i % 2 == 0:
            p = rng.randrange(7)
            words[p : p + 2] = ["spark", "join"]
        rows.append((i, " ".join(words)))
    out = str(tmp_path / "pidx")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
                positions=True)
    s = Searcher(spark, out)
    truth = s.phrase_rows("spark join", 50)
    assert truth  # the fixture really has phrase hits
    body = {"query": {"match_phrase": {"text": "spark join"}},
            "sort": ["_score"], "size": 6}
    got, cursor = [], None
    for _ in range(12):
        b = dict(body)
        if cursor is not None:
            b["search_after"] = cursor
        hits = search_body(spark, out, b)["hits"]["hits"]
        if not hits:
            break
        got.extend((h["_id"], h["_score"]) for h in hits)
        cursor = hits[-1]["sort"]
    assert got == truth[: len(got)] and len(got) >= len(truth) - 6


def test_constant_score_query(spark, droot):
    """constant_score wraps a filter; every hit scores the boost."""
    out, rows = droot
    resp = search_body(spark, out, {
        "query": {"constant_score": {
            "filter": {"bool": {"should": [
                {"term": {"lang": "de"}},
                {"term": {"lang": "fr"}},
            ]}},
            "boost": 2.5,
        }},
        "size": 200, "track_total_hits": True,
    })
    want = sorted(i for i, _, lang, _ in rows if lang in ("de", "fr"))
    assert _ids(resp) == want
    assert all(h["_score"] == 2.5 for h in resp["hits"]["hits"])
    assert resp["hits"]["total"] == {"value": len(want), "relation": "eq"}
    # a match exclusion inside the wrapped filter bool survives the fold
    r2 = search_body(spark, out, {
        "query": {"constant_score": {"filter": {"bool": {
            "must": [{"term": {"lang": "de"}}],
            "must_not": [{"match": {"text": "merge"}}],
        }}}},
        "size": 200, "track_total_hits": True,
    })
    want2 = sorted(
        i for i, t, lang, _ in rows if lang == "de" and "merge" not in t.split()
    )
    assert _ids(r2) == want2
    assert r2["hits"]["total"]["value"] == len(want2)


def test_search_body_reuses_searcher(spark, droot):
    """A long-lived Searcher passed to search_body serves warm and stays
    result-identical to a cold call."""
    out, _ = droot
    s = Searcher(spark, out)
    body = {"query": {"match": {"text": "spark join"}}, "size": 10}
    warm1 = search_body(spark, out, body, searcher=s)
    assert len(s._block_cache) > 0  # the handle's caches were used
    warm2 = search_body(spark, out, body, searcher=s)
    cold = search_body(spark, out, body)
    assert warm1 == warm2 == cold


def test_ids_query_and_must_highlight(spark, droot):
    """ES ids query (existing subset back, constant score, doc_id order,
    exact totals) and highlighting of MUST terms (a must-only bool gets
    highlights too)."""
    out, rows = droot
    resp = search_body(spark, out, {
        "query": {"ids": {"values": [3, 7, 999999, 11, 7]}},
        "size": 10, "track_total_hits": True,
    })
    assert _ids(resp) == [3, 7, 11]
    assert all(h["_score"] == 1.0 for h in resp["hits"]["hits"])
    assert resp["hits"]["total"] == {"value": 3, "relation": "eq"}
    # must-only bool still highlights its terms
    r2 = search_body(spark, out, {
        "query": {"bool": {"must": [{"match": {"text": "spark"}}]}},
        "size": 3, "highlight": {"fields": {"text": {}}},
    })
    assert all("<em>spark</em>" in h["highlight"]["text"][0] for h in r2["hits"]["hits"])


def test_collapse_field(spark, droot):
    """ES field collapsing: one hit per distinct value of the collapse
    field, each group represented by its best-scoring doc, groups ranked
    by that score. Truth = the full relevance ranking with all but the
    first hit per group removed."""
    out, rows = droot
    lang_of = {r[0]: r[2] for r in rows}
    resp = search_body(spark, out, {
        "query": {"match": {"text": "spark join"}},
        "collapse": {"field": "lang"}, "size": 5,
    })
    ranked = Searcher(spark, out).search_rows("spark join", 10_000)
    seen, want = set(), []
    for d, sc in ranked:
        if lang_of[d] in seen:
            continue
        seen.add(lang_of[d])
        want.append((d, sc, lang_of[d]))
    got = [
        (h["_id"], h["_score"], h["fields"]["lang"][0])
        for h in resp["hits"]["hits"]
    ]
    assert [(d, lg) for d, _, lg in got] == [(d, lg) for d, _, lg in want[:5]]
    for (_, g, _), (_, w, _) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)


def test_collapse_with_filter_and_from(spark, droot):
    """Collapse composes with filter context and from-offset paging, and
    rejects the shapes it can't rank exactly (sorted / phrase)."""
    out, rows = droot
    lang_of = {r[0]: r[2] for r in rows}
    body = {
        "query": {"bool": {
            "should": [{"match": {"text": "spark join"}}],
            "filter": [{"range": {"nc": {"gte": "0000", "lte": "0300"}}}],
        }},
        "collapse": {"field": "lang"}, "size": 2, "from": 1,
    }
    resp = search_body(spark, out, body)
    full = search_body(spark, out, {**body, "size": 3, "from": 0})
    assert _ids(resp) == _ids(full)[1:3]
    assert len({lang_of[d] for d in _ids(full)}) == len(_ids(full))
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {
            "query": {"match": {"text": "spark"}},
            "collapse": {"field": "lang"}, "sort": [{"nc": "asc"}],
        })
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {
            "query": {"match_phrase": {"text": "spark join"}},
            "collapse": {"field": "lang"},
        })


def test_rescore_phrase(spark, droot):
    """ES query rescorer: the top window_size hits re-ranked by
    query_weight·bm25 + rescore_query_weight·phrase-score; window docs
    without the phrase keep query_weight·bm25; hits beyond the window are
    untouched. Truth composed from the two public serving APIs."""
    out, _ = droot
    s = Searcher(spark, out)
    body = {
        "query": {"match": {"text": "spark join window"}},
        "rescore": {
            "window_size": 8,
            "query": {
                "rescore_query": {"match_phrase": {"text": "spark join"}},
                "query_weight": 0.7,
                "rescore_query_weight": 1.2,
            },
        },
        "size": 12,
    }
    resp = search_body(spark, out, body)
    base = s.search_rows("spark join window", 12)
    ph = dict(s.phrase_rows("spark join", 10_000))
    head = [
        (d, 0.7 * sc + 1.2 * ph[d] if d in ph else 0.7 * sc)
        for d, sc in base[:8]
    ]
    head.sort(key=lambda t: (-t[1], t[0]))
    want = head + base[8:]
    got = [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]]
    assert [d for d, _ in got] == [d for d, _ in want[:12]]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)
    # the phrase genuinely reordered something (fixture sanity)
    assert [d for d, _ in got[:8]] != [d for d, _ in base[:8]]


def test_rescore_modes_and_guards(spark, droot):
    """score_mode=multiply, sequential multi-rescore, and the shapes
    rescore rejects."""
    out, _ = droot
    s = Searcher(spark, out)
    body = {
        "query": {"match": {"text": "spark join"}},
        "rescore": {
            "window_size": 5,
            "query": {
                "rescore_query": {"match": {"text": "window"}},
                "score_mode": "multiply",
            },
        },
        "size": 5,
    }
    resp = search_body(spark, out, body)
    base = s.search_rows("spark join", 5)
    sec = dict(s.search_rows("window", 10_000, prune=False))
    want = [(d, sc * sec[d] if d in sec else sc) for d, sc in base]
    want.sort(key=lambda t: (-t[1], t[0]))
    got = [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-12)
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {**body, "sort": [{"nc": "asc"}]})
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {**body, "collapse": {"field": "lang"}})
    with pytest.raises(UnsupportedDSL):
        search_body(spark, out, {
            "query": {"match": {"text": "spark"}},
            "rescore": {"query": {"rescore_query": {"prefix": {"text": "sp"}}}},
        })


def test_knn_body(spark, tmp_path):
    """ES kNN section: exact cosine top-k over a stored vector column,
    scored (1 + cos)/2, verified against a numpy truth; composition
    guards raise."""
    import numpy as np

    from conveyorbelt_spark.index.build import build_index, write_docstore

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype(float)
    rows = [(i, "spark join", [float(x) for x in vecs[i]]) for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    out = str(tmp_path / "knnidx")
    build_index(spark, docs.select("doc_id", "text"), out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text", "embedding"))
    qv = [float(x) for x in vecs[7]]
    resp = search_body(spark, out, {
        "knn": {"field": "embedding", "query_vector": qv, "k": 5},
        "_source": True,
    })
    cos = (vecs @ vecs[7]) / (
        np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[7])
    )
    order = sorted(range(40), key=lambda i: (-cos[i], i))[:5]
    got = [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]]
    assert [d for d, _ in got] == order
    for (d, sc), i in zip(got, order):
        assert sc == pytest.approx((1.0 + cos[i]) / 2.0)
    assert resp["hits"]["hits"][0]["_id"] == 7          # self is nearest
    assert resp["hits"]["hits"][0]["_source"]["text"] == "spark join"
    assert resp["hits"]["total"] == {"value": 5, "relation": "eq"}
    with pytest.raises(UnsupportedDSL, match="compose"):
        search_body(spark, out, {
            "knn": {"field": "embedding", "query_vector": qv, "k": 5},
            "query": {"match": {"text": "spark"}},
        })
    with pytest.raises(UnsupportedDSL, match="stored column"):
        search_body(spark, out, {"knn": {"field": "nope", "query_vector": qv}})
