"""ES filter context over keyword-field postings.

The reference gets filtered search for free from Elasticsearch (keyword
mappings in mappings/*.json, e.g. AzureIisLog.json's not_analyzed fields,
feed ES term/range filters). Here the same Lucene design is built into the
index: ``keyword_cols`` index ``field:value`` terms with tf=0, and
``filters``/``ranges`` intersect their postings inside the scoring kernel —
no docstore scan, no driver-side doc set, works at any matching-set size.

Pinned semantics (ES filter context):
- hits are restricted, scores are NOT changed (idf/avgdl stay corpus-wide);
- {field: [v1, v2]} is an OR within the field, fields AND together;
- ranges are inclusive string-order bounds over indexed values;
- a filter on a never-indexed value yields zero hits, cheaply.
"""

from __future__ import annotations

import random

import pytest

from conveyorbelt_spark.index.build import (
    build_index,
    sortable_int,
    sortable_int_col,
    write_docstore,
)
from conveyorbelt_spark.index.query import (
    Searcher,
    bm25_topk,
    bool_doc_ids,
    expand_prefix,
    expand_wildcard,
    facet_counts_spark,
)

LANGS = ["en", "de", "fr"]
WORDS = ["spark", "join", "window", "shuffle", "plan", "query", "index", "merge"]


def _mkdocs(n=200, seed=7):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choices(WORDS, k=12)), LANGS[i % 3], i % 50)
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def froot(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fidx"))
    rows = _mkdocs()
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, stars long")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
        keyword_cols=("lang", ("stars", sortable_int_col("stars", 4))),
    )
    write_docstore(spark, docs, out, url_col=None, extra_cols=("lang",))
    return out, rows


def test_term_filter_restricts_without_rescoring(spark, froot):
    out, rows = froot
    s = Searcher(spark, out)
    base = dict(s.search_rows("spark join", 500))
    hits = s.search_rows("spark join", 500, filters={"lang": "en"})
    en = {i for i, _, lang, _ in rows if lang == "en"}
    assert {d for d, _ in hits} == {d for d in base if d in en}
    # ES filter context: surviving docs keep EXACTLY their unfiltered score
    assert all(abs(base[d] - sc) < 1e-12 for d, sc in hits)


def test_or_filter_and_field_and(spark, froot):
    out, rows = froot
    s = Searcher(spark, out)
    base = dict(s.search_rows("spark join", 500))
    hits = s.search_rows("spark join", 500, filters={"lang": ["en", "fr"]})
    want = {i for i, _, lang, _ in rows if lang in ("en", "fr")}
    assert {d for d, _ in hits} == {d for d in base if d in want}
    both = s.search_rows(
        "spark join", 500,
        filters={"lang": "en"},
        ranges={"stars": (sortable_int(0, 4), sortable_int(9, 4))},
    )
    want2 = {i for i, _, lang, st in rows if lang == "en" and st <= 9}
    assert {d for d, _ in both} == {d for d in base if d in want2}


def test_range_filter_inclusive_bounds(spark, froot):
    out, rows = froot
    s = Searcher(spark, out)
    base = dict(s.search_rows("spark join", 500))
    hits = s.search_rows(
        "spark join", 500,
        ranges={"stars": (sortable_int(10, 4), sortable_int(19, 4))},
    )
    want = {i for i, _, _, st in rows if 10 <= st <= 19}
    assert {d for d, _ in hits} == {d for d in base if d in want}


def test_spark_path_matches_serving_path(spark, froot):
    out, rows = froot
    s = Searcher(spark, out)
    local = s.search_rows("spark join", 50, filters={"lang": "de"})
    dist = [
        (r.doc_id, r.score)
        for r in bm25_topk(spark, out, "spark join", 50, filters={"lang": "de"}).collect()
    ]
    assert local == dist


def test_unindexed_value_is_provably_empty(spark, froot):
    out, _ = froot
    s = Searcher(spark, out)
    assert s.search_rows("spark join", 10, filters={"lang": "xx"}) == []
    assert s.search_rows("spark join", 10, ranges={"stars": ("9998", "9999")}) == []
    assert bm25_topk(spark, out, "spark join", 10, filters={"lang": "xx"}).count() == 0


def test_bool_doc_ids_and_facets_with_filters(spark, froot):
    out, rows = froot
    s = Searcher(spark, out)
    base = dict(s.search_rows("spark join", 500))
    ids = {r.doc_id for r in bool_doc_ids(spark, out, "spark join", filters={"lang": "en"}).collect()}
    en = {i for i, _, lang, _ in rows if lang == "en"}
    assert ids == {d for d in base if d in en}
    fc = {
        r.facet: r.n
        for r in facet_counts_spark(
            spark, out, "lang", "spark join",
            ranges={"stars": (sortable_int(0, 4), sortable_int(24, 4))},
        ).collect()
    }
    want: dict[str, int] = {}
    for i, _, lang, st in rows:
        if i in base and st <= 24:
            want[lang] = want.get(lang, 0) + 1
    assert fc == want


def test_keyword_terms_stay_out_of_text_expansions(spark, froot):
    out, _ = froot
    # 's' prefixes both text terms (spark, shuffle) and stars:#### keywords
    assert all(":" not in t for t in expand_prefix(out, "s"))
    assert all(":" not in t for t in expand_prefix(out, "la"))
    # but a pattern that targets the keyword space finds it
    kw = expand_wildcard(out, "lang:e*")
    assert kw == ["lang:en"]


def test_filters_survive_incremental_runs(spark, tmp_path):
    """Multi-run index: keyword postings from delta batches filter exactly
    like base-run ones (the multi-run concat path in the kernel)."""
    from conveyorbelt_spark.streaming.incremental import index_batch

    out = str(tmp_path / "inc")
    rows = _mkdocs(120, seed=11)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, stars long")
    for b, (lo, hi) in enumerate([(0, 40), (40, 80), (80, 120)]):
        part = df.where((df.doc_id >= lo) & (df.doc_id < hi))
        index_batch(
            spark, part, out, b, url_col=None, n_buckets=4, n_term_buckets=8,
            keyword_cols=("lang",),
        )
    s = Searcher(spark, out)
    base = dict(s.search_rows("spark join", 500))
    hits = s.search_rows("spark join", 500, filters={"lang": "fr"})
    fr = {i for i, _, lang, _ in rows if lang == "fr"}
    assert {d for d, _ in hits} == {d for d in base if d in fr}
    assert all(abs(base[d] - sc) < 1e-12 for d, sc in hits)


def test_positional_index_with_keywords(spark, tmp_path):
    """keyword_cols on a positions=True build: empty position bytes ride the
    keyword postings; phrase search and filters coexist."""
    out = str(tmp_path / "pos")
    rows = [
        (1, "big data spark join", "en"),
        (2, "spark join big data", "de"),
        (3, "join spark", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    build_index(
        spark, docs, out, url_col=None, n_buckets=2, n_term_buckets=4,
        positions=True, keyword_cols=("lang",),
    )
    s = Searcher(spark, out)
    ph = s.phrase_rows("spark join", 10)
    assert {d for d, _ in ph} == {1, 2}
    f = s.search_rows("spark join", 10, filters={"lang": "en"})
    assert {d for d, _ in f} == {1, 3}


def test_daily_searcher_filters(spark, tmp_path):
    import datetime as dt

    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index

    root = str(tmp_path / "daily")
    rows = []
    for i in range(80):
        rows.append((
            i, "spark join window plan"[: 10 + (i % 3) * 5],
            LANGS[i % 3],
            dt.datetime(2016, 9, 16 + (i % 3), 12, 0, 0),
        ))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        keyword_cols=("lang",),
    )
    ds = DailySearcher(spark, root)
    base = dict(ds.search_rows("spark join", 500))
    hits = ds.search_rows("spark join", 500, filters={"lang": "en"})
    en = {i for i, txt, lang, _ in rows if lang == "en" and "spark" in txt}
    assert {d for d, _ in hits} <= set(base)
    assert {d for d, _ in hits} == {d for d in base if d in en}
    # windowed + filtered
    win = ds.search_rows(
        "spark join", 500,
        time_range=(dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 17)),
        filters={"lang": "en"},
    )
    day0_en = {i for i, txt, lang, _ in rows if lang == "en" and i % 3 == 0}
    assert {d for d, _ in win} <= day0_en
