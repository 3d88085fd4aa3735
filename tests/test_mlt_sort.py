"""more_like_this and sort-by-field / search_after (the remaining everyday
ES query surface: 'find similar documents' and Kibana's sorted tables with
cursor pagination)."""

from __future__ import annotations

import random

import pytest

from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.query import Searcher, search_sorted

W = ["spark", "join", "window", "shuffle", "plan", "query", "index", "merge"]


@pytest.fixture(scope="module")
def sroot(spark, tmp_path_factory):
    rng = random.Random(13)
    rows = [
        (i, " ".join(rng.choices(W, k=10)), W[i % 4], (i * 11) % 97)
        for i in range(120)
    ]
    # 7 carries rare distinctive terms; 119 duplicates it exactly — the MLT
    # nearest neighbor (rare high-idf terms dominate the interestingness
    # ranking, so the selected query bag pins the duplicate)
    rows[7] = (7, "zebra quagga okapi lemur zebra quagga spark join", W[7 % 4], (7 * 11) % 97)
    rows[119] = (119, rows[7][1], "dup", 5)
    out = str(tmp_path_factory.mktemp("mlt"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, tag string, rank long")
    build_index(spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text", "tag", "rank"))
    return out, rows


def test_mlt_finds_the_duplicate_first(spark, sroot):
    out, rows = sroot
    s = Searcher(spark, out)
    got = s.more_like_this(7, 5)
    assert got, "no MLT hits"
    assert got[0][0] == 119  # the exact duplicate ranks first
    assert all(d != 7 for d, _ in got)  # self excluded
    # raw-text likes work without a docstore text column
    got2 = s.more_like_this(rows[7][1], 5, exclude_self=False)
    assert got2[0][0] in (7, 119)


def test_mlt_term_selection_knobs(spark, sroot):
    out, rows = sroot
    s = Searcher(spark, out)
    # min_doc_freq above corpus df of every term → nothing to query
    assert s.more_like_this(7, 5, min_doc_freq=10_000) == []
    # max_query_terms=1 still returns hits (single strongest term)
    assert s.more_like_this(7, 5, max_query_terms=1)


def test_mlt_requires_stored_text_for_id_likes(spark, tmp_path):
    out = str(tmp_path / "plain")
    docs = spark.createDataFrame(
        [(1, "spark join"), (2, "join window")], "doc_id long, text string"
    )
    build_index(spark, docs, out, url_col=None, n_buckets=2, n_term_buckets=4)
    write_docstore(spark, docs, out, url_col=None)  # no text column stored
    with pytest.raises(ValueError):
        Searcher(spark, out).more_like_this(1, 5)


def _matching(rows):
    return [r for r in rows if {"spark", "join"} & set(r[1].split())]


def test_sort_by_field_matches_truth(spark, sroot):
    out, rows = sroot
    got = [
        tuple(r)
        for r in search_sorted(
            spark, out, "spark join", [("rank", "desc"), ("tag", "asc")], 15
        ).collect()
    ]
    want = sorted(_matching(rows), key=lambda r: (-r[3], r[2], r[0]))[:15]
    # result columns: doc_id, then the sort fields in spec order
    assert got == [(r[0], r[3], r[2]) for r in want]


def test_search_after_pagination_is_seamless(spark, sroot):
    out, rows = sroot
    s = Searcher(spark, out)
    sort = [("rank", "desc")]
    page1 = s.sorted_rows("spark join", sort, 10)
    # rows are (doc_id, rank); the cursor is the sort-key tuple (rank, doc_id)
    last = page1[-1]
    cursor = (last[1], last[0])
    page2 = s.sorted_rows("spark join", sort, 10, search_after=cursor)
    both = [r[0] for r in page1 + page2]
    want = sorted(_matching(rows), key=lambda r: (-r[3], r[0]))[:20]
    assert both == [r[0] for r in want]
    assert not (set(r[0] for r in page1) & set(r[0] for r in page2))


def test_sort_composes_with_filters(spark, tmp_path):
    rng = random.Random(17)
    rows = [
        (i, " ".join(rng.choices(W, k=8)), W[i % 3], i % 7) for i in range(90)
    ]
    out = str(tmp_path / "fidx")
    docs = spark.createDataFrame(rows, "doc_id long, text string, tag string, rank long")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
        keyword_cols=("tag",),
    )
    write_docstore(spark, docs, out, url_col=None, extra_cols=("tag", "rank"))
    got = [
        tuple(r)
        for r in search_sorted(
            spark, out, "spark join", [("rank", "asc")], 50,
            filters={"tag": "spark"},
        ).collect()
    ]
    want = sorted(
        (r for r in rows if ({"spark", "join"} & set(r[1].split())) and r[2] == "spark"),
        key=lambda r: (r[3], r[0]),
    )[:50]
    assert [g[0] for g in got] == [r[0] for r in want]


def test_search_after_crosses_null_boundary(spark, tmp_path):
    """r05 VERDICT repro: docs whose sort field is MISSING sort last
    (ES missing=_last) and must still be reachable from pages after the
    first — including resuming from a NULL-valued cursor."""
    rows = [
        (1, "spark join alpha", 10),
        (2, "spark join beta", None),
        (3, "spark join gamma", 5),
        (4, "spark join delta", None),
        (5, "spark join epsilon", 7),
        (6, "spark join zeta", None),
    ]
    out = str(tmp_path / "nidx")
    docs = spark.createDataFrame(rows, "doc_id long, text string, rank long")
    build_index(spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("rank",))
    s = Searcher(spark, out)
    sort = [("rank", "asc")]
    # ES total order: rank asc nulls last, doc_id asc tiebreak
    want = [3, 5, 1, 2, 4, 6]

    got, cursor = [], None
    for _ in range(4):
        page = s.sorted_rows("spark join", sort, 2, search_after=cursor)
        if not page:
            break
        got.extend(r[0] for r in page)
        last = page[-1]
        cursor = (last[1], last[0])  # (rank, doc_id) — rank may be None
    assert got == want, got

    # page 3 resumes from a NULL cursor (2's rank) and must return 4, 6
    # exactly once — before the fix this page came back empty
    page3 = s.sorted_rows("spark join", sort, 2, search_after=(None, 2))
    assert [r[0] for r in page3] == [4, 6]
    # descending: nulls still last, same reachability
    got_d, cur = [], None
    for _ in range(4):
        page = s.sorted_rows("spark join", [("rank", "desc")], 2, search_after=cur)
        if not page:
            break
        got_d.extend(r[0] for r in page)
        cur = (page[-1][1], page[-1][0])
    assert got_d == [1, 5, 3, 2, 4, 6], got_d
