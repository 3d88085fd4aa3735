"""Sliced scroll: {"slice": {"id": i, "max": m}} partitions a query's
result set into m disjoint doc_id % m classes; m scrolls drained in
parallel tile one unsliced export exactly (the ES parallel-reindex idiom,
Elasticsearch's sliced-scroll API). The slice predicate applies at kernel
candidate formation, so per-slice top-k / search_after paging is exact."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.dsl import UnsupportedDSL, scroll_body, search_body
from conveyorbelt_spark.index.query import Searcher, bm25_topk

N_DOCS = 300
QUERY = {"match": {"text": "term00000 term00002"}}
M = 4


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sliced") / "idx")
    docs = with_doc_id(corpus_spark_df(spark, N_DOCS, seed=31, n_parts=2))
    build_index(spark, docs.select("doc_id", "text"), out, url_col=None,
                n_buckets=4)
    return out


def _drain(spark, out, body):
    hits = []
    for page in scroll_body(spark, out, dict(body)):
        hits.extend((h["_id"], h["_score"]) for h in page["hits"]["hits"])
    return hits


def test_slices_tile_the_full_export(spark, idx):
    full = _drain(spark, idx, {"query": QUERY, "size": 37})
    assert len(full) > M  # the query matches a meaningful set
    sliced = []
    for i in range(M):
        part = _drain(spark, idx, {"query": QUERY, "size": 10,
                                   "slice": {"id": i, "max": M}})
        assert all(d % M == i for d, _ in part)  # the ES partition rule
        # each slice is internally (score desc, doc_id asc) — its own
        # exact ranking, not a filtered view of merged pages
        assert part == sorted(part, key=lambda r: (-r[1], r[0]))
        sliced.extend(part)
    assert sorted(sliced) == sorted(full)  # disjoint and complete
    assert len({d for d, _ in sliced}) == len(sliced)


def test_sliced_search_rows_matches_post_filter(spark, idx):
    s = Searcher(spark, idx)
    full = s.search_rows("term00000 term00002", 10_000)
    for i in range(M):
        want = [(d, sc) for d, sc in full if d % M == i]
        got = s.search_rows("term00000 term00002", 10_000, slice_mod=(i, M))
        assert got == want


def test_sliced_distributed_path_matches_kernel(spark, idx):
    got = [
        (r.doc_id, round(r.score, 9))
        for r in bm25_topk(spark, idx, "term00000 term00002", 10_000,
                           slice_mod=(2, M)).collect()
    ]
    s = Searcher(spark, idx)
    want = [(d, round(sc, 9))
            for d, sc in s.search_rows("term00000 term00002", 10_000,
                                       slice_mod=(2, M))]
    assert got == want


def test_slice_body_validation(spark, idx):
    with pytest.raises(UnsupportedDSL, match="id.*max|max >= 2"):
        search_body(spark, idx, {"query": QUERY, "slice": {"id": 0, "max": 1}})
    with pytest.raises(UnsupportedDSL, match="0 <= id < max"):
        search_body(spark, idx, {"query": QUERY, "slice": {"id": 4, "max": 4}})
    with pytest.raises(UnsupportedDSL, match='\\{"id": int, "max": int\\}'):
        search_body(spark, idx, {"query": QUERY, "slice": {"max": 4}})
    with pytest.raises(UnsupportedDSL, match="relevance-ranked"):
        search_body(spark, idx, {"query": QUERY, "track_total_hits": True,
                                 "slice": {"id": 0, "max": 4}})
    with pytest.raises(UnsupportedDSL, match="relevance-ranked"):
        search_body(spark, idx, {"query": {"match_phrase": {"text": "a b"}},
                                 "slice": {"id": 0, "max": 4}})
