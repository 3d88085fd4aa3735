"""Searcher posting-block LRU (the ES node-query-cache analogue): repeat
terms skip the parquet read; results stay bit-identical to a cold
Searcher; every index mutation invalidates via the stats mtime."""

from __future__ import annotations

import random

import pytest

from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.delete import delete_docs
from conveyorbelt_spark.index.query import Searcher

W = ["spark", "join", "window", "shuffle", "plan", "query", "index", "merge"]


@pytest.fixture()
def cidx(spark, tmp_path):
    rng = random.Random(51)
    rows = [(i, " ".join(rng.choices(W, k=10))) for i in range(150)]
    out = str(tmp_path / "cidx")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8)
    return out, rows


def test_warm_repeat_is_identical_and_cached(spark, cidx):
    out, _ = cidx
    s = Searcher(spark, out)
    cold = s.search_rows("spark join", 20)
    assert len(s._block_cache) == 2  # both terms cached
    warm = s.search_rows("spark join", 20)
    assert warm == cold
    # overlapping query reuses one term, reads the other
    mixed = s.search_rows("spark window", 20)
    fresh = Searcher(spark, out).search_rows("spark window", 20)
    assert mixed == fresh
    assert len(s._block_cache) == 3


def test_mutation_invalidates_cache(spark, cidx):
    out, _ = cidx
    s = Searcher(spark, out)
    base = dict(s.search_rows("spark join", 500))
    victim = sorted(base)[0]
    delete_docs(spark, out, [victim])
    after = dict(s.search_rows("spark join", 500))  # same handle, warm cache
    assert victim not in after
    assert set(after) == set(base) - {victim}


def test_lru_cap(spark, cidx):
    out, _ = cidx
    s = Searcher(spark, out, cache_terms=2)
    s.search_rows("spark join", 5)
    s.search_rows("window plan", 5)
    assert len(s._block_cache) <= 2
    # still correct with the cap thrashing
    assert s.search_rows("spark join", 5) == Searcher(spark, out).search_rows(
        "spark join", 5
    )


def test_phrase_and_bag_caches_are_separate(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "big data spark join"), (2, "spark join big"), (3, "join spark")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "pidx")
    build_index(spark, docs, out, url_col=None, n_buckets=2, n_term_buckets=4,
                positions=True)
    s = Searcher(spark, out)
    bag = s.search_rows("spark join", 10)  # caches WITHOUT poss
    ph = s.phrase_rows("spark join", 10)   # must not reuse the poss-less frames
    assert {d for d, _ in ph} == {1, 2}
    assert {d for d, _ in bag} == {1, 2, 3}
    assert ph == Searcher(spark, out).phrase_rows("spark join", 10)


def test_byte_budget_evicts_by_bytes(spark, cidx):
    """The LRU budget is BYTES, not term count: one stopword-grade term's
    frame can dwarf many rare terms'. Eviction must track actual buffer
    sizes, and warm results must stay identical through the thrash."""
    out, _ = cidx
    s = Searcher(spark, out)
    s.search_rows("spark join window plan", 10)
    assert s._block_cache_total == sum(s._block_cache_sizes.values())
    assert s._block_cache_total > 0
    per = dict(s._block_cache_sizes)
    # budget that fits ~2 of the 4 cached frames: older entries must go
    budget = sorted(per.values())[-1] + sorted(per.values())[-2] + 1
    s2 = Searcher(spark, out, cache_bytes=budget)
    cold = s2.search_rows("spark join window plan", 10)
    assert s2._block_cache_total <= budget
    assert len(s2._block_cache) < 4
    assert s2._block_cache_total == sum(s2._block_cache_sizes.values())
    # warm/cold parity unchanged under byte-eviction
    assert s2.search_rows("spark join window plan", 10) == cold
    # a frame larger than the whole budget is never pinned
    s3 = Searcher(spark, out, cache_bytes=1)
    r3 = s3.search_rows("spark join", 10)
    assert len(s3._block_cache) == 0
    assert s3._block_cache_total == 0
    assert r3 == Searcher(spark, out).search_rows("spark join", 10)


def test_tp_cache_byte_budget(spark, cidx):
    """The decoded-postings memo (the level below the block LRU) is also
    byte-accounted: one stopword-grade decoded frame plus many small ones
    must evict by BYTES (LRU order), never clear-all, and warm results
    stay bit-identical through the thrash."""
    from conveyorbelt_spark.index.query import _TpCache

    out, _ = cidx
    s = Searcher(spark, out)
    truth = s.search_rows("spark join window plan", 10)
    assert isinstance(s._tp_cache, _TpCache)
    assert len(s._tp_cache) > 0
    assert s._tp_cache.total == sum(s._tp_cache._sizes.values())
    assert s._tp_cache.total > 0
    sizes = sorted(s._tp_cache._sizes.values())
    # budget fitting ~half the decoded entries: older ones must go, the
    # accounting invariant must hold, and results must not change
    budget = sum(sizes[len(sizes) // 2 :]) + 1
    s2 = Searcher(spark, out)
    s2._tp_cache = _TpCache(budget)
    cold = s2.search_rows("spark join window plan", 10)
    assert cold == truth
    assert s2._tp_cache.total <= budget
    assert 0 < len(s2._tp_cache) < len(s._tp_cache)
    assert s2._tp_cache.total == sum(s2._tp_cache._sizes.values())
    assert s2.search_rows("spark join window plan", 10) == truth
    # a decoded frame larger than the whole budget is never pinned
    s3 = Searcher(spark, out)
    s3._tp_cache = _TpCache(1)
    r3 = s3.search_rows("spark join", 10)
    assert len(s3._tp_cache) == 0 and s3._tp_cache.total == 0
    assert r3 == Searcher(spark, out).search_rows("spark join", 10)


def test_tp_cache_invalidates_with_mutation(spark, cidx):
    out, _ = cidx
    s = Searcher(spark, out)
    base = dict(s.search_rows("spark join", 500))
    assert len(s._tp_cache) > 0
    victim = sorted(base)[0]
    delete_docs(spark, out, [victim])
    after = dict(s.search_rows("spark join", 500))
    assert victim not in after and set(after) == set(base) - {victim}
