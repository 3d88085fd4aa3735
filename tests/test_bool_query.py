"""ES bool-query surface (SHOULD / MUST / MUST_NOT): bit-exact vs the
pure-Python oracle on both the serving path and the Spark path, pruned and
unpruned (the boolean candidate filter must never change an answer, only
skip work)."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.oracle import BM25Oracle
from conveyorbelt_spark.index.query import Searcher, bm25_topk

N_DOCS = 1500

CASES = [
    {"should": "term00000 term00123", "must": "term00050", "must_not": ""},
    {"should": "term00000", "must": "", "must_not": "term00050"},
    {"should": "term00000 term00001", "must": "term00002 term00003", "must_not": "term00123"},
    {"should": "", "must": "term00000 term00050", "must_not": ""},  # must-only scores
    {"should": "term00000", "must": "zzzmissing", "must_not": ""},  # absent must → empty
    {"should": "term00000", "must": "", "must_not": "zzzmissing"},  # absent not → no-op
    {"should": "term00001 term05000", "must": "term00001", "must_not": "term00000"},
]


@pytest.fixture(scope="module")
def bidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bool_idx"))
    docs = corpus_spark_df(spark, N_DOCS, seed=13, n_parts=4)
    build_index(spark, docs, out, n_buckets=8)
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    return out, BM25Oracle([(r.doc_id, r.text) for r in rows])


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"{c['should']}|+{c['must']}|-{c['must_not']}")
def test_bool_query_rank_identical(spark, bidx, case):
    out, oracle = bidx
    want = oracle.bool_search(case["should"], case["must"], case["must_not"], 10)
    s = Searcher(spark, out)
    got = s.search_rows(case["should"], 10, must=case["must"] or None,
                        must_not=case["must_not"] or None)
    assert got == want
    # unpruned must agree (filter changes work, never answers)
    got_np = s.search_rows(case["should"], 10, prune=False,
                           must=case["must"] or None, must_not=case["must_not"] or None)
    assert got_np == want
    # distributed path agrees
    via_spark = [
        (r.doc_id, r.score)
        for r in bm25_topk(
            spark, out, case["should"], 10,
            must=case["must"] or None, must_not=case["must_not"] or None,
        ).collect()
    ]
    assert via_spark == want


def test_prefix_query(spark, bidx):
    """Prefix expansion: highest-df terms under the prefix, scored as a
    SHOULD bag — identical to an explicit bag over the expanded terms."""
    from conveyorbelt_spark.index.query import expand_prefix

    out, oracle = bidx
    terms = expand_prefix(out, "term0000")
    assert terms and all(t.startswith("term0000") for t in terms)
    # highest-df first: expansion order matches corpus dfs
    dfs = [len(oracle.postings[t]) for t in terms]
    assert dfs == sorted(dfs, reverse=True)
    s = Searcher(spark, out)
    got = s.prefix_rows("term0000", 10)
    want = oracle.bool_search(should=" ".join(terms), k=10)
    assert got == want
    assert s.prefix_rows("zzznothing", 10) == []


def test_bool_query_nontrivial_results(spark, bidx):
    """Guard against vacuously-empty cases: the main combos return hits and
    the filters actually change the result set."""
    out, oracle = bidx
    s = Searcher(spark, out)
    plain = s.search_rows("term00000 term00123", 10)
    musted = s.search_rows("term00000 term00123", 10, must="term00050")
    notted = s.search_rows("term00000 term00123", 10, must_not="term00050")
    assert plain and musted and notted
    assert {d for d, _ in musted} != {d for d, _ in plain}
    assert {d for d, _ in notted}.isdisjoint({d for d, _ in musted})


@pytest.mark.parametrize("case", CASES[:4], ids=lambda c: f"cap|{c['should']}|+{c['must']}")
def test_max_candidates_slicing_is_exact(spark, bidx, case):
    """Kernel memory guard: a tiny max_candidates forces every bucket group
    through the doc-range slicing fallback (blocks chosen by min/max
    metadata before decode); results must stay bit-identical, pruned and
    unpruned, serving and Spark path."""
    out, oracle = bidx
    want = oracle.bool_search(case["should"], case["must"], case["must_not"], 10)
    s_capped = Searcher(spark, out, max_candidates=40)
    got = s_capped.search_rows(case["should"], 10, must=case["must"] or None,
                               must_not=case["must_not"] or None)
    assert got == want
    got_np = s_capped.search_rows(case["should"], 10, prune=False,
                                  must=case["must"] or None,
                                  must_not=case["must_not"] or None)
    assert got_np == want
    via_spark = [
        (r.doc_id, r.score)
        for r in bm25_topk(
            spark, out, case["should"], 10, max_candidates=40,
            must=case["must"] or None, must_not=case["must_not"] or None,
        ).collect()
    ]
    assert via_spark == want


def test_max_candidates_actually_slices(spark, bidx):
    """Guard that the cap genuinely engages: the query terms' bucket groups
    hold more postings than the cap."""
    from conveyorbelt_spark.index.build import load_stats
    from conveyorbelt_spark.index.query import _lookup_terms

    out, _ = bidx
    stats = load_stats(out)
    entries = _lookup_terms(spark, out, ["term00000"], stats["n_term_buckets"])
    # df spread over n_buckets groups; cap=40 must be below the biggest
    assert entries and entries[0]["df"] / stats["n_buckets"] > 40 * 1.5


@pytest.mark.parametrize("m", [1, 2, 3])
def test_minimum_should_match(spark, bidx, m):
    """ES minimum_should_match: hits must match ≥ m SHOULD terms; scoring
    unchanged. Bit-exact vs the oracle on every path, with and without the
    memory-guard slicing."""
    out, oracle = bidx
    q = "term00000 term00001 term00123"
    want = oracle.bool_search(q, k=10, min_should=m)
    assert want, m  # corpus dense enough that even m=3 has hits
    s = Searcher(spark, out)
    assert s.search_rows(q, 10, min_should=m) == want
    assert s.search_rows(q, 10, prune=False, min_should=m) == want
    got_spark = [
        (r.doc_id, r.score)
        for r in bm25_topk(spark, out, q, 10, min_should=m).collect()
    ]
    assert got_spark == want
    capped = Searcher(spark, out, max_candidates=40)
    assert capped.search_rows(q, 10, min_should=m) == want
    # m=1 is the plain SHOULD semantics; m over all terms = intersection
    if m == 1:
        assert want == oracle.bool_search(q, k=10)
    # m greater than the number of SHOULD terms → provably empty
    assert s.search_rows(q, 10, min_should=4) == []


def test_min_should_composes_with_must_not(spark, bidx):
    out, oracle = bidx
    q = "term00000 term00001 term00002"
    want = oracle.bool_search(q, must_not="term00123", k=10, min_should=2)
    s = Searcher(spark, out)
    assert s.search_rows(q, 10, must_not="term00123", min_should=2) == want


def test_min_should_distributed_hit_set(spark, bidx):
    """bool_doc_ids honors min_should (the facet candidate generator)."""
    from conveyorbelt_spark.index.query import bool_doc_ids

    out, oracle = bidx
    q = "term00000 term00001 term00123"
    want = {
        d for d, _ in oracle.bool_search(q, k=10**9, min_should=2)
    }
    got = {r.doc_id for r in bool_doc_ids(spark, out, q, min_should=2).collect()}
    assert got == want
