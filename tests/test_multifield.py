"""Multi-field search (ES multi_match): field_cols index extra analyzed
columns as field-qualified postings with per-field tf/dl/df/avgdl; queries
score per field and combine via dis_max (best_fields, the ES default) or
summation (most_fields, one kernel pass with per-term avgdl norms).
Verified token-for-token against a pure-python BM25 oracle.

Also pins the top-k tie determinism fix this feature exposed: argpartition
used to cut score ties at the k boundary arbitrarily; _topk_idx now breaks
ties by doc_id, so mass-tied corpora (short keyword-ish fields) rank
reproducibly and match oracles.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.query import Searcher, multi_match_topk

W = ["spark", "join", "window", "shuffle", "plan", "query", "index", "merge"]


def _mkrows(n=150, seed=5):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choices(W, k=12)), " ".join(rng.choices(W, k=4)))
        for i in range(n)
    ]


def _bm25(rows, fidx, qterms, boost):
    n = len(rows)
    toks = [r[fidx].split() for r in rows]
    avgdl = sum(len(t) for t in toks) / n
    dfc = Counter()
    for t in toks:
        for q in set(qterms) & set(t):
            dfc[q] += 1
    res = {}
    for i, tk in enumerate(toks):
        c = Counter(tk)
        s = 0.0
        for q in sorted(qterms):
            if c[q]:
                s += (
                    boost
                    * math.log(1 + (n - dfc[q] + 0.5) / (dfc[q] + 0.5))
                    * (c[q] * 2.2)
                    / (c[q] + 1.2 * (1 - 0.75 + 0.75 * len(tk) / avgdl))
                )
        if s:
            res[rows[i][0]] = s
    return res


@pytest.fixture(scope="module")
def mroot(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mmidx"))
    rows = _mkrows()
    docs = spark.createDataFrame(rows, "doc_id long, text string, title string")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
        field_cols=("title",),
    )
    q = ["spark", "join"]
    s_text = _bm25(rows, 1, q, 1.0)
    s_title = _bm25(rows, 2, q, 2.0)
    return out, rows, s_text, s_title


def _round(rows):
    return [(d, round(v, 9)) for d, v in rows]


def test_best_fields_matches_oracle(spark, mroot):
    out, rows, s_text, s_title = mroot
    best = {
        d: max(s_text.get(d, float("-inf")), s_title.get(d, float("-inf")))
        for d in set(s_text) | set(s_title)
    }
    want = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = Searcher(spark, out).multi_match_rows("spark join", ["text", "title^2"], 10)
    assert _round(got) == _round(want)


def test_most_fields_matches_oracle(spark, mroot):
    out, rows, s_text, s_title = mroot
    most = {
        d: s_text.get(d, 0.0) + s_title.get(d, 0.0) for d in set(s_text) | set(s_title)
    }
    want = sorted(most.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = Searcher(spark, out).multi_match_rows(
        "spark join", ["text", "title^2"], 10, type="most_fields"
    )
    assert _round(got) == _round(want)


def test_spark_path_matches_serving_path(spark, mroot):
    out, _, _, _ = mroot
    s = Searcher(spark, out)
    for t in ("best_fields", "most_fields"):
        serving = s.multi_match_rows("spark join", ["text", "title^2"], 10, type=t)
        dist = [
            (r.doc_id, r.score)
            for r in multi_match_topk(
                spark, out, "spark join", ["text", "title^2"], 10, type=t
            ).collect()
        ]
        assert serving == dist, t


def test_single_field_queries_unpolluted(spark, mroot):
    """Main-field search ignores title postings entirely (namespaced terms)
    and its corpus stats exclude field-token counts."""
    out, rows, s_text, _ = mroot
    want = sorted(s_text.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = Searcher(spark, out).search_rows("spark join", 10)
    assert _round(got) == _round(want)


def test_title_only_field_query(spark, mroot):
    out, rows, _, s_title = mroot
    want = sorted(s_title.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = Searcher(spark, out).multi_match_rows("spark join", ["title^2"], 10)
    assert _round(got) == _round(want)


def test_topk_tie_break_is_deterministic(spark, mroot):
    """The regression this feature caught: with many docs tied at the k-th
    score (title field: dl=4, tf=1 everywhere), the cut must keep the
    SMALLEST doc_ids of the tie group — the (score desc, doc_id asc)
    contract — not an argpartition-arbitrary subset."""
    out, rows, _, s_title = mroot
    got = Searcher(spark, out).multi_match_rows("spark join", ["title"], 10)
    want = sorted(s_title.items(), key=lambda kv: (-kv[1] / 2.0, kv[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_unknown_type_and_absent_field(spark, mroot):
    out, _, _, _ = mroot
    s = Searcher(spark, out)
    with pytest.raises(ValueError):
        s.multi_match_rows("spark", ["text", "title"], 5, type="cross_fields")
    # a field that was never indexed contributes nothing; query degrades to
    # the fields that exist
    got = s.multi_match_rows("spark join", ["nosuch", "text"], 10)
    assert got == s.search_rows("spark join", 10)


def test_dsl_non_main_match_is_single_field_multi_match(spark, mroot):
    """ES: {"match": {"title": q}} on a side field ≡ multi_match over just
    that field — previously escaped as an internal _NonMainMatch error."""
    from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body

    out, rows, _, _ = mroot
    want = Searcher(spark, out).multi_match_rows("spark join", ["title"], 10)
    resp = search_body(
        spark, out, {"query": {"match": {"title": "spark join"}}, "size": 10}
    )
    assert [(h["_id"], h["_score"]) for h in resp["hits"]["hits"]] == want
    # a lone bool.should non-main match takes the same path
    resp2 = search_body(
        spark, out,
        {"query": {"bool": {"should": [{"match": {"title": "spark join"}}]}}, "size": 10},
    )
    assert [(h["_id"], h["_score"]) for h in resp2["hits"]["hits"]] == want
    # inside must (required semantics over a side field) → clean rejection
    import pytest as _pytest

    with _pytest.raises(UnsupportedDSL, match="title"):
        search_body(
            spark, out,
            {"query": {"bool": {"must": [{"match": {"title": "spark"}}]}}},
        )
    # mixed with other clauses → clean rejection, not mis-scoring
    with _pytest.raises(UnsupportedDSL, match="title"):
        search_body(
            spark, out,
            {"query": {"bool": {"should": [
                {"match": {"title": "spark"}}, {"match": {"text": "join"}},
            ]}}},
        )
