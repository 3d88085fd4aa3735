"""Configurable analyzer chain (ES custom-analyzer analogue): stopwords,
min token length, minimal plural stemming — applied vectorized at build
and identically (same regexes) to queries via the persisted stats config.
Parity pinned by scoring a built index against a pure-python BM25 oracle
over ``textutils.analyze``'d tokens."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.query import Searcher, bm25_topk
from conveyorbelt_spark.textutils import ENGLISH_STOPWORDS, analyze, stem_s

AZ = {"stopwords": "english", "stem": "s"}


def test_stem_s_rules():
    assert stem_s("queries") == "query"
    assert stem_s("bodies") == "body"
    assert stem_s("windows") == "window"
    assert stem_s("shuffles") == "shuffle"  # -[iaoe]es guard: 'les' unprotected
    assert stem_s("glass") == "glass"  # -ss
    assert stem_s("virus") == "virus"  # -us
    assert stem_s("goes") == "goes"  # -oes protected
    assert stem_s("dies") == "dies"  # -ies with 1-char stem protected
    assert stem_s("gas") == "gas"  # too short
    assert stem_s("window") == "window"  # no trailing s


def test_analyze_chain():
    toks = analyze(
        "The windows and the queries of a plan",
        {"stopwords": sorted(ENGLISH_STOPWORDS), "min_len": 1, "stem": "s"},
    )
    assert toks == ["window", "query", "plan"]


def _mkdocs(n=120, seed=23):
    rng = random.Random(seed)
    base = ["windows", "queries", "plans", "shuffle", "merge", "the", "and", "of"]
    return [(i, " ".join(rng.choices(base, k=12))) for i in range(n)]


def _oracle(rows, qtext, k):
    az = {"stopwords": sorted(ENGLISH_STOPWORDS), "min_len": 1, "stem": "s"}
    toks = [analyze(t, az) for _, t in rows]
    n = len(rows)
    avgdl = sum(len(t) for t in toks) / n
    q = sorted(set(analyze(qtext, az)))
    dfc = Counter()
    for t in toks:
        for w in set(q) & set(t):
            dfc[w] += 1
    res = {}
    for i, tk in enumerate(toks):
        c = Counter(tk)
        s = 0.0
        for w in q:
            if c[w]:
                s += (
                    math.log(1 + (n - dfc[w] + 0.5) / (dfc[w] + 0.5))
                    * (c[w] * 2.2)
                    / (c[w] + 1.2 * (1 - 0.75 + 0.75 * len(tk) / avgdl))
                )
        if s:
            res[rows[i][0]] = s
    return sorted(res.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.fixture(scope="module")
def aidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("azidx"))
    rows = _mkdocs()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8, analyzer=AZ
    )
    return out, rows


def test_analyzed_index_matches_oracle(spark, aidx):
    out, rows = aidx
    want = _oracle(rows, "window query", 15)
    got = Searcher(spark, out).search_rows("window query", 15)
    assert [(d, round(v, 9)) for d, v in got] == [(d, round(v, 9)) for d, v in want]


def test_query_side_analysis_matches_build_side(spark, aidx):
    out, rows = aidx
    s = Searcher(spark, out)
    # surface forms and stems hit identically (both analyze to the stems)
    assert s.search_rows("windows queries", 15) == s.search_rows("window query", 15)
    # stopwords contribute nothing
    assert s.search_rows("the window and query of", 15) == s.search_rows(
        "window query", 15
    )
    assert s.search_rows("the and of", 15) == []
    # spark path agrees
    sp = [(r.doc_id, r.score) for r in bm25_topk(spark, out, "windows", 15).collect()]
    assert sp == s.search_rows("windows", 15)


def test_analyzer_with_incremental_batches(spark, tmp_path):
    from conveyorbelt_spark.streaming.incremental import index_batch

    out = str(tmp_path / "inc")
    rows = _mkdocs(80, seed=31)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for b, (lo, hi) in enumerate([(0, 40), (40, 80)]):
        index_batch(
            spark, df.where((df.doc_id >= lo) & (df.doc_id < hi)), out, b,
            url_col=None, n_buckets=4, n_term_buckets=8, analyzer=AZ,
        )
    want = _oracle(rows, "window query", 15)
    got = Searcher(spark, out).search_rows("window query", 15)
    assert [(d, round(v, 9)) for d, v in got] == [(d, round(v, 9)) for d, v in want]


def test_analyzer_plus_positions_rejected(spark, tmp_path):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="positions"):
        build_index(
            spark, docs, str(tmp_path / "x"), url_col=None, positions=True,
            analyzer=AZ,
        )
