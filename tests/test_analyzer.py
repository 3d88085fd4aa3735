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


def test_analyzed_positions_phrase(spark, tmp_path):
    """analyzer + positions compose via Lucene position-increment gaps:
    a removed stopword leaves a hole in the position stream, and phrase
    queries match across the hole at the original slot distance."""
    from conveyorbelt_spark.index.query import phrase_topk

    out = str(tmp_path / "apidx")
    rows = [
        (1, "the quick fox jumps over the lazy dog"),
        (2, "quick fox and lazy dog"),
        (3, "fox quick dog lazy"),
        (4, "the quick brown fox"),
        (5, "over lazy dog"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(
        spark, docs, out, url_col=None, n_buckets=4, n_term_buckets=8,
        positions=True, analyzer=AZ,
    )
    s = Searcher(spark, out)
    # adjacency across surviving tokens (docs 1, 2; not 4: brown intervenes)
    assert sorted(d for d, _ in s.phrase_rows("quick fox", 10)) == [1, 2]
    # stopword INSIDE the phrase: "over the lazy" → over@0, lazy@2 — doc 1
    # has over@4, lazy@6 (gap where 'the' was); doc 5 has over/lazy ADJACENT
    # so the 2-slot pattern must NOT match it (Lucene increment semantics)
    assert [d for d, _ in s.phrase_rows("over the lazy", 10)] == [1]
    # stems participate in phrases: doc 1's 'jumps' indexed as 'jump', and
    # the query side stems identically — surface and stem forms both hit
    assert [d for d, _ in s.phrase_rows("fox jumps", 10)] == [1]
    assert [d for d, _ in s.phrase_rows("fox jump", 10)] == [1]
    # leading stopword is slot-normalized away
    assert sorted(d for d, _ in s.phrase_rows("the quick fox", 10)) == [1, 2]
    # distributed path agrees with the serving path
    sp = [(r.doc_id, round(r.score, 9)) for r in phrase_topk(spark, out, "over the lazy", 10).collect()]
    assert sp == [(d, round(v, 9)) for d, v in s.phrase_rows("over the lazy", 10)]


def test_analyzed_positions_incremental(spark, tmp_path):
    """index_batch supports analyzer+positions too (same gap semantics)."""
    from conveyorbelt_spark.streaming.incremental import index_batch

    out = str(tmp_path / "apinc")
    rows = [
        (1, "the quick fox jumps over the lazy dog"),
        (2, "quick fox and lazy dog"),
        (3, "over lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    index_batch(
        spark, df.where(df.doc_id <= 1), out, 0, url_col=None,
        n_buckets=2, n_term_buckets=4, positions=True, analyzer=AZ,
    )
    index_batch(
        spark, df.where(df.doc_id > 1), out, 1, url_col=None,
        n_buckets=2, n_term_buckets=4,
    )
    s = Searcher(spark, out)
    assert [d for d, _ in s.phrase_rows("over the lazy", 10)] == [1]
    assert sorted(d for d, _ in s.phrase_rows("quick fox", 10)) == [1, 2]
