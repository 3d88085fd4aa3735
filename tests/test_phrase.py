"""Positional index + phrase queries: exact token-sequence matching with
Lucene-pinned scoring, bit-exact vs the oracle on the serving path AND the
Spark path; positions survive round-trip encode, incremental deltas, and
compaction."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index, compact_segments
from conveyorbelt_spark.index.oracle import BM25Oracle
from conveyorbelt_spark.index.query import Searcher, bm25_topk, phrase_topk
from conveyorbelt_spark.streaming.incremental import index_batch

N_DOCS = 1200


@pytest.fixture(scope="module")
def pidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pos_idx"))
    docs = corpus_spark_df(spark, N_DOCS, seed=21, n_parts=3)
    build_index(spark, docs, out, n_buckets=8, positions=True)
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    return out, BM25Oracle([(r.doc_id, r.text) for r in rows]), docs


PHRASES_FIXED = [
    "term00000 term00001",
    "term00001 term00000",
    "term00000 term00000",  # repeated token
    "term00000",  # single-token phrase ≡ that term
    "term00000 zzzmissing",  # absent term → empty
]


def test_phrase_from_real_windows(spark, pidx):
    """Phrases cut from real documents MUST hit at least their source doc,
    and results are bit-exact vs the oracle (serving + spark paths)."""
    out, oracle, docs = pidx
    from conveyorbelt_spark.textutils import tokenize

    rows = with_doc_id(docs).select("doc_id", "text").limit(5).collect()
    s = Searcher(spark, out)
    checked = 0
    for r in rows:
        toks = tokenize(r.text)
        if len(toks) < 6:
            continue
        phrase = " ".join(toks[2:5])
        want = oracle.phrase_search(phrase, 10)
        got = s.phrase_rows(phrase, 10)
        assert got == want, phrase
        assert r.doc_id in {d for d, _ in oracle.phrase_search(phrase, 10**6)}
        via_spark = [(x.doc_id, x.score) for x in phrase_topk(spark, out, phrase, 10).collect()]
        assert via_spark == want, phrase
        checked += 1
    assert checked >= 3


@pytest.mark.parametrize("phrase", PHRASES_FIXED)
def test_phrase_fixed_cases(spark, pidx, phrase):
    out, oracle, _ = pidx
    want = oracle.phrase_search(phrase, 10)
    s = Searcher(spark, out)
    assert s.phrase_rows(phrase, 10) == want


def test_phrase_ordering_matters(spark, pidx):
    out, oracle, _ = pidx
    s = Searcher(spark, out)
    big = 10**6
    a = {d for d, _ in s.phrase_rows("term00000 term00001", big)}
    b = {d for d, _ in s.phrase_rows("term00001 term00000", big)}
    bag = {d for d, _ in s.search_rows("term00000 term00001", big, must="term00000 term00001")}
    assert a and b
    assert a <= bag and b <= bag  # phrase hits ⊆ conjunctive bag hits
    assert a != bag or b != bag  # adjacency actually constrains


def test_bm25_still_works_on_positional_index(spark, pidx):
    """The poss column never burdens bag-of-words queries (pruned out of
    the scan) and scores stay oracle-exact."""
    out, oracle, _ = pidx
    got = [(r.doc_id, r.score) for r in bm25_topk(spark, out, "term00000 term00123", 10).collect()]
    assert got == oracle.search("term00000 term00123", 10)


def test_phrase_on_nonpositional_index_raises(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nopos_idx"))
    docs = corpus_spark_df(spark, 100, seed=5, n_parts=1)
    build_index(spark, docs, out, n_buckets=8)
    with pytest.raises(ValueError, match="positions"):
        Searcher(spark, out).phrase_rows("term00000 term00001", 5)


def test_phrase_survives_deltas_and_compaction(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pos_inc"))
    a = corpus_spark_df(spark, 300, seed=31, n_parts=1)
    b = corpus_spark_df(spark, 300, seed=32, n_parts=1, part_offset=1)
    index_batch(spark, a, out, 0, n_buckets=8, positions=True)
    index_batch(spark, b, out, 1, n_buckets=8, positions=True)
    rows = with_doc_id(a.union(b)).select("doc_id", "text").collect()
    oracle = BM25Oracle([(r.doc_id, r.text) for r in rows])
    from conveyorbelt_spark.textutils import tokenize

    toks = tokenize(rows[0].text)
    phrase = " ".join(toks[1:4])
    s = Searcher(spark, out)
    want = oracle.phrase_search(phrase, 10)
    assert s.phrase_rows(phrase, 10) == want
    compact_segments(spark, out)
    s2 = Searcher(spark, out)
    assert s2.phrase_rows(phrase, 10) == want
