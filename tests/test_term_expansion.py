"""Prefix / wildcard / fuzzy term expansion over the sorted term_index copy
and its range sidecar, checked against brute-force scans of the oracle's
full vocabulary. Also pins the pruning property: a prefix expansion opens
only the sidecar files whose range overlaps."""

from __future__ import annotations

import json
import os
import re

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import TERM_RANGES_FILE, build_index
from conveyorbelt_spark.index.oracle import BM25Oracle
from conveyorbelt_spark.index.query import (
    Searcher,
    _edit_distance_le,
    expand_fuzzy,
    expand_prefix,
    expand_regexp,
    expand_wildcard,
    suggest_terms,
)
from conveyorbelt_spark.streaming.incremental import index_batch

N_DOCS = 1000


@pytest.fixture(scope="module")
def eidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp_idx"))
    docs = corpus_spark_df(spark, N_DOCS, seed=41, n_parts=4)
    # explicit n_term_buckets=64: this module pins the RANGE-PRUNING
    # property of the term_index sidecar, which needs the multi-file
    # at-scale layout (the adaptive default would coalesce a 1k-doc
    # index's term_index to one file)
    build_index(spark, docs, out, n_buckets=8, n_term_buckets=64)
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    return out, BM25Oracle([(r.doc_id, r.text) for r in rows])


def _rank(oracle, terms):
    """Brute-force ES expansion ranking: df desc, term asc."""
    return [
        t for t, _ in sorted(
            ((t, len(oracle.postings[t])) for t in terms), key=lambda kv: (-kv[1], kv[0])
        )
    ]


def test_sidecar_exists_and_prunes(eidx):
    out, _ = eidx
    sidecar = os.path.join(out, TERM_RANGES_FILE)
    assert os.path.exists(sidecar)
    with open(sidecar) as f:
        ranges = json.load(f)
    assert len(ranges) >= 2  # several range files — pruning is possible
    lo, hi = "term00500", "term00501"
    overlapping = [
        rel for rel, (mn, mx) in ranges.items() if mn < hi and mx >= lo
    ]
    assert 0 < len(overlapping) < len(ranges)  # a narrow range prunes files
    # ranges tile the term space in sorted order without overlap
    spans = sorted(ranges.values())
    for (_, mx_a), (mn_b, _) in zip(spans, spans[1:]):
        assert mx_a <= mn_b


def test_prefix_matches_bruteforce(eidx):
    out, oracle = eidx
    for prefix in ("term0012", "term005", "term", "zzz"):
        want = _rank(oracle, [t for t in oracle.postings if t.startswith(prefix)])[:50]
        assert expand_prefix(out, prefix) == want, prefix


def test_wildcard_matches_bruteforce(eidx):
    out, oracle = eidx
    for pat in ("term001?3", "term00*9", "*m00001", "term0000?", "nope*"):
        rx = re.compile(
            "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pat
            ) + "$"
        )
        want = _rank(oracle, [t for t in oracle.postings if rx.match(t)])[:50]
        assert expand_wildcard(out, pat) == want, pat


def test_regexp_matches_bruteforce(eidx):
    out, oracle = eidx
    for pat in ("term001[0-4]3", "term00(1|2)9", "term0{2}00[13]", "nope.*"):
        rx = re.compile(pat)
        want = _rank(oracle, [t for t in oracle.postings if rx.fullmatch(t)])[:50]
        assert expand_regexp(out, pat) == want, pat


def test_suggest_completions(eidx):
    out, oracle = eidx
    got = suggest_terms(out, "term00", 10)
    want = sorted(
        ((t, len(oracle.postings[t])) for t in oracle.postings if t.startswith("term00")),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    assert got == want
    assert suggest_terms(out, "zzz", 5) == []


def test_fuzzy_matches_bruteforce(eidx):
    out, oracle = eidx

    def lev(a, b):
        import itertools

        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(d[j] + 1, nd[j - 1] + 1, d[j - 1] + (ca != cb)))
            d = nd
        return d[-1]

    for q, fz, pl in (("term00001", 1, 1), ("term0012", 1, 4), ("term00001", 2, 1)):
        want = _rank(
            oracle,
            [
                t for t in oracle.postings
                if t[:pl] == q[:pl] and lev(q, t) <= fz
            ],
        )[:50]
        got = expand_fuzzy(out, q, fuzziness=fz, prefix_length=pl)
        assert got == want, (q, fz, pl)


def test_edit_distance_kernel():
    cases = [
        ("abc", "abc", 0, True), ("abc", "abd", 1, True), ("abc", "abd", 0, False),
        ("abc", "ab", 1, True), ("abc", "abcd", 1, True), ("abc", "xyz", 2, False),
        ("kitten", "sitting", 2, False), ("kitten", "sitting", 3, True),
        ("", "ab", 2, True), ("", "abc", 2, False),
    ]
    for a, b, k, want in cases:
        assert _edit_distance_le(a, b, k) is want, (a, b, k)


def test_wildcard_fuzzy_rows_score_as_should_bag(spark, eidx):
    out, oracle = eidx
    s = Searcher(spark, out)
    terms = expand_wildcard(out, "term0000?")
    assert terms
    assert s.wildcard_rows("term0000?", 10) == oracle.bool_search(" ".join(terms), k=10)
    terms_f = expand_fuzzy(out, "term00001", 1, 1)
    assert terms_f
    assert s.fuzzy_rows("term00001", 10) == oracle.bool_search(" ".join(terms_f), k=10)
    assert s.wildcard_rows("zzz*", 10) == []
    assert s.fuzzy_rows("zzzzzzzzz", 10) == []


def test_incremental_batches_update_term_index(spark, eidx, tmp_path_factory):
    """Delta batches keep term_index + sidecar in step: terms first seen in
    a later batch expand; dfs merge across runs."""
    out = str(tmp_path_factory.mktemp("exp_inc"))
    a = corpus_spark_df(spark, 300, seed=1, n_parts=1)
    b = corpus_spark_df(spark, 300, seed=2, n_parts=1, part_offset=1)
    index_batch(spark, a, out, 0, n_buckets=8)
    index_batch(spark, b, out, 1, n_buckets=8)
    docs = a.unionByName(b)
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    oracle = BM25Oracle([(r.doc_id, r.text) for r in rows])
    for prefix in ("term0012", "term000"):
        want = _rank(oracle, [t for t in oracle.postings if t.startswith(prefix)])[:50]
        assert expand_prefix(out, prefix) == want, prefix


def test_fuzzy_deletes_sidecar_prefix0(spark, tmp_path_factory):
    """prefix_length=0 fuzzy over the SymSpell k-deletes sidecar: exact
    vs a brute-force full-vocabulary scan, AND bounded file reads — the
    probe opens only the query variants' hash buckets, not the whole
    dictionary (the Lucene automaton-over-FST role)."""
    import glob

    from conveyorbelt_spark.index.build import FUZZY_DELETES_DIR
    from conveyorbelt_spark.index.query import _fuzzy_deletes_probe

    out = str(tmp_path_factory.mktemp("fuzzdel"))
    docs = corpus_spark_df(spark, 600, seed=47, n_parts=4)
    build_index(spark, docs, out, n_buckets=4, fuzzy_deletes=True)
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    oracle = BM25Oracle([(r.doc_id, r.text) for r in rows])

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(d[j] + 1, nd[j - 1] + 1, d[j - 1] + (ca != cb)))
            d = nd
        return d[-1]

    for q in ("term00001", "xerm00012", "term0034"):
        want = _rank(oracle, [t for t in oracle.postings if lev(q, t) <= 1])[:50]
        got = expand_fuzzy(out, q, fuzziness=1, prefix_length=0)
        assert got == want, q

    # bounded-files: the probe reads a strict subset of the sidecar files
    total_files = len(glob.glob(os.path.join(out, FUZZY_DELETES_DIR, "db=*", "run=*", "*.parquet")))
    _pdf, n_read = _fuzzy_deletes_probe(out, "term00001", 1)
    assert 0 < n_read < total_files
    # fuzziness beyond the sidecar's max_edits falls back (returns None)
    assert _fuzzy_deletes_probe(out, "term00001", 2) is None
    # ...and expand_fuzzy still answers exactly via the full scan
    want2 = _rank(oracle, [t for t in oracle.postings if lev("term00001", t) <= 2])[:50]
    assert expand_fuzzy(out, "term00001", fuzziness=2, prefix_length=0) == want2


def test_fuzzy_deletes_updated_by_delta(spark, tmp_path_factory):
    """Incremental batches keep the k-deletes sidecar in step: a term that
    only exists in a delta run is fuzzy-findable at prefix_length=0."""
    out = str(tmp_path_factory.mktemp("fuzzdel2"))
    docs = corpus_spark_df(spark, 200, seed=48, n_parts=2)
    build_index(spark, docs, out, n_buckets=2, fuzzy_deletes=True)
    delta = spark.createDataFrame(
        [("https://d/1", "zebrafish zebrafish plan")], "url string, text string"
    )
    index_batch(spark, delta, out, "zb", n_buckets=2)
    assert "zebrafish" in expand_fuzzy(out, "zebrafizh", fuzziness=1, prefix_length=0)
