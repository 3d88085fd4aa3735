"""ES match_phrase slop (proximity matching) — anchor-window semantics
pinned by _phrase_kernel's docstring: an anchor (slot-0 start x) matches
when every later slot has a position within ±slop of its expected place
x+slot; sloppyFreq = number of matching anchors. slop=0 must stay
bit-identical to the exact scorer; one intervening token needs slop 1 and
a transposition slop 2 (the ES-documented thresholds)."""

from __future__ import annotations

import math

import pytest

from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.query import Searcher, phrase_doc_ids, phrase_topk

DOCS = [
    (0, "alpha beta gamma"),
    (1, "alpha gamma beta"),
    (2, "gamma alpha"),
    (3, "alpha delta delta gamma"),
    (4, "beta delta"),
    (5, "alpha beta gamma alpha gamma"),
]


def _sloppy_truth(query: str, slop: int) -> dict[int, float]:
    """Brute-force anchor-window scorer over DOCS (same semantics,
    independent code path)."""
    toks = query.split()
    n = len(DOCS)
    texts = {i: t.split() for i, t in DOCS}
    df = {
        t: sum(1 for w in texts.values() if t in w) for t in set(toks)
    }
    idf_sum = sum(
        math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in toks
    )
    avgdl = sum(len(w) for w in texts.values()) / n
    out = {}
    for i, words in texts.items():
        pos = {}
        for p, w in enumerate(words):
            pos.setdefault(w, []).append(p)
        if any(t not in pos for t in toks):
            continue
        anchors = 0
        for x in pos[toks[0]]:
            if all(
                any(abs((p - s) - x) <= slop for p in pos[t])
                for s, t in enumerate(toks[1:], start=1)
            ):
                anchors += 1
        if not anchors:
            continue
        dl = len(words)
        w = (anchors * 2.2) / (anchors + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
        out[i] = idf_sum * w
    return out


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("slop_idx"))
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=2, positions=True)
    return out


@pytest.mark.parametrize(
    "slop,want_ids",
    [(0, {1, 5}), (1, {0, 1, 5}), (2, {0, 1, 2, 3, 5})],
)
def test_slop_matching_thresholds(spark, sidx, slop, want_ids):
    """Gap of one token → slop 1; transposition and gap of two → slop 2;
    scores match the independent brute-force anchor-window scorer; the
    serving and Spark paths agree exactly."""
    s = Searcher(spark, sidx)
    got = s.phrase_rows("alpha gamma", 10, slop=slop)
    truth = _sloppy_truth("alpha gamma", slop)
    assert {d for d, _ in got} == want_ids == set(truth)
    for d, sc in got:
        assert sc == pytest.approx(truth[d])
    via_spark = [
        (r.doc_id, r.score)
        for r in phrase_topk(spark, sidx, "alpha gamma", 10, slop=slop).collect()
    ]
    assert via_spark == got


def test_slop_zero_is_exact(spark, sidx):
    """slop=0 goes through the exact intersect path — identical rows."""
    s = Searcher(spark, sidx)
    assert s.phrase_rows("alpha gamma", 10, slop=0) == s.phrase_rows(
        "alpha gamma", 10
    )


def test_sloppy_freq_counts_anchors(spark, sidx):
    """Doc 5 has TWO matching anchors at slop 1 (positions 0 and 3) but
    one at slop 0 — the sloppyFreq feeds tfNorm, so its slop-1 score
    strictly exceeds its slop-0 score."""
    s = Searcher(spark, sidx)
    sc0 = dict(s.phrase_rows("alpha gamma", 10, slop=0))[5]
    sc1 = dict(s.phrase_rows("alpha gamma", 10, slop=1))[5]
    assert sc1 > sc0


def test_slop_doc_ids_and_dsl(spark, sidx):
    """phrase_doc_ids honors slop (exact track_total_hits for sloppy
    bodies), and the DSL accepts {"query": ..., "slop": n} — serving hits
    and the distributed total agree with the kernel."""
    from conveyorbelt_spark.index.dsl import search_body

    ids = {r.doc_id for r in phrase_doc_ids(spark, sidx, "alpha gamma", slop=1).collect()}
    assert ids == {0, 1, 5}
    resp = search_body(
        spark, sidx,
        {
            "query": {"match_phrase": {"text": {"query": "alpha gamma", "slop": 1}}},
            "size": 10, "track_total_hits": True,
        },
    )
    assert resp["hits"]["total"] == {"value": 3, "relation": "eq"}
    assert {h["_id"] for h in resp["hits"]["hits"]} == {0, 1, 5}
    # no-slop body unchanged
    resp0 = search_body(
        spark, sidx,
        {"query": {"match_phrase": {"text": "alpha gamma"}}, "size": 10},
    )
    assert {h["_id"] for h in resp0["hits"]["hits"]} == {1, 5}


def test_slop_daily_window(spark, tmp_path_factory):
    """Daily positional indexes take slop through the same kernel."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index

    root = str(tmp_path_factory.mktemp("slop_daily"))
    rows = [
        (i, t, dt.datetime(2016, 9, 16 + (i % 2), 12)) for i, t in DOCS
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, warc_ts timestamp")
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, positions=True
    )
    ds = DailySearcher(spark, root)
    got = ds.phrase_rows("alpha gamma", 10, slop=1)
    truth = _sloppy_truth("alpha gamma", 1)
    assert {d for d, _ in got} == set(truth)
    for d, sc in got:
        assert sc == pytest.approx(truth[d])
