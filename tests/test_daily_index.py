"""Time-sliced daily indexes (IndexNamer semantics): date-range pruning,
rank identity vs a sub-corpus oracle, incremental day routing, retention.
Reference: IndexNamer.cs:21-41 (one index per day, prefix-yyyyMMdd),
MasterScheduler.cs:205-239 (per-day index creation)."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.corpus import EPOCH, corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.daily import (
    DailySearcher,
    build_daily_index,
    daily_index_batch,
    day_dir,
    list_days,
    select_days,
)
from conveyorbelt_spark.index.oracle import BM25Oracle

N_DOCS = 800
N_DAYS = 4


def _spread_days(docs):
    """Deterministically spread warc_ts over N_DAYS days by doc_id."""
    docs = with_doc_id(docs)
    return docs.withColumn(
        "warc_ts",
        F.expr(f"timestampadd(DAY, cast(pmod(doc_id, {N_DAYS}) as int), warc_ts)"),
    )


@pytest.fixture(scope="module")
def droot(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daily_idx"))
    docs = _spread_days(corpus_spark_df(spark, N_DOCS, seed=23, n_parts=4))
    stats = build_daily_index(
        spark, docs, root, url_col=None, n_buckets=4, store_docs=True
    )
    assert len(stats) == N_DAYS
    rows = docs.select("doc_id", "text", "warc_ts").collect()
    return root, rows


def _window(days_from: int, days_to: int):
    lo = EPOCH + dt.timedelta(days=days_from)
    hi = EPOCH.replace(hour=0, minute=0, second=0) + dt.timedelta(days=days_to + 1)
    return lo.replace(hour=0, minute=0, second=0), hi


def test_layout_and_day_selection(droot):
    root, _ = droot
    days = list_days(root)
    assert days == ["20160916", "20160917", "20160918", "20160919"]
    assert select_days(root, None) == days
    assert select_days(root, _window(1, 2)) == ["20160917", "20160918"]
    assert select_days(root, (None, _window(0, 0)[1])) == ["20160916"]
    assert select_days(root, (EPOCH + dt.timedelta(days=3), None)) == ["20160919"]
    # an exclusive bound mid-day includes that day (day granularity)
    assert select_days(
        root, (EPOCH + dt.timedelta(days=1), EPOCH + dt.timedelta(days=2, hours=5))
    ) == ["20160917", "20160918"]


QUERY = "term00000 term00123"


def test_date_bounded_rank_identity(spark, droot):
    """A time-ranged search over the daily root is rank-identical to a
    pure-Python oracle built over EXACTLY the window's documents (merged
    window stats = sub-corpus stats)."""
    root, rows = droot
    lo, hi = _window(1, 2)
    sub = [
        (r.doc_id, r.text) for r in rows
        if lo <= r.warc_ts.replace(tzinfo=None) < hi
    ]
    assert 0 < len(sub) < len(rows)
    want = BM25Oracle(sub).search(QUERY, 10)
    assert want
    s = DailySearcher(spark, root)
    got = s.search_rows(QUERY, 10, time_range=(lo, hi))
    assert got == want
    via_spark = [
        (r.doc_id, r.score)
        for r in s.search(QUERY, 10, time_range=(lo, hi)).collect()
    ]
    assert via_spark == want
    # bool surface respects the window too
    want_b = BM25Oracle(sub).bool_search(QUERY, must="term00002", k=10)
    got_b = s.search_rows(QUERY, 10, time_range=(lo, hi), must="term00002")
    assert got_b == want_b


def test_unbounded_equals_full_corpus(spark, droot):
    root, rows = droot
    want = BM25Oracle([(r.doc_id, r.text) for r in rows]).search(QUERY, 10)
    got = DailySearcher(spark, root).search_rows(QUERY, 10)
    assert got == want


def test_pruned_scan_touches_only_selected_days(spark, droot, tmp_path_factory):
    """THE pruning guarantee: with every non-selected day's files made
    unreadable, a windowed query still answers (it never opens them)."""
    root, rows = droot
    scratch = str(tmp_path_factory.mktemp("hide"))
    lo, hi = _window(1, 1)
    keep = {"20160917"}
    moved = []
    try:
        for d in list_days(root):
            if d not in keep:
                src = day_dir(root, d)
                dst = os.path.join(scratch, f"day={d}")
                # leave the day dir discoverable but its CONTENTS absent
                shutil.move(os.path.join(src, "segments"), os.path.join(dst + ".seg"))
                moved.append((os.path.join(dst + ".seg"), os.path.join(src, "segments")))
        s = DailySearcher(spark, root)
        sub = [
            (r.doc_id, r.text) for r in rows
            if lo <= r.warc_ts.replace(tzinfo=None) < hi
        ]
        assert s.search_rows(QUERY, 10, time_range=(lo, hi)) == BM25Oracle(sub).search(QUERY, 10)
    finally:
        for src, dst in moved:
            shutil.move(src, dst)


def test_daily_index_batch_routes_by_day(spark, droot, tmp_path_factory):
    """Incremental batches split by event day; two delta batches into the
    same days still score exactly (per-day multi-run groups)."""
    root2 = str(tmp_path_factory.mktemp("daily_inc"))
    docs = _spread_days(corpus_spark_df(spark, 400, seed=29, n_parts=2))
    # split independent of the day assignment (doc_id % N_DAYS): both
    # batches must hit every day
    a = docs.where(F.pmod("doc_id", F.lit(2 * N_DAYS)) < N_DAYS)
    b = docs.where(F.pmod("doc_id", F.lit(2 * N_DAYS)) >= N_DAYS)
    r1 = daily_index_batch(spark, a, root2, 0, url_col=None, n_buckets=4)
    r2 = daily_index_batch(spark, b, root2, 1, url_col=None, n_buckets=4)
    assert set(r1) == set(r2) == set(list_days(root2))
    assert all(r1.values()) and all(r2.values())
    # replay is a per-day no-op
    r3 = daily_index_batch(spark, a, root2, 0, url_col=None, n_buckets=4)
    assert not any(r3.values())
    rows = docs.select("doc_id", "text", "warc_ts").collect()
    lo, hi = _window(0, 1)
    sub = [
        (r.doc_id, r.text) for r in rows
        if lo <= r.warc_ts.replace(tzinfo=None) < hi
    ]
    want = BM25Oracle(sub).search(QUERY, 10)
    got = DailySearcher(spark, root2).search_rows(QUERY, 10, time_range=(lo, hi))
    assert got == want


def test_retention_is_a_directory_delete(spark, droot, tmp_path_factory):
    """Dropping a day dir removes exactly that day from every query."""
    root, rows = droot
    root3 = str(tmp_path_factory.mktemp("retention"))
    for d in list_days(root):
        shutil.copytree(day_dir(root, d), day_dir(root3, d))
    shutil.rmtree(day_dir(root3, "20160916"))
    assert list_days(root3) == ["20160917", "20160918", "20160919"]
    lo, hi = _window(1, 3)
    sub = [
        (r.doc_id, r.text) for r in rows
        if lo <= r.warc_ts.replace(tzinfo=None) < hi
    ]
    got = DailySearcher(spark, root3).search_rows(QUERY, 10)
    assert got == BM25Oracle(sub).search(QUERY, 10)


def test_search_docs_resolves_across_days(spark, droot):
    root, _ = droot
    s = DailySearcher(spark, root)
    out = s.search_docs(QUERY, 5, time_range=_window(0, 3))
    assert len(out) == 5
    assert all("url" in r and r["url"].startswith("https://") for r in out)


def test_conveyor_routes_to_daily_indexes(spark, tmp_path_factory):
    """SourceSpec(daily_index=True): a conveyor cycle writes per-day
    sub-indexes (the reference's IndexNamer/MasterScheduler daily-ES-index
    path) that DailySearcher can query with a time_range."""
    from conveyorbelt_spark.conveyor import SourceRegistry, SourceSpec, run_source

    tbl = str(tmp_path_factory.mktemp("dconv") / "pages")
    docs = _spread_days(corpus_spark_df(spark, 300, seed=37, n_parts=2)).drop("doc_id")
    docs.write.parquet(tbl)
    idx = str(tmp_path_factory.mktemp("dconv_idx"))
    reg = SourceRegistry(str(tmp_path_factory.mktemp("dconv_reg") / "sources.json"))
    start = EPOCH.replace(tzinfo=dt.timezone.utc) - dt.timedelta(minutes=1)
    spec = SourceSpec(
        "biz", "daily_web", tbl,
        ts_col="warc_ts",
        last_offset_point=start.isoformat(),
        daily_index=True,
    )
    reg.save([spec])
    # the synthesized warc_ts spreads over 4 days — schedule far past all
    n = run_source(spark, spec, idx, reg, now=start + dt.timedelta(days=5))
    assert n == 300
    assert len(list_days(idx)) == N_DAYS
    s = DailySearcher(spark, idx)
    lo, hi = _window(1, 2)
    rows_all = s.search_rows(QUERY, 10)
    rows_win = s.search_rows(QUERY, 10, time_range=(lo, hi))
    assert rows_all and rows_win and rows_all != rows_win
    # replayed cycle (lost registry update) is a no-op that still advances
    spec.last_offset_point = start.isoformat()
    assert run_source(spark, spec, idx, reg, now=start + dt.timedelta(days=5)) == 0


def test_daily_phrase_rows(spark, tmp_path_factory):
    """Phrase search over positional daily indexes: day-pruned, merged
    window stats, rank-identical to the oracle over the window docs."""
    root = str(tmp_path_factory.mktemp("daily_pos"))
    docs = _spread_days(corpus_spark_df(spark, 400, seed=43, n_parts=2))
    build_daily_index(spark, docs, root, url_col=None, n_buckets=4, positions=True)
    rows = docs.select("doc_id", "text", "warc_ts").collect()
    s = DailySearcher(spark, root)
    lo, hi = _window(1, 2)
    sub = [(r.doc_id, r.text) for r in rows if lo <= r.warc_ts.replace(tzinfo=None) < hi]
    hits = 0
    for phrase in ("term00000 term00001", "term00001 term00002"):
        want_win = BM25Oracle(sub).phrase_search(phrase, 10)
        got_win = s.phrase_rows(phrase, 10, time_range=(lo, hi))
        assert got_win == want_win
        want_all = BM25Oracle([(r.doc_id, r.text) for r in rows]).phrase_search(phrase, 10)
        assert s.phrase_rows(phrase, 10) == want_all
        hits += len(want_win)
    assert hits > 0


def test_daily_facet_counts_windowed(spark, tmp_path_factory):
    """Windowed terms-aggregation over a daily root: per-day distributed
    facets re-aggregated exactly (counts are additive across the disjoint
    day corpora)."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index

    root = str(tmp_path_factory.mktemp("dfacet"))
    rows = [
        (
            i,
            "spark join" if i % 2 == 0 else "window plan",
            ["web", "api", "batch"][i % 3],
            dt.datetime(2016, 9, 16 + (i % 3), 12),
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        store_cols=("source",),
    )
    ds = DailySearcher(spark, root)
    got = dict(ds.facet_counts("source", "spark join"))
    want: dict[str, int] = {}
    for i, txt, src, _ in rows:
        if "spark" in txt:
            want[src] = want.get(src, 0) + 1
    assert got == want
    # windowed: days 0 and 1 only (i % 3 in {0, 1})
    got_w = dict(ds.facet_counts(
        "source", "spark join",
        time_range=(dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 18)),
    ))
    want_w: dict[str, int] = {}
    for i, txt, src, _ in rows:
        if "spark" in txt and i % 3 in (0, 1):
            want_w[src] = want_w.get(src, 0) + 1
    assert got_w == want_w


def test_windowed_one_plan_job_count_and_bool_ids(spark, tmp_path_factory):
    """The windowed facet/bool path is ONE unioned plan: the number of
    Spark jobs must be independent of the number of selected days (a
    90-day Kibana window costs one scan, not 90 sequential job waves),
    and the windowed bool_doc_ids matches a brute-force python oracle."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index

    root = str(tmp_path_factory.mktemp("djobs"))
    rows = [
        (
            i,
            "spark join" if i % 2 == 0 else "window plan",
            ["web", "api", "batch"][i % 3],
            dt.datetime(2016, 9, 16 + (i % 4), 12),
        )
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        store_cols=("source",),
    )
    ds = DailySearcher(spark, root)

    sc = spark.sparkContext

    def jobs_for(fn, group):
        sc.setJobGroup(group, group)
        try:
            out = fn()
        finally:
            sc.setJobGroup(None, None)
        return out, len(sc.statusTracker().getJobIdsForGroup(group))

    def window(n_days):
        return (dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 16 + n_days))

    got2, j2 = jobs_for(
        lambda: dict(ds.facet_counts("source", "spark join", time_range=window(2))),
        "facets-2d",
    )
    got4, j4 = jobs_for(
        lambda: dict(ds.facet_counts("source", "spark join", time_range=window(4))),
        "facets-4d",
    )
    assert j4 == j2, f"job count grew with window width: {j2} (2d) vs {j4} (4d)"

    def brute(n_days):
        want: dict[str, int] = {}
        for i, txt, src, ts in rows:
            if "spark" in txt and ts < dt.datetime(2016, 9, 16 + n_days):
                want[src] = want.get(src, 0) + 1
        return want

    assert got2 == brute(2)
    assert got4 == brute(4)

    # windowed bool_doc_ids: must/must_not algebra across the window
    ids = {
        r.doc_id
        for r in ds.bool_doc_ids(
            "spark", must_not="plan", time_range=window(3)
        ).collect()
    }
    want_ids = {
        i
        for i, txt, _, ts in rows
        if "spark" in txt and "plan" not in txt and ts < dt.datetime(2016, 9, 19)
    }
    assert ids == want_ids


def test_windowed_aggs_and_sorted_export(spark, tmp_path_factory):
    """Windowed ES aggregations (the Kibana date_histogram/terms shape
    over 'the last N days') and windowed sort+search_after export — one
    unioned plan each, verified against brute-force python."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index

    root = str(tmp_path_factory.mktemp("daggs"))
    rows = [
        (
            i,
            "spark join" if i % 2 == 0 else "window plan",
            ["web", "api", "batch"][i % 3],
            100 + (i * 7) % 300,
            dt.datetime(2016, 9, 16 + (i % 4), 12),
        )
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, nc long, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        store_cols=("source", "nc", "warc_ts"),
    )
    ds = DailySearcher(spark, root)
    win = (dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 19))  # days 0-2
    match = [r for r in rows if "spark" in r[1] and r[0] % 4 in (0, 1, 2)]

    aggs = ds.search_aggs(
        {
            "by_day": {"date_histogram": {"field": "warc_ts", "interval": "day"}},
            "srcs": {"terms": {"field": "source"}},
            "len": {"stats": {"field": "nc"}},
        },
        "spark join", time_range=win,
    )
    by_day = {r.key: r.n for r in aggs["by_day"].collect()}
    want_day: dict = {}
    for _i, _t, _s, _n, ts in match:
        d0 = ts.replace(hour=0)
        want_day[d0] = want_day.get(d0, 0) + 1
    assert by_day == want_day
    srcs = {r.key: r.n for r in aggs["srcs"].collect()}
    want_src: dict = {}
    for _i, _t, s2, _n, _ts in match:
        want_src[s2] = want_src.get(s2, 0) + 1
    assert srcs == want_src
    st = aggs["len"].collect()[0]
    ncs = [n for _, _, _, n, _ in match]
    assert (st["count"], st["min"], st["max"], st["sum"]) == (
        len(ncs), min(ncs), max(ncs), sum(ncs)
    )

    # sorted export with a cursor: two pages stitch seamlessly
    p1 = ds.search_sorted("spark join", [("nc", "desc")], 5, time_range=win).collect()
    after = (p1[-1]["nc"], p1[-1]["doc_id"])
    p2 = ds.search_sorted(
        "spark join", [("nc", "desc")], 5, time_range=win, search_after=after
    ).collect()
    got = [(r.nc, r.doc_id) for r in p1 + p2]
    want = sorted(((n, i) for i, _t, _s, n, _ts in match), key=lambda t: (-t[0], t[1]))[:10]
    assert got == want


def test_retention_and_closed_day_compaction(spark, tmp_path_factory):
    """Ops loop over a daily root: compact_closed_days folds every closed
    day's delta runs exactly once (idempotent nightly call); drop_days
    deletes aged partitions; queries stay exact throughout."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import (
        DailySearcher,
        compact_closed_days,
        daily_index_batch,
        drop_days,
        list_days,
    )

    root = str(tmp_path_factory.mktemp("dops"))
    rows = [
        (i, "spark join window", dt.datetime(2016, 9, 16 + (i % 3), 12))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, warc_ts timestamp")
    # two delta batches per day (so closed days have runs to fold)
    daily_index_batch(spark, docs.where("doc_id < 30"), root, 0, url_col=None,
                      n_buckets=2, n_term_buckets=4)
    daily_index_batch(spark, docs.where("doc_id >= 30"), root, 1, url_col=None,
                      n_buckets=2, n_term_buckets=4)
    ds = DailySearcher(spark, root)
    base = ds.search_rows("spark join", 100)
    assert len(base) == 60

    # current day = 18th → 16th and 17th fold; the hot day keeps its deltas
    res = compact_closed_days(spark, root, current_day=dt.date(2016, 9, 18))
    assert sorted(res) == ["20160916", "20160917"]
    # idempotent: second call folds nothing
    assert compact_closed_days(spark, root, current_day=dt.date(2016, 9, 18)) == {}
    after = DailySearcher(spark, root).search_rows("spark join", 100)
    assert [(d, round(v, 9)) for d, v in after] == [(d, round(v, 9)) for d, v in base]

    # retention: drop the oldest day
    dropped = drop_days(root, before=dt.date(2016, 9, 17))
    assert dropped == ["20160916"]
    assert list_days(root) == ["20160917", "20160918"]
    left = DailySearcher(spark, root).search_rows("spark join", 100)
    assert len(left) == sum(1 for i, _t, ts in rows if ts.day >= 17)


def test_window_metadata_one_probe(spark, droot, monkeypatch):
    """Driver metadata is NOT O(days) per query: the window dictionary
    probe opens ONE pyarrow dataset across all selected days (not one per
    day), and per-day stats.json / tombstone reads are served from the
    DailySearcher's mtime cache after the first query — a multi-year
    window costs one metadata round-trip, not hundreds, before the first
    job."""
    import pyarrow.dataset as pds

    import conveyorbelt_spark.index.daily as daily_mod

    root, _ = droot
    ds_all = DailySearcher(spark, root)
    warm = ds_all.search_rows("the and", 5)  # fills the per-day stats cache

    calls: list[str] = []
    orig = pds.dataset
    def counting(src, *a, **k):
        first = src[0] if isinstance(src, list) and src else str(src)
        calls.append(str(first))
        return orig(src, *a, **k)
    monkeypatch.setattr(pds, "dataset", counting)
    rows = ds_all.search_rows("the and", 5)
    assert rows == warm
    dict_probes = [c for c in calls if "/dictionary" in c]
    assert len(dict_probes) == 1  # ONE dataset across all N_DAYS days

    # stats.json reads are cached by mtime: a second query must not reload
    def boom(*a, **k):
        raise AssertionError("load_stats called on a warm DailySearcher")
    monkeypatch.setattr(daily_mod, "load_stats", boom)
    assert ds_all.search_rows("the and", 5) == warm


def test_windowed_significant_terms_background_is_window(spark, tmp_path_factory):
    """Windowed significant_terms: the JLH background is the WINDOW's
    corpus (the day dirs the time_range selected), not the whole root —
    ES's per-index background over daily indexes. Day 2 is pure-alpha
    noise; including it would shift bg_count 20 → 100."""
    import datetime as dt

    from conveyorbelt_spark.index.daily import DailySearcher, build_daily_index

    root = str(tmp_path_factory.mktemp("dsig"))
    rows = []
    for i in range(80):  # days 0-1 (the window): anomaly concentrates in alpha
        src = "alpha" if i % 4 == 0 else "beta"
        txt = "filler text" + (
            " anomaly" if (i % 8 == 0 or i in (1, 5)) else ""
        )
        rows.append((i, txt, src, dt.datetime(2016, 9, 16 + (i % 2), 12)))
    for i in range(80, 160):  # day 2, outside the window: all alpha, no anomaly
        rows.append((i, "filler text", "alpha", dt.datetime(2016, 9, 18, 12)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, src string, warc_ts timestamp"
    )
    build_daily_index(
        spark, docs, root, url_col=None, n_buckets=2, n_term_buckets=4,
        store_cols=("src",),
    )
    ds = DailySearcher(spark, root)
    win = (dt.datetime(2016, 9, 16), dt.datetime(2016, 9, 18))
    res = ds.search_aggs(
        {"sig": {"significant_terms": {"field": "src"}}},
        "anomaly", time_range=win,
    )["sig"].collect()
    assert [(r.key, r.doc_count, r.bg_count) for r in res] == [("alpha", 10, 20)]
    fgp, bgp = 10 / 12, 20 / 80
    assert res[0].score == pytest.approx((fgp - bgp) * (fgp / bgp))
    # unbounded window: day 2 joins the background, alpha is now the
    # MAJORITY class everywhere — fg share 10/12 still exceeds bg 100/160
    full = ds.search_aggs(
        {"sig": {"significant_terms": {"field": "src"}}}, "anomaly"
    )["sig"].collect()
    assert [(r.key, r.doc_count, r.bg_count) for r in full] == [("alpha", 10, 100)]
