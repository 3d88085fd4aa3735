"""Time-sliced (daily) indexes — the reference's IndexNamer design realized.

The reference creates one Elasticsearch index per day
(``src/ConveyorBelt.Tooling/IndexNamer.cs:21-41`` names them
``prefix-yyyyMMdd``; ``Scheduling/MasterScheduler.cs:205-239`` creates the
upcoming day's index ahead of schedule) precisely so that a Kibana-style
"last 3 days" query touches 3 indexes and retention is a directory delete.

Layout here: ``root/day=YYYYMMDD/`` — each day a full, self-contained index
(segments / dictionary / manifest / docstore / stats.json) built by the
ordinary builder. That buys, with zero new index machinery:

- **query pruning**: a ``time_range=(lo, hi)`` search lists the day dirs
  overlapping the window and never opens any other day's files;
- **retention**: drop a day = ``rm -r root/day=D``;
- **bounded compaction**: only the hot (current) day accumulates delta
  runs; ``compact_segments`` runs per day on closed days once, ever;
- **ingest routing**: an incremental batch splits by event day and lands
  in its days' sub-indexes (normally 1–2 thanks to the grace window).

Scoring semantics: corpus statistics (n_docs, total_tokens → avgdl, and
per-term df) are MERGED across the selected days before scoring — exact
global stats over the queried window, the equivalent of Elasticsearch's
``dfs_query_then_fetch`` (plain ES daily indexes score with per-shard df;
merged stats are strictly more consistent and are what the DuckDB oracle
computes). Day partitions slice the corpus disjointly (a doc belongs to its
``warc_ts`` day), so merged stats equal the stats of the window sub-corpus.

Granularity is the reference's: a daily index holds its whole day, so a
``time_range`` is honored at day resolution (callers wanting sub-day
filtering add a range filter on a stored ts column — same as ES).

Scale: selecting d days of a y-day corpus reads d/y of the segment bytes
before any term pruning even starts; the per-day probes are driver-side
metadata reads (~1 parquet footer per term bucket per day). The scoring
kernel is unchanged — per-bucket groups simply concatenate blocks from
several days' runs, the multi-run shape it already handles.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from .build import build_index, load_stats, write_docstore
from .query import (
    _bool_plan,
    _committed,
    _lookup_terms,
    _read_blocks_local,
    _score_kernel,
    _score_local,
    _tombs,
    _BLOCK_COLS,
)

DAY_FMT = "yyyyMMdd"  # IndexNamer.cs:27 rendering (prefix-yyyyMMdd)


def day_str(ts: dt.datetime | dt.date) -> str:
    return f"{ts.year:04d}{ts.month:02d}{ts.day:02d}"


def day_dir(root: str, day: str) -> str:
    return os.path.join(root, f"day={day}")


def list_days(root: str) -> list[str]:
    return sorted(
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(os.path.join(root, "day=*"))
        if os.path.isdir(d)
    )


def select_days(root: str, time_range: tuple | None) -> list[str]:
    """Day partitions overlapping [lo, hi) — THE pruning step: everything
    after this only ever opens files under the returned day dirs. ``None``
    bounds are open-ended; day resolution (a day is selected if any instant
    of it falls in the window)."""
    days = list_days(root)
    if time_range is None:
        return days
    lo, hi = time_range
    lo_d = day_str(lo) if lo is not None else None
    hi_d = day_str(hi) if hi is not None else None
    out = []
    for d in days:
        if lo_d is not None and d < lo_d:
            continue
        if hi_d is not None:
            # a day is excluded only if it starts at/after hi (exclusive
            # upper bound lands exactly on a midnight → that day is out)
            if d > hi_d or (d == hi_d and (hi.hour, hi.minute, hi.second) == (0, 0, 0)):
                continue
        out.append(d)
    return out


def build_daily_index(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    *,
    ts_col: str = "warc_ts",
    url_col: str = "url",
    text_col: str = "text",
    parallelism: int = 4,
    **build_kw,
) -> dict[str, dict]:
    """Build one sub-index per distinct ``ts_col`` day (the MasterScheduler
    creates-an-index-per-day loop, batch form). Each day's docs are selected
    with a pushed-down day predicate, so day N's build scans day N's data.

    Day builds are independent (disjoint dirs, disjoint data), so up to
    ``parallelism`` of them run as concurrent driver threads — Spark
    schedules their jobs side by side, overlapping the per-build fixed
    job overhead (a many-day backfill is otherwise a serial chain of small
    builds). Returns {day: stats}."""
    from concurrent.futures import ThreadPoolExecutor

    d = docs.withColumn("_day", F.date_format(ts_col, DAY_FMT))
    day_counts = {r[0]: int(r[1]) for r in d.groupBy("_day").count().collect()}
    days = sorted(day_counts)
    if "n_term_buckets" not in build_kw and days:
        # daily sub-indexes must share layout knobs (_merged_stats raises on
        # a mismatch), so resolve ONE adaptive term-bucket count for the
        # whole backfill — sized to the largest day — instead of letting
        # each day's build adapt to its own doc count
        from .build import _adaptive_term_buckets

        build_kw = {
            **build_kw,
            "n_term_buckets": _adaptive_term_buckets(max(day_counts.values())),
        }

    def one(day: str) -> dict:
        sub = d.where(F.col("_day") == day).drop("_day")
        return build_index(
            spark, sub, day_dir(root, day),
            url_col=url_col, text_col=text_col, **build_kw,
        )

    if parallelism <= 1 or len(days) <= 1:
        return {day: one(day) for day in days}
    with ThreadPoolExecutor(max_workers=min(parallelism, len(days))) as ex:
        results = list(ex.map(one, days))
    return dict(zip(days, results))


def daily_index_batch(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    batch_id: int | str,
    *,
    ts_col: str = "warc_ts",
    **index_kw,
) -> dict[str, bool]:
    """Incremental form: split the batch by event day and append each
    slice as a delta run of its day's sub-index (normally 1–2 days thanks
    to the schedule grace window). Idempotent per (day, batch) — the run id
    carries both."""
    from ..streaming.incremental import index_batch

    d = docs.withColumn("_day", F.date_format(ts_col, DAY_FMT))
    days = sorted(r[0] for r in d.select("_day").distinct().collect())
    if "n_term_buckets" not in index_kw:
        # a batch that opens a NEW day must match the existing days' layout
        # (adaptive builds may have chosen a non-default bucket count)
        for ex in list_days(root):
            sp = os.path.join(day_dir(root, ex), "stats.json")
            if os.path.exists(sp):
                index_kw = {
                    **index_kw,
                    "n_term_buckets": load_stats(day_dir(root, ex))["n_term_buckets"],
                }
                break
    out: dict[str, bool] = {}
    for day in days:
        sub = d.where(F.col("_day") == day).drop("_day")
        out[day] = index_batch(spark, sub, day_dir(root, day), batch_id, **index_kw)
    return out


def drop_days(root: str, *, before: dt.datetime | dt.date) -> list[str]:
    """Retention: delete every day partition strictly OLDER than ``before``
    (the reference deletes aged ES indexes by name; here it's a directory
    delete per day — no index rewrite, no tombstones). Returns the dropped
    day strings."""
    import shutil

    cut = day_str(before)
    dropped = []
    for d in list_days(root):
        if d < cut:
            shutil.rmtree(day_dir(root, d))
            dropped.append(d)
    return dropped


def compact_closed_days(
    spark: SparkSession, root: str, *, current_day: dt.datetime | dt.date | str,
) -> dict[str, dict]:
    """Fold every CLOSED day's delta runs into dense blocks (full
    ``compact_segments`` per day — each runs once, ever: only the hot
    current day keeps accumulating deltas). Days already compacted (a
    single ``compacted`` run) are skipped, so a nightly cron call is
    idempotent and O(yesterday), not O(history)."""
    from .build import compact_segments

    cur = current_day if isinstance(current_day, str) else day_str(current_day)
    out: dict[str, dict] = {}
    for d in list_days(root):
        if d >= cur:
            continue
        s = load_stats(day_dir(root, d))
        runs = s.get("committed_runs") or []
        if runs == ["compacted"]:
            continue  # already folded
        out[d] = compact_segments(spark, day_dir(root, d))
    return out


def _merged_stats(root: str, days: list[str], loader=None) -> dict:
    """Exact window-corpus stats: Σ n_docs / Σ total_tokens over the
    selected days' stats.json (driver-side, O(days) tiny file reads —
    ``loader`` lets the DailySearcher serve them from its mtime cache, so
    a long-lived handle pays the reads once, not per query). Layout knobs
    must agree across days (same builder config)."""
    loader = loader or (lambda d: load_stats(day_dir(root, d)))
    n_docs, total_tokens = 0, 0
    base: dict | None = None
    for day in days:
        s = loader(day)
        n_docs += s["n_docs"]
        total_tokens += s["total_tokens"]
        if base is None:
            base = s
        else:
            for k in ("k1", "b", "n_buckets", "n_term_buckets", "positions", "analyzer"):
                if s.get(k) != base.get(k):
                    raise ValueError(
                        f"day {day} config {k}={s.get(k)!r} differs from "
                        f"{base.get(k)!r}; daily sub-indexes must share a config"
                    )
    assert base is not None
    merged = {
        **base,
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": total_tokens / n_docs if n_docs else 0.0,
    }
    # per-day read snapshots don't merge — reads consult each day's own
    merged.pop("committed_runs", None)
    return merged


def _merged_lookup(spark, root: str, days: list[str], n_term_buckets: int, loader=None):
    """Dictionary probe across the selected days: Σ df / Σ cf per term —
    ONE pyarrow dataset read over every selected day's committed,
    tb-pruned dictionary files (``query._lookup_terms_multi``), not a
    per-day loop: a multi-year window costs one probe, not hundreds of
    sequential round-trips before the first job. Non-posix paths fall
    back to the per-day Spark-pruned probe."""
    from .query import _lookup_terms_multi

    loader = loader or (lambda d: load_stats(day_dir(root, d)))
    dirs = [(day_dir(root, d), _committed(loader(d))) for d in days]

    def lookup(terms: list[str]) -> list[dict]:
        out = _lookup_terms_multi(dirs, terms, n_term_buckets)
        if out is not None:
            return out
        merged: dict[str, dict] = {}
        for d_dir, committed in dirs:
            for e in _lookup_terms(
                spark, d_dir, terms, n_term_buckets, committed=committed
            ):
                m = merged.setdefault(
                    e["term"],
                    {"term": e["term"], "df": 0, "cf": 0, "n_blocks": 0, "tb": e["tb"]},
                )
                m["df"] += e["df"]
                m["cf"] += e["cf"]
                m["n_blocks"] += e["n_blocks"]
        return list(merged.values())

    return lookup


class DailySearcher:
    """Query handle over a daily-index root: every search takes a
    ``time_range=(lo, hi)`` (datetimes; either side None = open) and prunes
    to the overlapping day sub-indexes BEFORE any file is opened. Scores
    use merged window stats, so results are rank-identical to a single
    index built over exactly the window's documents (asserted in tests and
    by the q32 DuckDB oracle)."""

    def __init__(self, spark: SparkSession, root: str, mode: str = "auto"):
        self.spark = spark
        self.root = root
        self.mode = mode
        # per-day metadata caches keyed by the day's stats.json mtime (the
        # index version stamp): a long-lived serving handle reads each
        # day's stats/tombstones ONCE, not once per query per day
        self._stats_cache: dict[str, tuple[float, dict]] = {}
        self._tomb_cache: dict[str, tuple[float, dict]] = {}

    def _day_stats(self, day: str) -> dict:
        p = os.path.join(day_dir(self.root, day), "stats.json")
        m = os.path.getmtime(p)
        hit = self._stats_cache.get(day)
        if hit is not None and hit[0] == m:
            return hit[1]
        s = load_stats(day_dir(self.root, day))
        self._stats_cache[day] = (m, s)
        self._tomb_cache.pop(day, None)  # tombs derive from the same stamp
        return s

    def _day_tombs(self, day: str) -> dict:
        s = self._day_stats(day)
        m = self._stats_cache[day][0]
        hit = self._tomb_cache.get(day)
        if hit is not None and hit[0] == m:
            return hit[1]
        t = _tombs(day_dir(self.root, day), s)
        self._tomb_cache[day] = (m, t)
        return t

    def _merged_stats(self, days: list[str]) -> dict:
        return _merged_stats(self.root, days, loader=self._day_stats)

    def _merged_lookup(self, days: list[str], n_term_buckets: int):
        return _merged_lookup(
            self.spark, self.root, days, n_term_buckets, loader=self._day_stats
        )

    def _plan(
        self, time_range, query, must, must_not, filters=None, ranges=None,
        or_groups=None, not_atoms=None,
    ):
        days = select_days(self.root, time_range)
        if not days:
            return None
        stats = self._merged_stats(days)
        lookup = self._merged_lookup(days, stats["n_term_buckets"])
        plan = _bool_plan(
            self.spark, self.root, stats, query, must, must_not, lookup=lookup,
            filters=filters, ranges=ranges,
            range_expand=self._range_expand(days),
            or_groups=or_groups, not_atoms=not_atoms,
        )
        if plan is None:
            return None
        return days, stats, plan

    def _range_expand(self, days: list[str]):
        """Window keyword-range expansion: ONE dataset probe over the
        selected days' sidecar-pruned term_index files
        (``query._term_range_multi``) — not a per-day loop."""
        from .query import _term_range_multi

        def range_expand(lo: str, hi: str) -> list[str]:
            return _term_range_multi(
                [day_dir(self.root, d) for d in days], lo, hi
            )

        return range_expand

    def search_rows(
        self, query: str, k: int = 10, *,
        time_range: tuple | None = None, prune: bool = True,
        must: str | None = None, must_not: str | None = None,
        min_should: int = 0,
        filters: dict | None = None, ranges: dict | None = None,
        or_groups: list | None = None, not_atoms: list | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Serving path: per-day pruned pyarrow block reads concatenated,
        one kernel pass (buckets merge across days — the multi-run shape).
        Zero Spark jobs. ``filters``/``ranges`` = ES filter context over
        keyword fields (see ``bm25_topk``); ``or_groups``/``not_atoms`` =
        the nested-bool atom forms (``query._atom_terms``); ``after`` =
        (score, doc_id) score-order search_after."""
        p = self._plan(
            time_range, query, must, must_not, filters, ranges,
            or_groups, not_atoms,
        )
        if p is None:
            return []
        days, stats, (term_idf, must_terms, not_terms, tbs, scan_terms, sp, fgroups) = p
        if min_should > len(sp):
            return []
        blocks = self._window_blocks(days, tbs, scan_terms)
        if blocks is None or not len(blocks):
            return []
        return _score_local(
            blocks, term_idf, k, stats, prune,
            must_terms=must_terms, not_terms=not_terms, filter_groups=fgroups,
            should_terms=sp, min_should=min_should, after=after,
        )

    def _window_blocks(self, days, tbs, scan_terms, columns=None):
        """Concatenated per-day pruned pyarrow block reads with each day's
        delete snapshot applied — the window serving-path scan (zero Spark
        jobs). None when some day is not locally readable."""
        frames = []
        for day in days:
            d_dir = day_dir(self.root, day)
            d_stats = self._day_stats(day)
            d_tomb = self._day_tombs(day)
            b = _read_blocks_local(
                d_dir, tbs, scan_terms, columns=columns,
                committed=_committed(d_stats), with_run=bool(d_tomb),
            )
            if b is None:
                raise FileNotFoundError(f"{d_dir}/segments is not locally readable")
            if d_tomb and len(b):
                from .delete import apply_tombstones

                b = apply_tombstones(b, d_tomb).drop(columns=["run"])
            if len(b):
                frames.append(b)
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    def search(
        self, query: str, k: int = 10, *,
        time_range: tuple | None = None, prune: bool = True,
        must: str | None = None, must_not: str | None = None,
        filters: dict | None = None, ranges: dict | None = None,
    ) -> DataFrame:
        """Distributed path: one Spark scan over ONLY the selected days'
        segment dirs (pruning by path construction + tb partitions + term
        row groups), same kernel, global top-k."""
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        p = self._plan(time_range, query, must, must_not, filters, ranges)
        if p is None:
            return empty
        days, stats, (term_idf, must_terms, not_terms, tbs, scan_terms, _sp, fgroups) = p
        # one pruned read per selected day, unioned (a multi-root read trips
        # partition discovery on the day= ancestor dirs); each read keeps
        # its own tb-partition + term row-group pruning
        from functools import reduce

        def one_day(d):
            from .query import _seg_scan

            d_stats = self._day_stats(d)
            # _seg_scan: committed-run snapshot + EXPLICIT schema (no
            # per-day 1-task parquet schema-inference job)
            seg = _seg_scan(self.spark, day_dir(self.root, d), d_stats).where(
                F.col("tb").isin(tbs) & F.col("term").isin(scan_terms)
            )
            base = seg.select(*_BLOCK_COLS)
            tomb_d = self._day_tombs(d)
            if tomb_d:
                # deletes apply PER DAY before the union: day sub-indexes
                # reuse run names (full-g0, batch_N), so one merged
                # tombstone map would cross-contaminate days; block surgery
                # is row-local — no grouping needed here
                from .delete import apply_tombstones

                withrun = seg.select(*_BLOCK_COLS, "run")

                def strip(it, _t=tomb_d):
                    for pdf in it:
                        out = apply_tombstones(pdf, _t)
                        yield out.drop(columns=["run"])

                base = withrun.mapInPandas(strip, schema=base.schema)
            return base

        seg = reduce(DataFrame.unionByName, [one_day(d) for d in days])
        kern = _score_kernel(
            term_idf, k, prune=prune, must_terms=must_terms, not_terms=not_terms,
            filter_groups=fgroups,
        )
        kern.k1, kern.b, kern.avgdl = stats["k1"], stats["b"], stats["avgdl"]
        local = seg.groupBy("bucket").applyInPandas(kern, schema="doc_id long, score double")
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def bool_doc_ids(
        self, query: str = "", *,
        must: str | None = None, must_not: str | None = None,
        min_should: int = 0,
        filters: dict | None = None, ranges: dict | None = None,
        or_groups: list | None = None, not_atoms: list | None = None,
        time_range: tuple | None = None,
    ) -> DataFrame:
        """Windowed ``bool_doc_ids``: ONE plan over the whole window. The
        selected days' pruned (term, doc_id) scans are unioned (narrow —
        no per-day shuffle), deduplicated once, and pushed through the
        single bool hash aggregation. Day corpora are doc-disjoint, so the
        union is exact; every driver step (dictionary probes, range
        expansion, must-presence) is a metadata read — the whole thing
        costs one Spark action regardless of the day count (vs one job
        wave per day in the per-day formulation: a 90-day Kibana window is
        one scan, not 90 sequential waves of fixed overhead)."""
        from functools import reduce

        from ..textutils import analyze
        from .query import (
            _bool_match_ids,
            _expand_atoms,
            _filter_want,
            term_doc_pairs,
        )

        empty = self.spark.createDataFrame([], "doc_id long")
        days = select_days(self.root, time_range)
        if not days:
            return empty
        stats = self._merged_stats(days)
        az = stats.get("analyzer")
        should_terms = sorted(set(analyze(query, az))) if query else []
        must_terms = sorted(set(analyze(must, az))) if must else []
        not_terms = sorted(set(analyze(must_not, az))) if must_not else []
        # keyword terms are day-independent strings: the window's expansion
        # is the union of each day's range-sidecar probe
        range_expand = self._range_expand(days)
        if not_atoms:
            not_terms = sorted(
                set(not_terms) | set(_expand_atoms(not_atoms, range_expand))
            )
        scoring = sorted(set(should_terms) | set(must_terms))
        fgroups: list[list[str]] = []
        if filters or ranges or or_groups:
            want = _filter_want(filters, ranges, range_expand, or_groups)
            if want is None:
                return empty
            fgroups = want
        if not scoring and not fgroups:
            return empty
        if must_terms:
            lookup = _merged_lookup(
                self.spark, self.root, days, stats["n_term_buckets"]
            )
            present = {e["term"] for e in lookup(must_terms)}
            if any(mt not in present for mt in must_terms):
                return empty  # provably empty across the whole window
        flat = sorted({t for g in fgroups for t in g})
        all_terms = sorted(set(scoring) | set(not_terms) | set(flat))
        pairs = reduce(
            DataFrame.unionByName,
            [
                term_doc_pairs(
                    self.spark, day_dir(self.root, d), all_terms, distinct=False
                )
                for d in days
            ],
        ).distinct()
        return _bool_match_ids(
            pairs, should_terms, must_terms, not_terms, min_should, fgroups
        )

    def facet_counts(
        self, facet_col: str, query: str = "", *,
        time_range: tuple | None = None,
        must: str | None = None, must_not: str | None = None,
        filters: dict | None = None, ranges: dict | None = None,
        k: int | None = None,
    ) -> list[tuple]:
        """Windowed ES terms-aggregation — the Kibana time-chart-breakdown
        shape ("top N <field> over the last 3 days") as ONE distributed
        plan: the window's matching ids (``bool_doc_ids`` above — unioned
        pruned scans, one dedup, one bool aggregation) join the unioned
        day docstores and hash-aggregate once. Counts over disjoint day
        corpora are additive, so one aggregation is exact at any
        matching-set size; job count is independent of the window width.
        Requires day indexes built with ``store_cols=(facet_col, ...)``."""
        days = select_days(self.root, time_range)
        if not days:
            return []
        hits = self.bool_doc_ids(
            query, must=must, must_not=must_not,
            filters=filters, ranges=ranges, time_range=time_range,
        )
        out = (
            self._window_docstore(days).join(hits, "doc_id")
            .groupBy(F.col(facet_col).alias("facet"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("facet"))
        )
        rows = (out.limit(k) if k else out).collect()
        return [(r.facet, int(r.n)) for r in rows]

    def _window_docstore(self, days: list[str]) -> DataFrame:
        """Union of the selected days' docstores: one lazy read per day
        dir (a multi-path read trips partition discovery on the day=
        ancestor dirs), narrow union — still one plan, one action. Schema
        comes from ONE driver-side pyarrow footer probe (day configs agree
        — enforced by _merged_stats) so no per-day schema-inference Spark
        job runs. Each day's scan resolves updated docs latest-version-
        wins (``_dedup_docstore_df`` — a no-op for single-run days)."""
        from functools import reduce

        import pyarrow.dataset as pds
        from pyspark.sql.pandas.types import from_arrow_schema

        from .query import _dedup_docstore_df

        store_schema = from_arrow_schema(
            pds.dataset(
                os.path.join(day_dir(self.root, days[0]), "docstore"),
                format="parquet", partitioning="hive",
            ).schema
        )
        return reduce(
            DataFrame.unionByName,
            [
                _dedup_docstore_df(
                    self.spark.read.schema(store_schema).parquet(
                        os.path.join(day_dir(self.root, d), "docstore")
                    ),
                    day_dir(self.root, d),
                )
                for d in days
            ],
        )

    def search_aggs(
        self, aggs: dict, query: str = "", *,
        time_range: tuple | None = None,
        must: str | None = None, must_not: str | None = None,
        min_should: int = 0,
        filters: dict | None = None, ranges: dict | None = None,
        or_groups: list | None = None, not_atoms: list | None = None,
    ) -> dict[str, DataFrame]:
        """Windowed ES search aggregations — THE Kibana workload
        (date_histogram / terms / stats / cardinality / percentiles over
        "the last N days"): the window's matching ids (one unioned plan,
        ``bool_doc_ids``) join the unioned day docstores once, then one
        hash aggregation per agg (``query.aggs_over_join``). Aggregations
        over disjoint day corpora compose exactly — same spec shape as the
        single-index ``search_aggs``."""
        from .query import aggs_over_join

        days = select_days(self.root, time_range)
        if not days:
            return {name: self.spark.createDataFrame([], "key string, n long")
                    for name in aggs}
        hits = self.bool_doc_ids(
            query, must=must, must_not=must_not, min_should=min_should,
            filters=filters, ranges=ranges, or_groups=or_groups,
            not_atoms=not_atoms, time_range=time_range,
        )
        store = self._window_docstore(days)
        # background for significant_terms = the WINDOW's corpus (the day
        # dirs the query selected), matching ES's per-index background
        return aggs_over_join(store.join(hits, "doc_id"), aggs, background=store)

    def search_sorted(
        self, query: str, sort: list[tuple[str, str]], k: int = 10, *,
        time_range: tuple | None = None,
        must: str | None = None, must_not: str | None = None,
        min_should: int = 0,
        filters: dict | None = None, ranges: dict | None = None,
        search_after: tuple | None = None,
        or_groups: list | None = None, not_atoms: list | None = None,
    ) -> DataFrame:
        """Windowed sort-by-field + search_after export (the ES
        PIT/search_after deep-pagination shape over a time window): the
        window's matching ids join the unioned day docstores, then the
        direction-aware order + lexicographic after-predicate
        (``query.sorted_over_join``) — page N+1 costs the same as page 1."""
        from .query import sorted_over_join

        days = select_days(self.root, time_range)
        if not days:
            return self.spark.createDataFrame([], "doc_id long")
        hits = self.bool_doc_ids(
            query, must=must, must_not=must_not, min_should=min_should,
            filters=filters, ranges=ranges, or_groups=or_groups,
            not_atoms=not_atoms, time_range=time_range,
        )
        return sorted_over_join(
            self._window_docstore(days).join(hits, "doc_id"), sort, k, search_after
        )

    def phrase_rows(
        self, phrase: str, k: int = 10, *, time_range: tuple | None = None,
        after: tuple[float, int] | None = None, slop: int = 0,
    ) -> list[tuple[int, float]]:
        """Day-pruned phrase search (positional daily indexes): merged
        window stats + the same per-bucket phrase kernel over the selected
        days' pruned block reads — zero Spark jobs. ``slop`` = ES
        proximity (see ``query._phrase_kernel``)."""
        from .query import _phrase_kernel, _phrase_plan

        days = select_days(self.root, time_range)
        if not days:
            return []
        stats = self._merged_stats(days)
        lookup = self._merged_lookup(days, stats["n_term_buckets"])
        plan = _phrase_plan(self.spark, self.root, stats, phrase, lookup=lookup)
        if plan is None:
            return []
        phrase_tokens, idf_sum, tbs, distinct = plan
        blocks = self._window_blocks(days, tbs, distinct, columns=_BLOCK_COLS + ["poss"])
        if blocks is None or not len(blocks):
            return []
        kern = _phrase_kernel(phrase_tokens, idf_sum, k, after=after, slop=slop)
        kern.k1, kern.b, kern.avgdl = stats["k1"], stats["b"], stats["avgdl"]
        outs = [kern(grp) for _, grp in blocks.groupby("bucket", sort=True)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return []
        allr = pd.concat(outs, ignore_index=True)
        allr = allr.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        return [(int(r.doc_id), float(r.score)) for r in allr.head(k).itertuples()]

    def multi_match_rows(
        self, query: str, fields: list[str], k: int = 10, *,
        type: str = "best_fields",  # noqa: A002 — the ES parameter name
        prune: bool = True, time_range: tuple | None = None,
    ) -> list[tuple[int, float]]:
        """Windowed ES multi_match: per-field BM25 with WINDOW-merged
        stats — per-term df from the merged dictionary probe, per-field
        avgdl = Σ over the selected days of the field's term-range cf sums
        / merged n_docs (each day probe is a sidecar-pruned metadata
        read). Scoring runs over the concatenated per-day pruned block
        reads — zero Spark jobs, dis_max (best_fields) or one-pass
        per-term norms (most_fields) exactly like the single-index path."""
        import pandas as _pd

        from .build import KEYWORD_SEP
        from .query import (
            _merge_best_fields,
            _multi_match_plan,
            _range_cf_sum_multi,
            _range_hi,
            _score_kernel,
        )

        days = select_days(self.root, time_range)
        if not days:
            return []
        stats = self._merged_stats(days)
        lookup = self._merged_lookup(days, stats["n_term_buckets"])

        def field_avg(fname: str) -> float:
            lo = fname + KEYWORD_SEP
            total = _range_cf_sum_multi(
                [day_dir(self.root, d) for d in days], lo, _range_hi(lo)
            )
            n = stats.get("n_docs") or 0
            return (total / n) if n else 0.0

        plan = _multi_match_plan(
            self.spark, self.root, stats, query, fields,
            lookup=lookup, field_avg=field_avg,
        )
        if plan is None:
            return []
        per_field, tbs, scan_terms = plan
        blocks = self._window_blocks(days, tbs, scan_terms)
        if blocks is None or not len(blocks):
            return []
        if type == "most_fields":
            term_idf = {t: v for _, _, ti, _ in per_field for t, v in ti.items()}
            abt = {t: av for _, _, ti, av in per_field for t in ti}
            kern = _score_kernel(term_idf, k, prune=prune)
            kern.k1, kern.b, kern.avgdl = stats["k1"], stats["b"], stats["avgdl"]
            kern.max_candidates = None
            kern.avgdl_by_term = abt
            outs = [kern(grp) for _, grp in blocks.groupby("bucket", sort=True)]
            outs = [o for o in outs if len(o)]
            if not outs:
                return []
            allr = _pd.concat(outs, ignore_index=True).sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="mergesort"
            )
            return [(int(r.doc_id), float(r.score)) for r in allr.head(k).itertuples()]
        if type != "best_fields":
            raise ValueError(f"unsupported multi_match type {type!r}")
        rows_per_field = []
        for _fname, _boost, term_idf, avgdl in per_field:
            f_blocks = blocks[blocks["term"].isin(set(term_idf))]
            st = dict(stats, avgdl=avgdl)
            rows_per_field.append(_score_local(f_blocks, term_idf, k, st, prune))
        return [(int(d), float(s)) for d, s in _merge_best_fields(rows_per_field, k)]

    def expand_terms(
        self, kind: str, value: str, *,
        fuzziness: int = 1, prefix_length: int = 1, max_expansions: int = 50,
        time_range: tuple | None = None,
    ) -> list[str]:
        """Windowed prefix/wildcard/regexp/fuzzy expansion: each selected
        day contributes its UNRANKED (term, df) candidates
        (``query.expansion_candidates`` — range-sidecar / k-deletes
        pruned), dfs SUM per term across the disjoint day corpora, and the
        ES df-desc ranking applies ONCE to the merged frame — exact global
        ranking (a union of per-day top-N would not be)."""
        import pandas as _pd

        from .query import _rank_expansions, expansion_candidates

        days = select_days(self.root, time_range)
        if not days:
            return []
        frames = [
            expansion_candidates(
                day_dir(self.root, d), kind, value,
                fuzziness=fuzziness, prefix_length=prefix_length,
            )
            for d in days
        ]
        frames = [f for f in frames if len(f)]
        if not frames:
            return []
        merged = (
            _pd.concat(frames, ignore_index=True)
            .groupby("term", as_index=False, sort=True)["df"].sum()
        )
        return _rank_expansions(merged, max_expansions, value.lower())

    def expansion_rows(
        self, kind: str, value: str, k: int = 10, *,
        fuzziness: int = 1, prefix_length: int = 1, max_expansions: int = 50,
        time_range: tuple | None = None,
    ) -> list[tuple[int, float]]:
        """Windowed expansion query: the merged expansion bag scored as a
        SHOULD bag over the window (window-merged stats)."""
        terms = self.expand_terms(
            kind, value, fuzziness=fuzziness, prefix_length=prefix_length,
            max_expansions=max_expansions, time_range=time_range,
        )
        if not terms:
            return []
        return self.search_rows(" ".join(terms), k, time_range=time_range)

    def more_like_this(
        self, like, k: int = 10, *,
        time_range: tuple | None = None,
        max_query_terms: int = 25, min_doc_freq: int = 2, min_term_freq: int = 1,
        exclude_self: bool = True,
    ) -> list[tuple[int, float]]:
        """Windowed more_like_this: term interestingness (tf·idf) against
        the WINDOW-merged dictionary (Σ df across the selected days),
        executed as a SHOULD bag over the window. ``like`` is raw text or
        a doc_id resolved from the selected days' docstores."""
        sel, self_id = self.mlt_terms(
            like, time_range=time_range, max_query_terms=max_query_terms,
            min_doc_freq=min_doc_freq, min_term_freq=min_term_freq,
        )
        if not sel:
            return []
        rows = self.search_rows(
            " ".join(sel), k + (1 if exclude_self else 0), time_range=time_range
        )
        if exclude_self and self_id is not None:
            rows = [(d, s) for d, s in rows if d != self_id]
        return rows[:k]

    def mlt_terms(
        self, like, *, time_range: tuple | None = None,
        max_query_terms: int = 25, min_doc_freq: int = 2, min_term_freq: int = 1,
    ) -> tuple[list[str], int | None]:
        """The windowed MLT term selection (window-merged interestingness)
        — factored out so exact totals can count the same bag."""
        from collections import Counter

        from ..textutils import analyze
        from .build import lookup_docs
        from .query import idf

        days = select_days(self.root, time_range)
        if not days:
            return [], None
        stats = self._merged_stats(days)
        self_id = None
        if isinstance(like, int):
            self_id = like
            text = None
            for d in days:
                row = lookup_docs(day_dir(self.root, d), [like]).get(like)
                if row is not None and row.get("text") is not None:
                    text = row["text"]
                    break
            if text is None:
                raise ValueError(
                    f"doc {like} has no stored text in the selected days — "
                    "build the day docstores with extra_cols=('text',)"
                )
        else:
            text = like
        tf = Counter(analyze(text, stats.get("analyzer")))
        if not tf:
            return [], self_id
        lookup = self._merged_lookup(days, stats["n_term_buckets"])
        entries = {e["term"]: e for e in lookup(sorted(tf))}
        scored_terms = []
        for t, f in tf.items():
            e = entries.get(t)
            if e is None or f < min_term_freq or int(e["df"]) < min_doc_freq:
                continue
            scored_terms.append((f * idf(stats["n_docs"], int(e["df"])), t))
        scored_terms.sort(key=lambda iv: (-iv[0], iv[1]))
        return [t for _, t in scored_terms[:max_query_terms]], self_id

    def search_docs(
        self, query: str, k: int = 10, *,
        time_range: tuple | None = None,
        must: str | None = None, must_not: str | None = None,
    ) -> list[dict]:
        """Day-pruned search with stored columns resolved from the selected
        days' docstores."""
        from .build import lookup_docs

        rows = self.search_rows(
            query, k, time_range=time_range, must=must, must_not=must_not
        )
        days = select_days(self.root, time_range)
        meta: dict[int, dict] = {}
        missing = [d for d, _ in rows]
        for day in days:
            if not missing:
                break
            found = lookup_docs(day_dir(self.root, day), missing)
            meta.update(found)
            missing = [d for d in missing if d not in meta]
        out = []
        for d, s in rows:
            row = dict(meta.get(d, {}))
            row.pop("bucket", None)
            row.pop("run", None)
            row.update({"doc_id": d, "score": s})
            out.append(row)
        return out
