"""Tiered (partial) compaction: fold only selected delta runs, O(selected)
cost, exact results and stats across both crash windows, replay
idempotence preserved via tombstones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: N812

import conveyorbelt_spark.index.build as B
from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import compact_runs, load_stats, pick_tier
from conveyorbelt_spark.index.oracle import BM25Oracle
from conveyorbelt_spark.index.query import Searcher, expand_prefix
from conveyorbelt_spark.streaming.incremental import index_batch

QUERY = "term00000 term00123"


def _runs(spark, out):
    return {
        r.run for r in spark.read.parquet(f"{out}/segments").select("run").distinct().collect()
    }


def _mk_index(spark, tmp_path_factory, name, n_batches=4):
    out = str(tmp_path_factory.mktemp(name))
    batches = [
        corpus_spark_df(spark, 120, seed=50 + i, n_parts=1, part_offset=i)
        for i in range(n_batches)
    ]
    for i, b in enumerate(batches):
        index_batch(spark, b, out, i, n_buckets=8)
    docs = batches[0]
    for b in batches[1:]:
        docs = docs.unionByName(b)
    rows = with_doc_id(docs).select("doc_id", "text").collect()
    return out, BM25Oracle([(r.doc_id, r.text) for r in rows])


def test_compact_runs_folds_only_selected(spark, tmp_path_factory):
    out, oracle = _mk_index(spark, tmp_path_factory, "tier")
    n0 = load_stats(out)["n_docs"]
    want = oracle.search(QUERY, 10)
    res = compact_runs(spark, out, ["batch_0", "batch_1"])
    assert res["folded_runs"] == 2 and res["blocks_after"] <= res["blocks_before"]
    runs = _runs(spark, out)
    assert res["new_run"] in runs and {"batch_2", "batch_3"} <= runs
    assert "batch_0" not in runs and "batch_1" not in runs
    # ledger totals carried exactly; queries bit-identical
    st = load_stats(out)
    assert st["n_docs"] == n0
    assert Searcher(spark, out).search_rows(QUERY, 10) == want
    # term expansion copy followed the fold
    assert expand_prefix(out, "term0000")
    # replays of the folded batches stay no-ops (tombstoned run_ids)
    a = corpus_spark_df(spark, 120, seed=50, n_parts=1, part_offset=0)
    assert index_batch(spark, a, out, 0, n_buckets=8) is False


def test_compact_runs_is_idempotent_and_validates(spark, tmp_path_factory):
    out, oracle = _mk_index(spark, tmp_path_factory, "tier_idem", n_batches=3)
    want = oracle.search(QUERY, 10)
    compact_runs(spark, out, ["batch_0", "batch_1"])
    # repeat of the SAME fold after commit: pure cleanup, nothing re-folded
    res2 = compact_runs(spark, out, ["batch_0", "batch_1"])
    assert res2["folded_runs"] == 0
    assert Searcher(spark, out).search_rows(QUERY, 10) == want
    # partial overlap with uncommitted runs is refused
    with pytest.raises(ValueError):
        compact_runs(spark, out, ["batch_2", "nonexistent"])


def test_crash_before_manifest_swap_then_retry(spark, tmp_path_factory, monkeypatch):
    """Phase-1 crash: new-run artifacts written, manifest untouched.
    Queries must stay rank-correct (duplicate identical postings dedup in
    the kernel) and a retry must complete the fold."""
    out, oracle = _mk_index(spark, tmp_path_factory, "tier_crash", n_batches=3)
    want = oracle.search(QUERY, 10)
    n0 = load_stats(out)["n_docs"]

    class Boom(RuntimeError):
        pass

    real = B._manifest_for_run

    def boom(*a, **kw):
        raise Boom()

    monkeypatch.setattr(B, "_manifest_for_run", boom)
    with pytest.raises(Boom):
        compact_runs(spark, out, ["batch_0", "batch_1"])
    monkeypatch.setattr(B, "_manifest_for_run", real)

    # crash window: duplicate (identical) postings present, stats unchanged
    assert load_stats(out)["n_docs"] == n0
    assert Searcher(spark, out).search_rows(QUERY, 10) == want

    res = compact_runs(spark, out, ["batch_0", "batch_1"])  # retry completes
    assert res["folded_runs"] == 2
    assert load_stats(out)["n_docs"] == n0
    assert Searcher(spark, out).search_rows(QUERY, 10) == want
    assert "batch_0" not in _runs(spark, out)


def test_pick_tier_policy(spark, tmp_path_factory):
    out, _ = _mk_index(spark, tmp_path_factory, "tier_pick", n_batches=4)
    assert pick_tier(spark, out, max_runs=8) == []  # under budget: no fold
    sel = pick_tier(spark, out, max_runs=2)
    assert len(sel) == 3 and all(s.startswith("batch_") for s in sel)
    compact_runs(spark, out, sel)
    man_runs = {
        r.run
        for r in spark.read.parquet(f"{out}/manifest")
        .where(F.col("bucket") >= 0).select("run").distinct().collect()
    }
    assert len(man_runs) == 2  # one tier run + one remaining batch
