"""Round-2 hardening tests: O(delta) incremental writes, crash-window
idempotence (the window BETWEEN a segment write and its manifest commit —
previously untested, see ADVICE r1), stats exactness under re-ingestion,
and Searcher staleness invalidation."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F  # noqa: N812

import conveyorbelt_spark.index.build as B
import conveyorbelt_spark.streaming.incremental as I  # noqa: N812
from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.index.build import build_index, compact_segments, load_stats
from conveyorbelt_spark.index.query import Searcher, bm25_topk
from conveyorbelt_spark.streaming.incremental import index_batch


def _fingerprint(spark, out_dir):
    seg = spark.read.parquet(f"{out_dir}/segments")
    rows = seg.select(
        "term", "bucket", "blk", "n", "min_doc", "max_doc",
        F.crc32("docs").alias("cd"), F.crc32("tfs").alias("ct"), F.crc32("dls").alias("cl"),
    ).collect()
    return sorted(tuple(r) for r in rows)


class Boom(RuntimeError):
    pass


def test_build_resume_after_segment_write_crash(spark, tmp_path_factory):
    """Crash AFTER a commit group's segments land but BEFORE its manifest
    row commits: resume must not duplicate that group's blocks."""
    docs = corpus_spark_df(spark, 300, seed=11, n_parts=2)
    clean = str(tmp_path_factory.mktemp("clean"))
    build_index(spark, docs, clean, n_buckets=8, commit_groups=1)
    want = _fingerprint(spark, clean)
    want_stats = load_stats(clean)

    crash = str(tmp_path_factory.mktemp("crash"))
    orig = B._append_manifest
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 1:  # group 1 commits fully; group 2 crashes AFTER
            raise Boom()  # its segments were already written
        return orig(*a, **kw)

    B._append_manifest = flaky
    try:
        with pytest.raises(Boom):
            build_index(spark, docs, crash, n_buckets=8, commit_groups=4)
    finally:
        B._append_manifest = orig

    # the crash left orphan segment partitions with no manifest row
    committed = {r.run for r in spark.read.parquet(f"{crash}/manifest").collect()}
    orphans = [
        d for d, rv in B._run_dirs(f"{crash}/segments") if rv not in committed
    ]
    assert orphans, "test setup: crash must land inside the unsafe window"

    build_index(spark, docs, crash, n_buckets=8, commit_groups=4, resume=True)
    assert _fingerprint(spark, crash) == want
    got_stats = load_stats(crash)
    assert got_stats["n_docs"] == want_stats["n_docs"]
    assert got_stats["avgdl"] == want_stats["avgdl"]


def test_index_batch_replay_after_mid_crash(spark, tmp_path_factory):
    """foreachBatch epoch crashes after segments+doclens are written but
    before the manifest commit; the replayed epoch must overwrite its own
    partitions, ending identical to a single clean run."""
    docs = corpus_spark_df(spark, 200, seed=5, n_parts=2)
    clean = str(tmp_path_factory.mktemp("b_clean"))
    index_batch(spark, docs, clean, 0, n_buckets=8)
    want = _fingerprint(spark, clean)
    want_stats = load_stats(clean)

    crash = str(tmp_path_factory.mktemp("b_crash"))
    orig = I._append_manifest

    def flaky(*a, **kw):
        raise Boom()

    I._append_manifest = flaky
    try:
        with pytest.raises(Boom):
            index_batch(spark, docs, crash, 0, n_buckets=8)
    finally:
        I._append_manifest = orig
    # segments + doclens landed, no manifest → replay must redo, not double
    assert os.path.isdir(f"{crash}/segments")
    assert not os.path.isdir(f"{crash}/manifest")

    assert index_batch(spark, docs, crash, 0, n_buckets=8) is True
    assert _fingerprint(spark, crash) == want
    got = load_stats(crash)
    assert got["n_docs"] == want_stats["n_docs"]
    assert got["avgdl"] == want_stats["avgdl"]
    # and a second replay is the committed no-op
    assert index_batch(spark, docs, crash, 0, n_buckets=8) is False


def test_batch_writes_touch_only_own_run(spark, tmp_path_factory):
    """O(delta) at the artifact level: committing batch 1 must not rewrite
    any file of batch 0 (segments, dictionary deltas, doclens)."""
    out = str(tmp_path_factory.mktemp("delta_iso"))
    a = corpus_spark_df(spark, 200, seed=1, n_parts=1)
    b = corpus_spark_df(spark, 200, seed=2, n_parts=1, part_offset=1)
    index_batch(spark, a, out, 0, n_buckets=8)

    def snapshot():
        files = {}
        for sub in ("segments", "dictionary", "doclens"):
            for f in glob.glob(f"{out}/{sub}/**/run=batch_0/*.parquet", recursive=True):
                files[f] = os.path.getmtime(f)
        return files

    before = snapshot()
    assert before, "batch 0 artifacts must exist under run=batch_0"
    index_batch(spark, b, out, 1, n_buckets=8)
    assert snapshot() == before  # nothing of batch 0 was rewritten
    # batch 1 landed under its own run partitions
    assert glob.glob(f"{out}/segments/*/run=batch_1/*.parquet")
    assert glob.glob(f"{out}/dictionary/*/run=batch_1/*.parquet")


def test_exact_stats_on_reingestion(spark, tmp_path_factory):
    """Default mode drifts on cross-batch re-ingestion (documented) and
    compaction heals it; exact_stats=True never drifts."""
    docs = corpus_spark_df(spark, 150, seed=7, n_parts=1)
    out = str(tmp_path_factory.mktemp("exact"))
    index_batch(spark, docs, out, 0, n_buckets=8)
    n0 = load_stats(out)["n_docs"]
    index_batch(spark, docs, out, 1, n_buckets=8)  # full re-ingestion
    assert load_stats(out)["n_docs"] == 2 * n0  # documented drift
    compact_segments(spark, out)
    assert load_stats(out)["n_docs"] == n0  # healed exactly

    out2 = str(tmp_path_factory.mktemp("exact2"))
    index_batch(spark, docs, out2, 0, n_buckets=8)
    index_batch(spark, docs, out2, 1, n_buckets=8, exact_stats=True)
    s2 = load_stats(out2)
    assert s2["n_docs"] == n0
    assert s2["avgdl"] == load_stats(out)["avgdl"]


def test_searcher_sees_index_updates(spark, tmp_path_factory):
    """A long-lived Searcher re-reads stats/dictionary after index growth —
    identical results to a fresh bm25_topk (ADVICE r1 staleness)."""
    out = str(tmp_path_factory.mktemp("stale"))
    a = corpus_spark_df(spark, 200, seed=1, n_parts=1)
    b = corpus_spark_df(spark, 200, seed=2, n_parts=1, part_offset=1)
    index_batch(spark, a, out, 0, n_buckets=8)
    s = Searcher(spark, out)
    q = "term00000 term00123"
    s.search(q, 5).collect()  # warm the caches on the old index
    index_batch(spark, b, out, 1, n_buckets=8)
    got = [(r.doc_id, r.score) for r in s.search(q, 5).collect()]
    want = [(r.doc_id, r.score) for r in bm25_topk(spark, out, q, 5).collect()]
    assert got == want


def test_replay_after_compaction_is_noop(spark, tmp_path_factory):
    """Compaction rewrites the manifest but must keep old run_ids committed
    (tombstones) so a late foreachBatch replay stays a no-op."""
    out = str(tmp_path_factory.mktemp("tomb"))
    a = corpus_spark_df(spark, 150, seed=3, n_parts=1)
    b = corpus_spark_df(spark, 150, seed=4, n_parts=1, part_offset=1)
    index_batch(spark, a, out, 0, n_buckets=8)
    index_batch(spark, b, out, 1, n_buckets=8)
    compact_segments(spark, out)
    before = _fingerprint(spark, out)
    assert index_batch(spark, a, out, 0, n_buckets=8) is False
    assert index_batch(spark, b, out, 1, n_buckets=8) is False
    assert _fingerprint(spark, out) == before


def test_exact_stats_replay_counts_own_docs(spark, tmp_path_factory):
    """exact_stats replay after a mid-crash (the batch's OWN doclens
    run partition already on disk, manifest not yet committed): the
    anti-join source must exclude the current run, or the replay counts
    its own docs as 'already ingested' and commits n_docs=0 for a run
    whose segments hold real postings (ADVICE r2)."""
    from conveyorbelt_spark.index.build import _doclens_kernel, _dyn_overwrite

    docs_a = corpus_spark_df(spark, 150, seed=7, n_parts=1)
    docs_b = corpus_spark_df(spark, 150, seed=8, n_parts=1, part_offset=1)
    out = str(tmp_path_factory.mktemp("exact_replay"))
    index_batch(spark, docs_a, out, 0, n_buckets=8, exact_stats=True)
    n0 = load_stats(out)["n_docs"]

    # simulate batch 1 crashing after its doclens write: write exactly the
    # doclens artifact index_batch would produce, then replay the batch
    from conveyorbelt_spark.functions.tokenize import with_doc_id

    d = with_doc_id(docs_b).select("doc_id", F.col("text").alias("text"))
    dl = (
        d.mapInPandas(_doclens_kernel, schema="doc_id long, dl long")
        .groupBy("doc_id").agg(F.min("dl").alias("dl"))
        .withColumn("run", F.lit("batch_1"))
    )
    _dyn_overwrite(dl, f"{out}/doclens", ("run",))

    assert index_batch(spark, docs_b, out, 1, n_buckets=8, exact_stats=True)
    stats = load_stats(out)
    assert stats["n_docs"] == 2 * n0  # batch 1's docs counted exactly once
    man = spark.read.parquet(f"{out}/manifest").where(F.col("run_id") == "batch_1")
    assert man.agg(F.sum("n_docs")).collect()[0][0] == n0
