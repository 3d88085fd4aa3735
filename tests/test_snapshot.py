"""Index snapshot/restore: marker-last commit, crashed-copy invisibility,
restore verification, and snapshot independence from later writes."""

from __future__ import annotations

import os

import pytest

from conveyorbelt_spark.index.build import build_index, write_docstore
from conveyorbelt_spark.index.query import Searcher
from conveyorbelt_spark.index.snapshot import (
    SNAPSHOT_MARKER,
    list_snapshots,
    restore_index,
    snapshot_index,
)


def test_snapshot_restore_cycle(spark, tmp_path):
    out = str(tmp_path / "idx")
    rows = [(i, "spark join window" if i % 2 else "merge shuffle plan")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None)
    before = Searcher(spark, out).search_rows("spark join", 10)

    repo = str(tmp_path / "repo")
    r = snapshot_index(out, repo, "snap1")
    assert r["state"] == "SUCCESS" and r["n_files"] > 0
    assert [s["snapshot"] for s in list_snapshots(repo)] == ["snap1"]
    with pytest.raises(ValueError, match="already exists"):
        snapshot_index(out, repo, "snap1")

    # a later delete on the LIVE index never touches the snapshot
    from conveyorbelt_spark.index.dsl import delete_by_query_body

    deleted = delete_by_query_body(
        spark, out, {"query": {"match": {"text": "spark"}}}, op_id="snap-del"
    )
    assert deleted["deleted"] > 0
    assert Searcher(spark, out).search_rows("spark join", 10) == []

    dest = str(tmp_path / "restored")
    rr = restore_index(repo, "snap1", dest)
    assert rr["state"] == "SUCCESS"
    after = Searcher(spark, dest).search_rows("spark join", 10)
    assert after == before

    with pytest.raises(ValueError, match="already exists"):
        restore_index(repo, "snap1", dest)

    # a crashed (marker-less) copy is invisible and restorable-over
    crashed = os.path.join(repo, "snap2")
    os.makedirs(crashed)
    assert [s["snapshot"] for s in list_snapshots(repo)] == ["snap1"]
    with pytest.raises(ValueError, match="not committed"):
        restore_index(repo, "snap2", str(tmp_path / "nope"))
    assert not os.path.exists(os.path.join(crashed, SNAPSHOT_MARKER))
