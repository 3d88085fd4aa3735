"""Docstore versioning + ES _update_by_query.

An update (update_docs / _update_by_query) appends the new stored version
as a delta docstore run; every reader — the distributed _docstore_scan,
driver-side lookup_docs, the significant_terms background read — must
resolve each doc_id to its NEWEST run's row exactly once (latest-version-
wins, manifest committed_at order), while the single-run common case keeps
the plain no-window scan. _update_by_query compiles a painless-subset
script to JVM column expressions over the matching set and re-pushes the
mutated docs through the standard update path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import (
    build_index,
    lookup_docs,
    write_docstore,
)
from conveyorbelt_spark.index.delete import update_docs
from conveyorbelt_spark.index.dsl import (
    UnsupportedDSL,
    count_body,
    update_by_query_body,
)
from conveyorbelt_spark.index.query import Searcher, _docstore_scan
from conveyorbelt_spark.textutils import tokenize

N_DOCS = 120


def _corpus(spark, n=N_DOCS, seed=11):
    docs = corpus_spark_df(spark, n, seed=seed, n_parts=2)
    return with_doc_id(docs).withColumn(
        "views", (F.pmod(F.col("doc_id"), F.lit(7))).cast("long")
    )


def test_docstore_scan_resolves_latest_version(spark, tmp_path):
    out = str(tmp_path / "idx")
    docs = _corpus(spark)
    build_index(spark, docs, out, url_col=None, n_buckets=4)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text", "views"))

    # single-run fast path: no version-dedup window in the plan
    plan = _docstore_scan(spark, out)._jdf.queryExecution().toString()
    assert "Window" not in plan

    target = int(docs.agg(F.min("doc_id")).collect()[0][0])
    upd = spark.createDataFrame(
        [(target, "fresh replacement text", 999)],
        "doc_id long, text string, views long",
    )
    update_docs(
        spark, upd, out, "v1", url_col=None, n_buckets=4,
        store_docs=True, store_cols=("text", "views"),
    )

    store = _docstore_scan(spark, out)
    rows = store.where(F.col("doc_id") == target).collect()
    assert len(rows) == 1
    assert rows[0].text == "fresh replacement text"
    assert rows[0].views == 999
    # exactly one row per doc across the whole scan
    assert store.count() == store.select("doc_id").distinct().count() == N_DOCS

    # driver-side resolve agrees
    assert lookup_docs(out, [target])[target]["text"] == "fresh replacement text"

    # realtime termvectors re-analyze the NEW stored text
    tv = Searcher(spark, out).termvectors(target)
    assert "replacement" in tv["term_vectors"]["text"]["terms"]

    # and the posting layer serves the new version (old tombstoned)
    assert count_body(
        spark, out, {"query": {"match": {"text": "replacement"}}}
    ) == {"count": 1}


def test_update_by_query_body(spark, tmp_path):
    out = str(tmp_path / "idx2")
    docs = _corpus(spark, seed=23)
    build_index(spark, docs, out, url_col=None, n_buckets=4)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text", "views"))

    texts = {
        r.doc_id: (r.text, r.views)
        for r in docs.select("doc_id", "text", "views").collect()
    }
    matching = {d for d, (t, _) in texts.items() if "term00002" in tokenize(t)}
    assert matching and len(matching) < N_DOCS

    resp = update_by_query_body(
        spark, out,
        {
            "query": {"match": {"text": "term00002"}},
            "script": {
                "source": "ctx._source.views = ctx._source.views + params.inc",
                "params": {"inc": 5},
            },
        },
        op_id="u1",
    )
    assert resp == {"updated": len(matching)}
    got = {
        r.doc_id: r.views
        for r in _docstore_scan(spark, out).select("doc_id", "views").collect()
    }
    for d, (_, v) in texts.items():
        assert got[d] == v + 5 if d in matching else got[d] == v

    # replay with the same op_id converges to ONE application
    update_by_query_body(
        spark, out,
        {
            "query": {"match": {"text": "term00002"}},
            "script": {
                "source": "ctx._source.views = ctx._source.views + params.inc",
                "params": {"inc": 5},
            },
        },
        op_id="u1",
    )
    got2 = {
        r.doc_id: r.views
        for r in _docstore_scan(spark, out).select("doc_id", "views").collect()
    }
    assert got2 == got

    # text mutation reindexes: matching docs lose the old term
    update_by_query_body(
        spark, out,
        {
            "query": {"match": {"text": "term00002"}},
            "script": {"source": "ctx._source.text = params.t",
                       "params": {"t": "replaced corpus body"}},
        },
        op_id="u2",
    )
    assert count_body(
        spark, out, {"query": {"match": {"text": "term00002"}}}
    ) == {"count": 0}
    assert count_body(
        spark, out, {"query": {"match": {"text": "replaced"}}}
    ) == {"count": len(matching)}


def test_compact_docstore(spark, tmp_path):
    from conveyorbelt_spark.index.build import compact_docstore, docstore_runs
    from conveyorbelt_spark.index.delete import delete_docs
    from conveyorbelt_spark.index.query import _docstore_scan

    out = str(tmp_path / "idx4")
    docs = _corpus(spark, n=60, seed=31)
    build_index(spark, docs, out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text", "views"))

    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    upd = spark.createDataFrame(
        [(ids[0], "new text one", 111), (ids[1], "new text two", 222)],
        "doc_id long, text string, views long",
    )
    update_docs(
        spark, upd, out, "c1", url_col=None, n_buckets=2,
        store_docs=True, store_cols=("text", "views"),
    )
    assert len(docstore_runs(out)) == 2

    removed = compact_docstore(spark, out)
    assert removed > 0
    assert len(docstore_runs(out)) == 1
    store = _docstore_scan(spark, out)
    assert "Window" not in store._jdf.queryExecution().toString()
    got = {r.doc_id: (r.text, r.views) for r in store.collect()}
    assert len(got) == 60
    assert got[ids[0]] == ("new text one", 111)
    assert got[ids[1]] == ("new text two", 222)

    # idempotent no-op on a single-run store
    assert compact_docstore(spark, out) == 0

    # a post-fold update outranks the fold
    upd2 = spark.createDataFrame(
        [(ids[0], "third version", 333)], "doc_id long, text string, views long"
    )
    update_docs(
        spark, upd2, out, "c2", url_col=None, n_buckets=2,
        store_docs=True, store_cols=("text", "views"),
    )
    row = _docstore_scan(spark, out).where(F.col("doc_id") == ids[0]).collect()
    assert len(row) == 1 and row[0].text == "third version"

    # purge_deleted drops fully deleted docs' rows
    delete_docs(spark, out, [ids[2]], op_id="pd1")
    assert _docstore_scan(spark, out).where(
        F.col("doc_id") == ids[2]
    ).count() == 1  # kept without purge
    compact_docstore(spark, out, purge_deleted=True)
    assert _docstore_scan(spark, out).where(
        F.col("doc_id") == ids[2]
    ).count() == 0
    assert _docstore_scan(spark, out).count() == 59


def test_update_by_query_guards(spark, tmp_path):
    out = str(tmp_path / "idx3")
    docs = _corpus(spark, n=40, seed=5)
    build_index(spark, docs, out, url_col=None, n_buckets=2)
    write_docstore(spark, docs, out, url_col=None, extra_cols=("text", "views"))

    with pytest.raises(UnsupportedDSL, match="phrase"):
        update_by_query_body(
            spark, out,
            {"query": {"match_phrase": {"text": "a b"}},
             "script": {"source": "ctx._source.views = 1"}},
            op_id="g1",
        )
    with pytest.raises(UnsupportedDSL, match="unknown stored field"):
        update_by_query_body(
            spark, out,
            {"query": {"match": {"text": "term00002"}},
             "script": {"source": "ctx._source.nope = 1"}},
            op_id="g2",
        )
    with pytest.raises(UnsupportedDSL, match="statements must"):
        update_by_query_body(
            spark, out,
            {"query": {"match": {"text": "term00002"}},
             "script": {"source": "ctx._source.views + 1"}},
            op_id="g3",
        )
    with pytest.raises(UnsupportedDSL, match="construct|reference"):
        update_by_query_body(
            spark, out,
            {"query": {"match": {"text": "term00002"}},
             "script": {"source": "ctx._source.views = open('x')"}},
            op_id="g4",
        )
    with pytest.raises(UnsupportedDSL, match="missing param"):
        update_by_query_body(
            spark, out,
            {"query": {"match": {"text": "term00002"}},
             "script": {"source": "ctx._source.views = params.absent"}},
            op_id="g5",
        )
