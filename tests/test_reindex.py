"""ES write-API surface: _delete_by_query with a request BODY (parse →
distributed matching set → tombstones, ES doc-count response) and
_reindex (docstore → brand-new index under new settings, live docs
only, stored columns carried over)."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index, reindex, write_docstore
from conveyorbelt_spark.index.dsl import (
    UnsupportedDSL,
    count_body,
    delete_by_query_body,
    search_body,
)
from conveyorbelt_spark.index.query import Searcher
from conveyorbelt_spark.textutils import tokenize

N_DOCS = 300


def test_delete_by_query_body_then_reindex(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    docs = corpus_spark_df(spark, N_DOCS, seed=55, n_parts=2)
    build_index(spark, docs, src, n_buckets=4)
    write_docstore(spark, docs, src, extra_cols=("text",))
    texts = {
        r.doc_id: r.text
        for r in with_doc_id(docs).select("doc_id", "text").collect()
    }

    with pytest.raises(UnsupportedDSL, match="whole"):
        delete_by_query_body(spark, src, {}, op_id="nope")
    with pytest.raises(UnsupportedDSL, match="phrase"):
        delete_by_query_body(
            spark, src,
            {"query": {"match_phrase": {"text": "term00001 term00002"}}},
            op_id="nope2",
        )

    want_del = sum(1 for t in texts.values() if "term00001" in tokenize(t))
    assert want_del > 0
    resp = delete_by_query_body(
        spark, src, {"query": {"match": {"text": "term00001"}}}, op_id="d1"
    )
    assert resp == {"deleted": want_del}
    assert count_body(
        spark, src, {"query": {"match": {"text": "term00001"}}}
    ) == {"count": 0}
    # the deleted docs are gone from scored results too
    assert search_body(
        spark, src, {"query": {"match": {"text": "term00001"}}, "size": 5}
    )["hits"]["hits"] == []
    # retry with the same op_id converges (matching set now empty)
    assert delete_by_query_body(
        spark, src, {"query": {"match": {"text": "term00001"}}}, op_id="d1"
    ) == {"deleted": 0}

    live = {d for d, t in texts.items() if "term00001" not in tokenize(t)}
    n = reindex(spark, src, dest, n_buckets=2, positions=True)
    assert n == len(live)
    assert count_body(spark, dest, {"query": {"match_all": {}}}) == {
        "count": len(live)
    }
    assert search_body(
        spark, dest, {"query": {"match": {"text": "term00001"}}, "size": 5}
    )["hits"]["hits"] == []
    # new settings took: positions=True makes phrases servable on dest
    src_phrase_doc = next(
        d for d in sorted(live) if len(tokenize(texts[d])) >= 4
    )
    toks = tokenize(texts[src_phrase_doc])
    phrase = " ".join(toks[1:3])
    hits = search_body(
        spark, dest,
        {"query": {"match_phrase": {"text": phrase}}, "size": 100},
    )["hits"]["hits"]
    assert src_phrase_doc in {h["_id"] for h in hits}
    # stored columns carried over: termvectors serves from dest's docstore
    tv = Searcher(spark, dest).termvectors(src_phrase_doc)
    assert tv["found"]
    assert tv["term_vectors"]["text"]["terms"][toks[1]]["term_freq"] >= 1


def test_reindex_needs_stored_text(spark, tmp_path):
    src, dest = str(tmp_path / "s2"), str(tmp_path / "d2")
    docs = corpus_spark_df(spark, 50, seed=9, n_parts=1)
    build_index(spark, docs, src, n_buckets=2)
    write_docstore(spark, docs, src)  # url only, no text
    with pytest.raises(ValueError, match="stored text"):
        reindex(spark, src, dest)
