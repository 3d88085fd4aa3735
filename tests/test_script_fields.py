"""script_fields, runtime_mappings, and the fields option: painless-subset
scripts with doc['f'].value refs over stored docstore columns, computed
per hit — values, param plumbing, missing-field omission, and rejection
of out-of-subset scripts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conveyorbelt_spark.corpus import corpus_spark_df
from conveyorbelt_spark.functions.tokenize import with_doc_id
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body

N_DOCS = 300


@pytest.fixture(scope="module")
def sfidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_idx"))
    docs = with_doc_id(corpus_spark_df(spark, N_DOCS, seed=23, n_parts=2))
    docs = docs.withColumn("views", F.pmod(F.col("doc_id"), F.lit(100)).cast("long"))
    # nullable column: every fourth doc misses it
    docs = docs.withColumn(
        "rating",
        F.when(F.pmod(F.col("doc_id"), F.lit(4)) == 0, F.lit(None))
        .otherwise(F.pmod(F.col("doc_id"), F.lit(5)).cast("long")),
    )
    build_index(
        spark, docs.select("doc_id", "text", "views", "rating"), out,
        url_col=None, n_buckets=4, store_cols=("views", "rating"),
    )
    vals = {
        r.doc_id: (int(r.views), None if r.rating is None else int(r.rating))
        for r in docs.select("doc_id", "views", "rating").collect()
    }
    return out, vals


def test_script_fields_values(spark, sfidx):
    """Arithmetic + params over stored columns, per hit."""
    out, vals = sfidx
    resp = search_body(spark, out, {
        "query": {"match": {"text": "term00000"}},
        "size": 8,
        "script_fields": {
            "boosted": {"script": {
                "source": "doc['views'].value * params.f + 1",
                "params": {"f": 3},
            }},
        },
    })
    assert resp["hits"]["hits"]
    for h in resp["hits"]["hits"]:
        v, _ = vals[h["_id"]]
        assert h["fields"]["boosted"] == [v * 3 + 1]


def test_runtime_fields_and_stored_fields(spark, sfidx):
    """fields returns stored columns as-is and computes runtime fields;
    docs with a null operand omit the field (never a crash)."""
    out, vals = sfidx
    resp = search_body(spark, out, {
        "query": {"match": {"text": "term00001"}},
        "size": 10,
        "runtime_mappings": {
            "stars_sq": {"type": "long", "script": {
                "source": "doc['rating'].value * doc['rating'].value",
            }},
        },
        "fields": ["views", "stars_sq", {"field": "rating"}, "no_such_col"],
    })
    assert resp["hits"]["hits"]
    for h in resp["hits"]["hits"]:
        v, r = vals[h["_id"]]
        assert h["fields"]["views"] == [v]
        assert "no_such_col" not in h["fields"]
        if r is None:
            assert "stars_sq" not in h["fields"]
            assert "rating" not in h["fields"]
        else:
            assert h["fields"]["rating"] == [r]
            assert h["fields"]["stars_sq"] == [r * r]


def test_internal_columns_stay_hidden(spark, sfidx):
    out, _ = sfidx
    resp = search_body(spark, out, {
        "query": {"match": {"text": "term00002"}},
        "size": 3, "fields": ["bucket", "run", "views"],
    })
    for h in resp["hits"]["hits"]:
        assert set(h["fields"]) == {"views"}


def test_script_rejections(spark, sfidx):
    out, _ = sfidx
    with pytest.raises(UnsupportedDSL, match="unsupported script"):
        search_body(spark, out, {
            "query": {"match": {"text": "term00000"}},
            "script_fields": {"bad": {"script": {
                "source": "__import__('os').system('x')"}}},
        })
    with pytest.raises(UnsupportedDSL, match="need a script"):
        search_body(spark, out, {
            "query": {"match": {"text": "term00000"}},
            "script_fields": {"bad": {"source": "1 + 1"}},
        })
