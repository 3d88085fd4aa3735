"""conveyorbelt_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the capabilities of aliostad/ConveyorBelt (a C# parse-and-index
conveyor over Azure diagnostics into Elasticsearch) as an idiomatic Spark
engine: DataFrame/SQL for relational work, vectorized Arrow/pandas kernels for
the index codecs and scoring, Structured Streaming for the streaming path.

Layout:
- ``textutils``   pinned text extraction + tokenizer (the per-row invariant)
- ``corpus``      deterministic synthetic Common-Crawl-style corpus
- ``functions``   codecs (varint/delta-gap), text stats, tokenize kernels
- ``index``       inverted-index build / query / daily time-slicing /
                  deletes (tombstones) / manifest / pure-python oracle
- ``sources``     parsers (IIS W3C, Sitecore, JSON, metrics), shard planner,
                  SimpleFilter, Iceberg/parquet corpus adapter, multimodal
                  binary-column plumbing
- ``operators``   dedup (exact/minhash/simhash), ANN similarity, top-k
- ``streaming``   incremental index build via foreachBatch
"""

__version__ = "0.2.0"


def __getattr__(name: str):
    """Lazy top-level API (keeps ``import conveyorbelt_spark`` free of a
    pyspark import until something is actually used)."""
    surface = {
        "get_spark": ("conveyorbelt_spark.session", "get_spark"),
        "build_index": ("conveyorbelt_spark.index.build", "build_index"),
        "compact_segments": ("conveyorbelt_spark.index.build", "compact_segments"),
        "bm25_topk": ("conveyorbelt_spark.index.query", "bm25_topk"),
        "Searcher": ("conveyorbelt_spark.index.query", "Searcher"),
        "index_batch": ("conveyorbelt_spark.streaming.incremental", "index_batch"),
        "index_stream": ("conveyorbelt_spark.streaming.incremental", "index_stream"),
        "incremental_index_stream": (
            "conveyorbelt_spark.streaming.incremental", "incremental_index_stream",
        ),
        "compact_runs": ("conveyorbelt_spark.index.build", "compact_runs"),
        "delete_docs": ("conveyorbelt_spark.index.delete", "delete_docs"),
        "delete_by_query": ("conveyorbelt_spark.index.delete", "delete_by_query"),
        "update_docs": ("conveyorbelt_spark.index.delete", "update_docs"),
        "search_aggs": ("conveyorbelt_spark.index.query", "search_aggs"),
        "search_sorted": ("conveyorbelt_spark.index.query", "search_sorted"),
        "multi_match_topk": ("conveyorbelt_spark.index.query", "multi_match_topk"),
        "facet_counts_spark": ("conveyorbelt_spark.index.query", "facet_counts_spark"),
        "DailySearcher": ("conveyorbelt_spark.index.daily", "DailySearcher"),
        "build_daily_index": ("conveyorbelt_spark.index.daily", "build_daily_index"),
        "read_corpus": ("conveyorbelt_spark.sources.tables", "read_corpus"),
        "search_body": ("conveyorbelt_spark.index.dsl", "search_body"),
        "open_pit": ("conveyorbelt_spark.index.pit", "open_pit"),
        "close_pit": ("conveyorbelt_spark.index.pit", "close_pit"),
        "percolate": ("conveyorbelt_spark.operators.percolate", "percolate"),
        "percolate_doc": ("conveyorbelt_spark.operators.percolate", "percolate_doc"),
        "search_body_daily": ("conveyorbelt_spark.index.dsl", "search_body_daily"),
        "encode_jpeg": ("conveyorbelt_spark.sources.jpegcodec", "encode_jpeg"),
        "decode_jpeg": ("conveyorbelt_spark.sources.jpegcodec", "decode_jpeg"),
        "SourceSpec": ("conveyorbelt_spark.conveyor", "SourceSpec"),
        "SourceRegistry": ("conveyorbelt_spark.conveyor", "SourceRegistry"),
        "run_sources": ("conveyorbelt_spark.conveyor", "run_sources"),
    }
    if name in surface:
        import importlib

        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'conveyorbelt_spark' has no attribute {name!r}")
