"""conveyorbelt_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the capabilities of aliostad/ConveyorBelt (a C# parse-and-index
conveyor over Azure diagnostics into Elasticsearch) as an idiomatic Spark
engine: DataFrame/SQL for relational work, vectorized Arrow/pandas kernels for
the index codecs and scoring, Structured Streaming for the streaming path.

Layout:
- ``textutils``   pinned text extraction + tokenizer (the per-row invariant)
- ``corpus``      deterministic synthetic Common-Crawl-style corpus
- ``functions``   codecs (varint/delta-gap), text stats, tokenize kernels
- ``index``       inverted-index build / query / manifest / pure-python oracle
- ``sources``     parsers (IIS W3C, Sitecore, JSON, metrics), shard planner,
                  SimpleFilter, multimodal binary-column plumbing
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
        "SourceSpec": ("conveyorbelt_spark.conveyor", "SourceSpec"),
        "SourceRegistry": ("conveyorbelt_spark.conveyor", "SourceRegistry"),
        "run_sources": ("conveyorbelt_spark.conveyor", "run_sources"),
    }
    if name in surface:
        import importlib

        mod, attr = surface[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'conveyorbelt_spark' has no attribute {name!r}")
