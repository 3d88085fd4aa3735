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

__version__ = "0.1.0"
