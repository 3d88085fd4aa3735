"""Benchmark harness — prints ONE JSON line.

Measures the BASELINE.json headline metrics:
- index-build throughput (docs/sec) over the synthetic web corpus
- BM25 top-k p50 latency over the reference query set
- per-query wall time for every queries() entry at $SPARK_GRAFT_SF_DIR

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_DOCS (override corpus size).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from conveyorbelt_spark.corpus import corpus_spark_df, reference_query_set
from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.queries import QUERIES
from conveyorbelt_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(max(2000, int(200_000 * sf)))))

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    t0_all = time.time()

    # --- index build throughput -------------------------------------------
    idx_dir = tempfile.mkdtemp(prefix="cb_bench_idx_")
    corpus_dir = tempfile.mkdtemp(prefix="cb_bench_corpus_")
    try:
        # materialize the corpus first — data synthesis is not index build
        t0 = time.time()
        corpus_spark_df(spark, n_docs, seed=42, n_parts=cpus * 2).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        corpus_sec = time.time() - t0
        docs = spark.read.parquet(corpus_dir)
        t0 = time.time()
        build_index(spark, docs, idx_dir, n_buckets=32)
        build_sec = time.time() - t0
        docs_per_sec = n_docs / build_sec

        # --- BM25 p50 latency over the reference query set ----------------
        from conveyorbelt_spark.index.query import Searcher

        searcher = Searcher(spark, idx_dir)
        lat = []
        for case in reference_query_set():
            t0 = time.time()
            searcher.search_rows(case["q"], case["k"])
            lat.append(time.time() - t0)
        lat.sort()
        p50 = lat[len(lat) // 2]
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(corpus_dir, ignore_errors=True)

    # --- operator queries at sf_dir ---------------------------------------
    per_query: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        per_query[name] = round(time.time() - t0, 3)
        # no cross-query state: a query's cached frames must not squat on
        # executor memory while later queries run (r2: q10's cache slowed
        # q11/q12 by ~6x)
        spark.catalog.clearCache()
    per_query["index_build"] = round(build_sec, 3)
    per_query["bm25_p50"] = round(p50, 4)

    total = time.time() - t0_all
    print(
        json.dumps(
            {
                "metric": "index_build_docs_per_sec",
                "value": round(docs_per_sec, 1),
                "unit": "docs/sec",
                "queries": per_query,
                "sf": sf,
                "bench": {
                    "n_docs_indexed": n_docs,
                    "index_build_sec": round(build_sec, 3),
                    "bm25_p50_sec": round(p50, 4),
                    "bm25_p95_sec": round(lat[int(len(lat) * 0.95)], 4),
                    "corpus_gen_sec": round(corpus_sec, 3),
                    "total_sec": round(total, 2),
                    "cpus": cpus,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
