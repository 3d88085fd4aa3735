"""spark-submit entry point for BM25 queries against a built index.

    spark-submit --py-files /tmp/cb.zip scripts/search_submit.py \
        --index /path/to/index --query "spark shuffle join" -k 10
        [--must-not "deprecated"] [--queries-file conveyorbelt_spark/queries.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query")
    ap.add_argument("--queries-file")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--must-not")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("conveyorbelt-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.path.insert(0, ".")
    from conveyorbelt_spark.index.query import Searcher, bm25_topk

    if args.queries_file:
        with open(args.queries_file) as f:
            cases = json.load(f)
        searcher = Searcher(spark, args.index)
        for case in cases:
            t0 = time.time()
            rows = searcher.search(case["q"], case.get("k", args.k)).collect()
            print(json.dumps({
                "q": case["q"], "k": case.get("k", args.k),
                "sec": round(time.time() - t0, 4),
                "hits": [(r.doc_id, r.score) for r in rows],
            }))
    else:
        rows = bm25_topk(spark, args.index, args.query, args.k, must_not=args.must_not).collect()
        for r in rows:
            print(f"{r.doc_id}\t{r.score}")


if __name__ == "__main__":
    main()
