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
    ap.add_argument("--must")
    ap.add_argument("--phrase", help="exact phrase query (needs --positions index)")
    ap.add_argument("--prefix", help="prefix query (dictionary expansion)")
    ap.add_argument("--resolve", action="store_true",
                    help="resolve hits through the doc-store (urls, not ids)")
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
    elif args.phrase:
        for d, sc in Searcher(spark, args.index).phrase_rows(args.phrase, args.k):
            print(f"{d}\t{sc}")
    elif args.prefix:
        for d, sc in Searcher(spark, args.index).prefix_rows(args.prefix, args.k):
            print(f"{d}\t{sc}")
    elif args.resolve:
        for hit in Searcher(spark, args.index).search_docs(
            args.query, args.k, must=args.must, must_not=args.must_not
        ):
            print(json.dumps(hit))
    else:
        rows = bm25_topk(
            spark, args.index, args.query, args.k,
            must=args.must, must_not=args.must_not,
        ).collect()
        for r in rows:
            print(f"{r.doc_id}\t{r.score}")


if __name__ == "__main__":
    main()
