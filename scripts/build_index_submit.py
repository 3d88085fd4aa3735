"""spark-submit entry point for the index build (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

    zip -r /tmp/cb.zip conveyorbelt_spark
    spark-submit --py-files /tmp/cb.zip scripts/build_index_submit.py \
        --input /path/to/pages_parquet --output /path/to/index \
        [--n-buckets 64] [--resume] [--format parquet|iceberg]

On a cluster, size --n-buckets ≈ 2× total executor cores (it bounds the
head-term slice per task) and let AQE handle the rest.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--n-term-buckets", type=int, default=64)
    ap.add_argument("--commit-groups", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--positions", action="store_true",
                    help="positional index (enables phrase queries)")
    ap.add_argument("--store-docs", action="store_true",
                    help="write the doc-store sidecar (search_docs resolution)")
    ap.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("conveyorbelt-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.path.insert(0, ".")
    from conveyorbelt_spark.index.build import build_index

    if args.format == "iceberg":
        docs = spark.read.format("iceberg").load(args.input)
    else:
        docs = spark.read.parquet(args.input)
    stats = build_index(
        spark,
        docs,
        args.output,
        url_col=args.url_col,
        text_col=args.text_col,
        n_buckets=args.n_buckets,
        block_size=args.block_size,
        n_term_buckets=args.n_term_buckets,
        commit_groups=args.commit_groups,
        resume=args.resume,
        positions=args.positions,
        store_docs=args.store_docs,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
