"""Scaling-evidence runner: the SAME index-build job on the SAME input at
two parallelism levels (BASELINE.json north_rule: N vs 4N executors; sandbox
evidence per driver instructions: local[8] vs local[32]).

Run one configuration per process (fresh JVM, honest timing):

    python scripts/scaling_bench.py --cpus 8  --corpus /tmp/cb_scale_corpus
    python scripts/scaling_bench.py --cpus 32 --corpus /tmp/cb_scale_corpus

Or orchestrate both + write BENCH/BASELINE.md:

    python scripts/scaling_bench.py --both --docs 40000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_corpus(corpus_dir: str, n_docs: int) -> None:
    from conveyorbelt_spark.corpus import corpus_spark_df
    from conveyorbelt_spark.session import get_spark

    spark = get_spark("scale-gen", master="local[32]", shuffle_partitions=32)
    corpus_spark_df(spark, n_docs, seed=42, n_parts=128).write.mode("overwrite").parquet(
        corpus_dir
    )
    spark.stop()


def run_one(cpus: int, corpus_dir: str, n_buckets: int = 32) -> dict:
    from conveyorbelt_spark.corpus import reference_query_set
    from conveyorbelt_spark.index.build import build_index
    from conveyorbelt_spark.index.query import bm25_topk
    from conveyorbelt_spark.session import get_spark

    spark = get_spark(f"scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    docs = spark.read.parquet(corpus_dir)
    n_docs = docs.count()
    idx = tempfile.mkdtemp(prefix=f"cb_scale_idx_{cpus}_")
    try:
        t0 = time.time()
        build_index(spark, docs, idx, n_buckets=n_buckets)
        build_sec = time.time() - t0
        lat = []
        for case in reference_query_set():
            t0 = time.time()
            bm25_topk(spark, idx, case["q"], case["k"]).collect()
            lat.append(time.time() - t0)
        lat.sort()
        return {
            "cpus": cpus,
            "n_docs": n_docs,
            "build_sec": round(build_sec, 2),
            "docs_per_sec": round(n_docs / build_sec, 1),
            "bm25_p50_sec": round(lat[len(lat) // 2], 4),
            "bm25_p95_sec": round(lat[int(len(lat) * 0.95)], 4),
        }
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--corpus", default="/tmp/cb_scale_corpus")
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--both", action="store_true")
    ap.add_argument("--gen", action="store_true")
    args = ap.parse_args()

    if args.both:
        if not os.path.isdir(args.corpus):
            gen_corpus(args.corpus, args.docs)
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--cpus", str(cpus), "--corpus", args.corpus],
                capture_output=True, text=True, cwd=REPO,
            )
            line = out.stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(line)
        eff = results[32]["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
        summary = {
            "n8": results[8],
            "n32": results[32],
            "scaling_efficiency_8_to_32": round(eff, 3),
        }
        print(json.dumps(summary))
        write_baseline_md(summary)
        return

    if args.gen:
        gen_corpus(args.corpus, args.docs)
        return

    print(json.dumps(run_one(args.cpus, args.corpus)))


def write_baseline_md(s: dict) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n8, n32 = s["n8"], s["n32"]
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Same index-build job, same materialized input corpus ({n8["n_docs"]:,} synthetic
Common-Crawl-style docs, Zipf(1.2) vocabulary), run in separate fresh-JVM
processes at two parallelism levels (the sandbox stand-in for N vs 4N
executors per the driver's instructions).

| parallelism | build sec | docs/sec | BM25 p50 | BM25 p95 |
|---|---|---|---|---|
| local[8]  (N)  | {n8["build_sec"]} | {n8["docs_per_sec"]} | {n8["bm25_p50_sec"]} s | {n8["bm25_p95_sec"]} s |
| local[32] (4N) | {n32["build_sec"]} | {n32["docs_per_sec"]} | {n32["bm25_p50_sec"]} s | {n32["bm25_p95_sec"]} s |

**Scaling efficiency N→4N = throughput(4N) / (4 × throughput(N)) =
{s["scaling_efficiency_8_to_32"]}** (target ≥ 0.8, BASELINE.json).

Caveats: single-host local mode shares one disk and one JVM heap across
"executors"; shuffle goes through local disk. Real-cluster scaling is
expected to track the tokenize/encode compute, which is embarrassingly
parallel over (term, bucket) partitions — the bucket count (n_buckets) is
the knob that keeps head-term partitions bounded as the cluster grows.

Reproduce: `python scripts/scaling_bench.py --both --docs {n8["n_docs"]}`
""")


if __name__ == "__main__":
    main()
