"""Evidence that incremental indexing is O(delta), not O(index):
ingest identical-size batches while the index grows ~20x and report
per-batch wall time. Before the round-2 rework, index_batch re-read the
whole segments dir and rewrote the full dictionary per batch (cost grew
with index size); now every derived artifact comes from the batch's own
run partitions.

Usage:  python scripts/incremental_bench.py [n_batches] [batch_docs]
Prints one JSON line: {"batch_sec": [...], "first3_avg": s, "last3_avg": s,
"ratio_last_first": r}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from conveyorbelt_spark.corpus import corpus_spark_df  # noqa: E402
from conveyorbelt_spark.session import get_spark  # noqa: E402
from conveyorbelt_spark.streaming.incremental import index_batch  # noqa: E402


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark("incremental-bench")
    out = tempfile.mkdtemp(prefix="cb_incbench_")
    times = []
    try:
        for i in range(n_batches):
            docs = corpus_spark_df(
                spark, batch_docs, seed=100 + i, n_parts=1, part_offset=i
            ).persist()
            docs.count()  # exclude synthesis from the measurement
            t0 = time.time()
            index_batch(spark, docs, out, i, n_buckets=16)
            times.append(round(time.time() - t0, 3))
            docs.unpersist()
        first3 = sum(times[:3]) / 3
        last3 = sum(times[-3:]) / 3
        print(
            json.dumps(
                {
                    "batch_sec": times,
                    "n_batches": n_batches,
                    "batch_docs": batch_docs,
                    "first3_avg": round(first3, 3),
                    "last3_avg": round(last3, 3),
                    "ratio_last_first": round(last3 / first3, 3),
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
