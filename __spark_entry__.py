"""Driver contract for the spark-graft builder (PySpark target).

entry()     — flagship BM25 top-k over sf0.001 documents.
queries()   — operator-parity queries from SURVEY.md §2 (see
              conveyorbelt_spark/queries.py for the implementations).
oracle_sql()— matching DuckDB SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# executor Python workers unpickle Arrow kernels from conveyorbelt_spark —
# export the package root so they can import it regardless of the driver's
# cwd (workers read PYTHONPATH when the pyspark daemon spawns)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{_pp}" if _pp else _REPO

from pyspark.sql import DataFrame, SparkSession

from conveyorbelt_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10."""
    from conveyorbelt_spark.queries import q10_bm25_topk

    return q10_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
