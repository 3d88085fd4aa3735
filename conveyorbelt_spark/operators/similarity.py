"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  JVM-side (zip_with/aggregate, codegen'd) for a single query; Arrow/numpy
  matmul kernel for query batches.
- ``lsh_bucket`` + ``lsh_topk``: random-hyperplane LSH — the scale path:
  candidates come from the query's bucket (+ optional multiprobe neighbors),
  then exact cosine re-rank. At 10^9+ vectors the bucket column is the
  partition key, so a query touches one partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def _vec_lit(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs one query vector (double math, rank by
    (cos desc, id asc))."""
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    q = _vec_lit(query_vec)
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    dot = F.aggregate(F.zip_with("v", q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        v.select(id_col, (dot / (norm * F.lit(qnorm))).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_batch(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Many queries at once: per-partition numpy matmul (Arrow kernel),
    partition-local top-k, global window top-k. Returns
    (query_id, vec_id, cos_sim, rank)."""
    qids = [q[0] for q in queries]
    qm = np.array([q[1] for q in queries], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            sims = (m / norms[:, None]) @ qm.T  # (n_vec, n_q)
            ids = pdf[id_col].to_numpy()
            outs = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                top = min(k, len(col))
                idx = np.argpartition(-col, top - 1)[:top]
                outs.append(
                    pd.DataFrame({"query_id": qid, id_col: ids[idx], "cos_sim": col[idx]})
                )
            yield pd.concat(outs, ignore_index=True)

    local = emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"query_id long, {id_col} long, cos_sim double"
    )
    from pyspark.sql import Window as W  # noqa: N817

    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH (scale path)
# --------------------------------------------------------------------------

def hyperplanes(dim: int, n_planes: int = 8, seed: int = 11) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Column: LSH bucket id = sign bits of plane dot products (JVM-side)."""
    bits = None
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits


def lsh_index(
    emb: DataFrame, planes: np.ndarray, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """→ (vec_id, embedding, bucket). Write partitionBy('bucket') at scale."""
    return emb.select(
        id_col, vec_col, lsh_bucket_col(F.col(vec_col).cast("array<double>"), planes).alias("bucket")
    )


# --------------------------------------------------------------------------
# IVF-flat (coarse k-means quantizer → cluster-pruned exact re-rank)
# --------------------------------------------------------------------------

def ivf_train(
    emb: DataFrame,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 10,
    seed: int = 23,
) -> np.ndarray:
    """Deterministic coarse quantizer: Lloyd's k-means on a driver-side
    sample (normalized vectors, cosine ≈ L2 on the unit sphere). The
    centroid table is tiny (n_centroids × dim) — it broadcasts by value
    into the assignment kernel; training cost is O(sample), independent of
    corpus size."""
    rows = emb.select(vec_col).limit(sample).collect()
    m = np.array([r[0] for r in rows], dtype=np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, embedding, cluster): nearest-centroid assignment via one
    Arrow kernel (numpy matmul per batch — vectorized, no per-row Python).
    Write ``partitionBy('cluster')`` at scale so a query's nprobe clusters
    prune to nprobe partitions."""
    cent = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            pdf = pdf.copy()
            pdf["cluster"] = np.argmax((m / norms) @ cent.T, axis=1).astype("int32")
            yield pdf

    base = emb.select(id_col, vec_col)
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in base.schema.fields)
    return base.mapInPandas(run, schema=out_schema + ", cluster int")


def ivf_topk(
    indexed: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: scan only the query's ``nprobe`` nearest clusters (partition
    pruning on the cluster column), exact cosine re-rank inside — the IVF
    scale path next to the LSH one."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    cent = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(cent @ q))[: max(1, nprobe)]
    cand = indexed.where(F.col("cluster").isin([int(c) for c in order]))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def lsh_topk(
    indexed: DataFrame,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 0,
) -> DataFrame:
    """ANN: scan only the query's bucket (+ Hamming-1 neighbors if
    ``multiprobe``), exact cosine re-rank inside."""
    q = np.asarray(query_vec, dtype=np.float64)
    bucket = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, q)) > 0))
    buckets = {bucket}
    for probe in range(min(multiprobe, len(planes))):
        buckets.add(bucket ^ (1 << probe))
    cand = indexed.where(F.col("bucket").isin(sorted(buckets)))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
