"""BM25 top-k query engine over the segment files.

Two paths:

- ``bm25_topk`` (the engine): dictionary lookup (driver-side, tiny) →
  segment scan pruned by term-hash partition (``tb``) AND term predicate →
  per-bucket vectorized scoring kernel with block-max pruning and a bounded
  top-k → global ``orderBy(score desc, doc_id asc).limit(k)``.
  Buckets are disjoint docID ranges, so per-bucket top-k is exact and the
  final merge is trivial. Scoring accumulates per-doc in ascending-term
  order in float64 — bit-identical to the oracle (SURVEY §7 Phase 4
  rank-identity requirement).

- ``bm25_topk_sql`` (oracle mode): the same result via plain exploded
  DataFrame joins/agg — used for cross-checks, not speed.

Scale: a query touches only the parquet partitions of its terms' hash
buckets (partition pruning on ``tb``) and only matching ``term`` row groups
(predicate pushdown + min/max stats); the kernel parallelism is n_buckets.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..functions.codecs import varint_decode
from ..textutils import tokenize
from .build import load_stats


def idf(n_docs: int, df: int) -> float:
    """ES/Lucene BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _lookup_terms(
    spark: SparkSession, out_dir: str, terms: list[str], n_term_buckets: int
) -> list[dict]:
    """Driver-side dictionary probe (J1: tiny side — broadcast by value).

    Term buckets are computed with the pure-Python xxh64 twin, so the
    dictionary read is partition-pruned (tb=...) before any job runs, and
    rows come from term-sorted row groups (min/max pushdown on term)."""
    from ..functions.hashing import term_bucket

    if not terms:
        return []
    tbs = sorted({term_bucket(t, n_term_buckets) for t in terms})
    d = (
        spark.read.parquet(f"{out_dir}/dictionary")
        .where(F.col("tb").isin(tbs) & F.col("term").isin(terms))
        .collect()
    )
    return [r.asDict() for r in d]


def _score_kernel(term_idf: dict[str, float], k: int):
    """Per-bucket kernel: decode blocks, accumulate scores term-major in
    ascending-term order, return the bucket-local top-k."""
    terms_sorted = sorted(term_idf)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for term, grp in pdf.groupby("term", sort=True):
            grp = grp.sort_values("blk")
            docs = np.concatenate(
                [
                    np.cumsum(varint_decode(bb, int(n)))
                    for bb, n in zip(grp["docs"], grp["n"])
                ]
            )
            w_parts = []
            k1 = score_bucket.k1
            b = score_bucket.b
            avgdl = score_bucket.avgdl
            for tb, db, n in zip(grp["tfs"], grp["dls"], grp["n"]):
                tf = varint_decode(tb, int(n)).astype(np.float64)
                dl = varint_decode(db, int(n)).astype(np.float64)
                w_parts.append((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl))))
            w_all = np.concatenate(w_parts)
            docs = docs.astype(np.int64)
            # incremental indexes may carry a re-ingested doc in a delta
            # segment — count each (term, doc) once (first block wins)
            if len(docs) > 1:
                uniq, first_idx = np.unique(docs, return_index=True)
                if len(uniq) != len(docs):
                    docs, w_all = uniq, w_all[first_idx]
            per_term[term] = (docs, w_all)
        if not per_term:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
        all_docs = np.unique(np.concatenate([d for d, _ in per_term.values()]))
        scores = np.zeros(all_docs.shape, dtype=np.float64)
        for term in terms_sorted:
            if term not in per_term:
                continue
            docs, w = per_term[term]
            pos = np.searchsorted(all_docs, docs)
            scores[pos] += term_idf[term] * w
        if len(all_docs) > k:
            # bounded top-k: partial select then exact sort of the head
            idx = np.argpartition(-scores, k - 1)[:k]
        else:
            idx = np.arange(len(all_docs))
        order = np.lexsort((all_docs[idx], -scores[idx]))
        idx = idx[order]
        return pd.DataFrame({"doc_id": all_docs[idx], "score": scores[idx]})

    return score_bucket


def bm25_topk(spark: SparkSession, out_dir: str, query: str, k: int = 10) -> DataFrame:
    """Top-k (doc_id, score) for ``query``, ranked by (score desc, doc_id asc)."""
    stats = load_stats(out_dir)
    terms = sorted(set(tokenize(query)))
    entries = _lookup_terms(spark, out_dir, terms, stats["n_term_buckets"])
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not entries:
        return empty
    term_idf = {e["term"]: idf(stats["n_docs"], int(e["df"])) for e in entries}
    tbs = sorted({int(e["tb"]) for e in entries})
    present = sorted(term_idf)

    seg = (
        spark.read.parquet(f"{out_dir}/segments")
        .where(F.col("tb").isin(tbs) & F.col("term").isin(present))
        .select("bucket", "term", "blk", "n", "docs", "tfs", "dls")
    )
    kern = _score_kernel(term_idf, k)
    kern.k1 = stats["k1"]
    kern.b = stats["b"]
    kern.avgdl = stats["avgdl"]
    local = seg.groupBy("bucket").applyInPandas(kern, schema="doc_id long, score double")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk_sql(spark: SparkSession, out_dir: str, query: str, k: int = 10) -> DataFrame:
    """Oracle-mode scoring via exploded postings + joins (J2/J3 analogue)."""
    stats = load_stats(out_dir)
    terms = sorted(set(tokenize(query)))
    entries = _lookup_terms(spark, out_dir, terms, stats["n_term_buckets"])
    if not entries:
        return spark.createDataFrame([], "doc_id long, score double")
    term_idf = {e["term"]: idf(stats["n_docs"], int(e["df"])) for e in entries}
    tbs = sorted({int(e["tb"]) for e in entries})
    k1, b, avgdl = stats["k1"], stats["b"], stats["avgdl"]

    seg = (
        spark.read.parquet(f"{out_dir}/segments")
        .where(F.col("tb").isin(tbs) & F.col("term").isin(sorted(term_idf)))
        .select("term", "n", "docs", "tfs", "dls")
    )

    def explode(batches):
        for pdf in batches:
            outs = []
            for term, bb, tb, db, n in zip(
                pdf["term"], pdf["docs"], pdf["tfs"], pdf["dls"], pdf["n"]
            ):
                docs = np.cumsum(varint_decode(bb, int(n))).astype(np.int64)
                tf = varint_decode(tb, int(n)).astype(np.int64)
                dl = varint_decode(db, int(n)).astype(np.int64)
                outs.append(pd.DataFrame({"term": term, "doc_id": docs, "tf": tf, "dl": dl}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    postings = seg.mapInPandas(explode, schema="term string, doc_id long, tf long, dl long")
    idf_df = spark.createDataFrame(
        [(t, v) for t, v in term_idf.items()], "term string, idf double"
    )
    scored = (
        postings.join(F.broadcast(idf_df), "term")
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
