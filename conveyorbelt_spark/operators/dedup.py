"""Deduplication operators for training-data pipelines.

All hashing is PORTABLE by construction: shingles are hashed with
``md5 → first 15 hex chars → 60-bit int``, and MinHash permutations are
universal hashes ``(a_i*h + b_i) mod (2^31-1)`` over that value — every step
is expressible identically in Spark SQL functions, pandas/numpy kernels, and
DuckDB SQL, so the oracle checks are exact (no float, no engine-specific
hash).

Scale notes: MinHash runs as one Arrow kernel per partition (one md5 per
shingle, permutations vectorized in numpy — not num_perm× explode); the LSH
band join is an equi-join on (band, key) that Catalyst shuffles on the band
key, and band buckets are capped (``max_bucket``) so a degenerate bucket
(e.g. empty docs) can't produce a quadratic pair explosion.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W  # noqa: N817
from pyspark.sql import functions as F  # noqa: N812

from ..textutils import tokenize

MERSENNE31 = (1 << 31) - 1


def perm_params(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) universal-hash parameters (odd a, 31-bit)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE31, size=num_perm) | 1
    b = rng.randint(0, MERSENNE31, size=num_perm)
    return list(zip(a.tolist(), b.tolist()))


def shingle_hash_py(shingle: str) -> int:
    """Portable shingle hash: md5 hex[:15] as int (60-bit, non-negative)."""
    return int(hashlib.md5(shingle.encode("utf-8")).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# Exact dedup: content-hash groupBy (the hash-groupBy baseline)
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (the min id). Idempotent-id analogue of
    the reference's PK+RK upsert dedup (NestBatchPusher.cs:71)."""
    keepers = (
        df.withColumn("_h", F.md5(F.col(text_col)))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
    )
    return df.join(keepers, id_col, "left_semi")


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

def _shingles(tokens: list[str], k: int) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_perm: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """→ (doc_id, sig array<long>[num_perm]). One Arrow kernel; md5 computed
    once per shingle, all permutations vectorized."""
    params = perm_params(num_perm, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]

    def run(batches):
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sh = _shingles(tokenize(text or ""), shingle_k)
                if not sh:
                    sigs.append([int(MERSENNE31)] * len(params))
                    ids.append(doc_id)
                    continue
                h = np.array(sorted(shingle_hash_py(s) for s in sh), dtype=np.int64)
                h31 = h % MERSENNE31
                vals = (a * h31[None, :] + b) % MERSENNE31  # (num_perm, n_shingles)
                sigs.append(vals.min(axis=1).tolist())
                ids.append(doc_id)
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(run, schema=f"{id_col} long, sig array<long>")


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    *,
    bands: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket → candidate pair
    (doc_a < doc_b). Bucket key = md5 of the band's signature slice.
    Oversized buckets are dropped (cap against quadratic blowup)."""
    num_perm_col = F.size("sig")
    r = (num_perm_col / bands).cast("int")
    banded = (
        sigs.select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
            "sig",
        )
        .withColumn(
            "bucket",
            F.md5(
                F.concat_ws(
                    ",",
                    F.slice("sig", F.col("band") * r + 1, r),
                )
            ),
        )
        .select(id_col, "band", "bucket")
    )
    sized = banded.withColumn(
        "bsz", F.count("*").over(W.partitionBy("band", "bucket"))
    ).where(F.col("bsz") <= max_bucket)
    a = sized.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    bdf = sized.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(bdf, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_jaccard_estimate(
    sigs_a: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature slots per pair."""
    sa = sigs_a.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs_a.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
            / F.size("sig_a"),
        )
        .select("doc_a", "doc_b", "est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash (near-dup fingerprint)
# --------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (doc_id, simhash long): 32-bit simhash over token hashes; bit j is
    the sign of Σ over tokens of (±1 by token-hash bit j, weighted by tf).
    Portable: token hash = md5[:15] as int (mod 2^32)."""

    def run(batches):
        bit_w = 1 << np.arange(SIMHASH_BITS, dtype=np.int64)
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = tokenize(text or "")
                if not toks:
                    ids.append(doc_id)
                    hashes.append(0)
                    continue
                vc = pd.Series(toks).value_counts()
                h = np.array([shingle_hash_py(t) for t in vc.index], dtype=np.int64) % (
                    1 << SIMHASH_BITS
                )
                w = vc.to_numpy().astype(np.int64)
                bits = (h[:, None] >> np.arange(SIMHASH_BITS)) & 1  # (n_tok, 32)
                score = ((2 * bits - 1) * w[:, None]).sum(axis=0)
                ids.append(doc_id)
                hashes.append(int(((score > 0).astype(np.int64) * bit_w).sum()))
            yield pd.DataFrame({id_col: ids, "simhash": hashes})

    return df.select(id_col, text_col).mapInPandas(run, schema=f"{id_col} long, simhash long")


def simhash_near_pairs(
    sh: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ k, via 4-block banding (a pair
    within distance 3 shares at least one of 4 8-bit blocks exactly)."""
    blocks = sh.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("blk"),
    ).withColumn("blk_val", F.expr("shiftright(simhash, blk * 8) & 255"))
    a = blocks.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "blk", "blk_val")
    b = blocks.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "blk", "blk_val")
    cand = (
        a.join(b, ["blk", "blk_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


# --------------------------------------------------------------------------
# Exact n-gram Jaccard (verification stage after LSH candidates)
# --------------------------------------------------------------------------

def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard over k-token shingle sets for candidate pairs —
    JVM-side set ops on shingle arrays (array_intersect/union)."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.size(F.split(F.lower(text_col), "[^a-z0-9]+")) - shingle_k,
                        F.lit(0),
                    ),
                ),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.try_element_at(
                            F.filter(F.split(F.lower(text_col), "[^a-z0-9]+"), lambda t: t != ""),
                            (i + j + 1).cast("int"),
                        )
                        for j in range(shingle_k)
                    ],
                ),
            )
        ).alias("shingles"),
    )
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine ≥ threshold. Brute-force O(n²) on purpose —
    the scale path buckets by LSH first (operators/similarity.py)."""
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    v = v.withColumn("n", norm)
    a = v.select(F.col(id_col).alias("doc_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = v.select(F.col(id_col).alias("doc_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cos_sim", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", F.round("cos_sim", 6).alias("cos_sim"))
    )
