"""Deduplication operators for training-data pipelines.

All hashing is PORTABLE by construction: shingles are hashed with
``md5 → first 15 hex chars → 60-bit int``, and MinHash permutations are
universal hashes ``(a_i*h + b_i) mod (2^31-1)`` over that value — every step
is expressible identically in Spark SQL functions and DuckDB SQL, so the
oracle checks are exact (no float, no engine-specific hash).

Scale notes: MinHash and SimHash are fully JVM-side (explode shingles/tokens
→ ``F.md5`` → 60-bit int → integer permutation mins inside whole-stage
codegen — zero Python in the hot path); the LSH band join is an equi-join on
(band, key) that Catalyst shuffles on the band key, and band buckets are
capped (``max_bucket``) so a degenerate bucket (e.g. empty docs) can't
produce a quadratic pair explosion.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import Window as W  # noqa: N817
from pyspark.sql import functions as F  # noqa: N812

MERSENNE31 = (1 << 31) - 1
TOKEN_SPLIT = "[^a-z0-9]+"  # complement of textutils.TOKEN_RE — same stream


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

def shingles_col(text_col, k: int):
    """Column: distinct k-token shingles of lowercase alnum tokens.
    <k tokens → one whole-text shingle; no tokens → empty array.

    Built by zip_with over k shifted views of the token array — O(n·k) per
    row. (A transform(sequence, i -> slice(arr, i, k)) formulation is O(n²):
    the slice inside the lambda re-evaluates the token-split subexpression
    per element.)"""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    arr = F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != "")
    n = F.size(arr)
    grams = arr
    for j in range(1, k):
        shifted = F.slice(arr, j + 1, F.greatest(n - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda g, t: F.concat(g, F.lit(" "), t))
    grams = F.slice(grams, 1, F.greatest(n - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.when(n >= k, grams)
        .when(n > 0, F.array(F.array_join(arr, " ")))
        .otherwise(F.array().cast("array<string>"))
    )


def portable_hash60(col) -> "F.Column":
    """md5 hex[:15] as a 60-bit non-negative BIGINT — the engine-portable
    hash every dedup operator builds on (identical in DuckDB:
    ('0x' || substr(md5(x),1,15))::UBIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_perm: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """→ (doc_id, sig array<long>[num_perm]).

    Fully JVM-side: explode distinct shingles → md5 → 60-bit int mod M31 →
    ``num_perm`` universal-hash mins in ONE hash aggregate (each min is an
    integer expression inside whole-stage codegen; the shuffle carries one
    row per (doc, shingle), reduced map-side by partial aggregation).
    Docs with no tokens get the identity signature [M31] * num_perm."""
    params = perm_params(num_perm, seed)
    # full k-gram shingles via posexplode + window lead: every step is a
    # codegen'd builtin (no interpreted array lambdas). The window partitions
    # by doc — bounded by one document's tokens, skew-free at any corpus size.
    c = F.col(text_col)
    arr = F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != "")
    toks = df.select(id_col, F.posexplode(arr).alias("pos", "term"))
    w = W.partitionBy(id_col).orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", j).over(w) for j in range(1, shingle_k)]
    full = (
        toks.select(id_col, F.concat_ws(" ", *parts).alias("shingle"), parts[-1].alias("_last"))
        .where(F.col("_last").isNotNull())
        .select(id_col, "shingle")
    )
    # docs with 0 < n < k tokens contribute one whole-text shingle
    short = df.select(id_col, F.array_join(arr, " ").alias("shingle")).where(
        (F.size(arr) > 0) & (F.size(arr) < shingle_k)
    )
    # no distinct needed: duplicate shingles can't change a min
    sh = full.union(short)
    hv = F.pmod(portable_hash60("shingle"), F.lit(MERSENNE31))
    hashed = sh.select(id_col, hv.alias("hv"))
    mins = [
        F.min(F.pmod(F.lit(a) * F.col("hv") + F.lit(b), F.lit(MERSENNE31))).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = (
        hashed.groupBy(id_col)
        .agg(*mins)
        .select(id_col, F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))
    )
    fill = F.array_repeat(F.lit(MERSENNE31).cast("long"), num_perm)
    return (
        df.select(id_col)
        .join(sigs, id_col, "left")
        .select(id_col, F.coalesce("sig", fill).alias("sig"))
    )


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


def minhash_near_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    *,
    bands: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """Fused LSH banding + Jaccard estimate: one banding self-join that
    carries the signature arrays, so the estimate needs no re-join against
    the signatures (→ (doc_a, doc_b, est_jaccard)). Same candidates as
    ``minhash_lsh_pairs`` + same estimate as ``minhash_jaccard_estimate``."""
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
            F.md5(F.concat_ws(",", F.slice("sig", F.col("band") * r + 1, r))),
        )
        .select(id_col, "band", "bucket", "sig")
    )
    sized = banded.withColumn(
        "bsz", F.count("*").over(W.partitionBy("band", "bucket"))
    ).where(F.col("bsz") <= max_bucket)
    a = sized.select(F.col(id_col).alias("doc_a"), "band", "bucket", F.col("sig").alias("sig_a"))
    b = sized.select(F.col(id_col).alias("doc_b"), "band", "bucket", F.col("sig").alias("sig_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        / F.size("sig_a")
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
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
    the sign of Σ over distinct tokens of (±1 by token-hash bit j, weighted
    by tf). Portable: token hash = md5[:15] as int (mod 2^32).

    Fully JVM-side: explode tokens → (doc, term, tf) partial-agg shuffle →
    one hash aggregate computing all 32 signed bit sums as codegen'd integer
    expressions — no Python in the hot path."""
    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != "")
    tf = (
        df.select(id_col, F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    hv = F.pmod(portable_hash60("term"), F.lit(1 << SIMHASH_BITS))
    hashed = tf.select(id_col, "tf", hv.alias("hv"))
    sums = [
        F.sum(
            (F.shiftright("hv", j).bitwiseAND(F.lit(1)) * 2 - 1) * F.col("tf")
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy(id_col).agg(*sums)
    sim = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    out = agg.select(id_col, sim.alias("simhash"))
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(id_col, F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


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
    sh = df.select(F.col(id_col), shingles_col(text_col, shingle_k).alias("shingles"))
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

def embedding_lsh_candidates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    bands: int = 8,
    planes_per_band: int = 12,
    seed: int = 11,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via banded random-hyperplane LSH: vectors
    sharing ANY band's sign-bucket pair up through a bucketed equi-join —
    never an all-pairs cross join. ``planes_per_band`` sets precision
    (random-pair candidate rate ≈ bands × 2^-planes_per_band — too few
    planes floods the verify stage with quadratic bucket pairs), ``bands``
    sets recall (miss prob ≈ (1-p^r)^b; at cosine 0.995 the defaults miss
    ~1e-4). Oversized buckets are dropped (cap against quadratic blowup)."""
    import numpy as np
    import pandas as pd

    from .similarity import hyperplanes

    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, bands * planes_per_band, seed)
    weights = 1 << np.arange(planes_per_band, dtype=np.int64)

    def assign(batches):
        """All band buckets in ONE matmul per Arrow batch (per-plane
        interpreted array lambdas are ~10× slower at 16+ planes)."""
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (m @ planes.T) > 0  # (n, bands*planes_per_band)
            bk = bits.reshape(len(m), bands, planes_per_band) @ weights  # (n, bands)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, bands),
                    "band": np.tile(np.arange(bands, dtype=np.int32), len(m)),
                    "bucket": bk.reshape(-1).astype(np.int64),
                }
            )

    banded = emb.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col)).mapInPandas(
        assign, schema=f"{id_col} long, band int, bucket long"
    )
    sized = banded.withColumn(
        "bsz", F.count("*").over(W.partitionBy("band", "bucket"))
    ).where(F.col("bsz") <= max_bucket)
    a = sized.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = sized.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    *,
    exact: bool = False,
    bands: int = 8,
    planes_per_band: int = 12,
    seed: int = 11,
    max_bucket: int = 1000,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. Default path: banded-LSH candidates
    (bucketed equi-join) → exact cosine verify on candidates only — the
    shape that survives 10^9+ vectors. ``exact=True`` switches to the
    brute-force O(n²) cross join as a small-scale verification mode."""
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    v = v.withColumn("n", norm)
    a = v.select(F.col(id_col).alias("doc_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = v.select(F.col(id_col).alias("doc_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    if exact:
        cand = a.crossJoin(b).where(F.col("doc_a") < F.col("doc_b"))
    else:
        pairs = embedding_lsh_candidates(
            emb, id_col, vec_col,
            bands=bands, planes_per_band=planes_per_band, seed=seed, max_bucket=max_bucket,
        )
        cand = pairs.join(a, "doc_a").join(b, "doc_b")
    return (
        cand.withColumn("cos_sim", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate pairs → cluster labels: (doc_id, component), the
    component being the MINIMUM doc_id reachable through the pair graph
    (the canonical-representative convention every dedup pipeline wants —
    keep component == doc_id, drop the rest).

    Distributed min-label propagation: labels start as each node's own
    id; each round every node takes the min of its own and its
    neighbours' labels (one hash join + one hash agg per round), until a
    round changes nothing. Rounds needed = graph diameter — near-dup
    clusters are small and dense (a handful of rounds); a pathological
    10^6-long chain would need max_iter escalation, which raises rather
    than silently mislabeling. Each round localCheckpoints to cut the
    iterative lineage (the known Spark iterative-join pitfall); the edge
    list is reused across rounds. At 100 TB scale this is the standard
    alternating-join CC (Kiveris et al. — one shuffle per round, no
    driver materialization; counts per round are the only actions)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .select(edges.src.alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component").union(neigh)
            .groupBy("node").agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node").alias("doc_id"), "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter exceeds max_iter — raise it)"
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    *,
    default_rate: float = 0.0,
    modulus: int = 10_000,
) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    keep a row iff ``(id × 2654435761) mod modulus < rate × modulus`` for
    its stratum's rate — a pure JVM filter (Knuth multiplicative hash on
    the id), no shuffle, no RNG state, reproducible row-for-row across
    engines and runs (the property training pipelines need for exact
    re-builds and A/B holdouts). Strata absent from ``rates`` keep
    ``default_rate``. Scale: predicate-only — pushes to the scan."""
    KNUTH = 2654435761
    # fold the id below 2^30 first so id × KNUTH stays inside int64 under
    # ANSI arithmetic (xxhash-derived ids are ~2^62)
    folded = F.pmod(F.col(id_col).cast("long"), F.lit(1_000_000_007))
    bucket = F.pmod(folded * F.lit(KNUTH), F.lit(modulus))
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | (
            (F.col(stratum_col) == stratum) & (bucket < int(rate * modulus))
        )
    if default_rate > 0:
        known = list(rates)
        cond = cond | (
            ~F.col(stratum_col).isin(known)
            & (bucket < int(default_rate * modulus))
        )
    return df.where(cond)
