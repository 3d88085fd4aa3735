"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all JVM-side (pyspark.sql.functions only) so they
run inside whole-stage codegen and have exact DuckDB-SQL twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

# deterministic stopword marker sets (heuristic n-gram/lexicon language ID)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour"],
    "es": ["el", "los", "las", "es", "en", "por", "para"],
}

TOKEN_SPLIT = "[^a-z0-9]+"
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"  # word / number / punct pieces


def _tokens_col(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: t != "")


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, lang_pred, lang_hits): argmax of marker-token hits per
    language; ties and zero hits → 'und'. Deterministic tie-break by
    language code ascending (higher inv_rank = earlier language wins the
    lexicographic struct max).

    Plan shape: explode tokens → broadcast hash join against the tiny
    (term, lang, inv_rank) marker dim → two hash aggregates. All JVM-side
    with map-side partial aggregation — the shuffle carries one row per
    (doc, lang) with marker hits only, not the full token stream."""
    spark = df.sparkSession
    langs = sorted(LANG_MARKERS)
    rows = [
        (m, lang, len(langs) - 1 - idx)
        for idx, lang in enumerate(langs)
        for m in LANG_MARKERS[lang]
    ]
    markers = spark.createDataFrame(rows, "term string, lang string, inv_rank int")
    toks = df.select(id_col, F.explode(_tokens_col(text_col)).alias("term"))
    hits = (
        toks.join(F.broadcast(markers), "term")
        .groupBy(id_col, "lang", "inv_rank")
        .agg(F.count("*").alias("hits"))
    )
    best = hits.groupBy(id_col).agg(F.max(F.struct("hits", "inv_rank", "lang")).alias("b"))
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.when(F.col("b.hits") > 0, F.col("b.lang")).otherwise(F.lit("und")).alias("lang_pred"),
            F.coalesce(F.col("b.hits"), F.lit(0)).cast("long").alias("lang_hits"),
        )
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ per-doc quality features + composite score in [0,1]:
    n_tokens, mean token length, stopword ratio, alnum ratio. The composite
    is a pinned linear blend — a quality gate for training-data filtering."""
    toks = _tokens_col(text_col)
    en = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    c = F.col(text_col)
    out = df.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(c).alias("n_chars_m"),
        (F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", "")) / F.greatest(F.length(c), F.lit(1))).alias("alnum_ratio"),
        (F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / F.greatest(F.size(toks), F.lit(1))).alias("stopword_ratio"),
        (F.length(F.concat_ws("", toks)) / F.greatest(F.size(toks), F.lit(1))).alias("mean_tok_len"),
    )
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
        + F.col("alnum_ratio") * 0.3
    )
    return out.withColumn("quality", score)


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, ws_tokens, word_tokens, bpe_ish_tokens): whitespace count,
    alnum-token count, and a BPE-ish regex piece count (training-cost
    estimation)."""
    c = F.col(text_col)
    ws = F.size(F.filter(F.split(c, "\\s+"), lambda t: t != ""))
    words = F.size(_tokens_col(text_col))
    bpe = F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_RE), 0))
    return df.select(
        id_col,
        ws.cast("long").alias("ws_tokens"),
        words.cast("long").alias("word_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, fp): md5 of whitespace-normalized lowercase text — the exact
    content fingerprint used for dedup/idempotent ids."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return df.select(id_col, F.md5(norm).alias("fp"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    shingle_k: int = 4,
    window_w: int = 5,
) -> DataFrame:
    """→ (id, fp long) distinct winnowing fingerprints: rolling k-token
    shingle hashes, minimum per sliding window of ``window_w`` consecutive
    shingles (the MOSS/winnowing scheme — guarantees any shared run of
    k+w-1 tokens yields a shared fingerprint). Docs with fewer than ``w``
    shingles contribute the minimum over all their shingles; docs with no
    tokens contribute nothing.

    Plan shape: posexplode + per-doc window (bounded by one document) +
    distinct — all codegen builtins, portable to the SQL oracle."""
    from pyspark.sql import Window as W  # noqa: N817

    from ..operators.dedup import portable_hash60

    toks = df.select(
        id_col,
        F.posexplode(_tokens_col(text_col)).alias("pos", "term"),
    )
    w_lead = W.partitionBy(id_col).orderBy("pos")
    parts = [F.col("term")] + [F.lead("term", j).over(w_lead) for j in range(1, shingle_k)]
    sh = (
        toks.select(id_col, "pos", F.concat_ws(" ", *parts).alias("shingle"), parts[-1].alias("_l"))
        .where(F.col("_l").isNotNull())
        .select(id_col, "pos", F.pmod(portable_hash60("shingle"), F.lit(1 << 32)).alias("hv"))
    )
    w_win = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window_w - 1)
    winnowed = sh.select(
        id_col,
        F.min("hv").over(w_win).alias("fp"),
        F.count("*").over(w_win).alias("_n"),
    ).withColumn("_mx", F.max("_n").over(W.partitionBy(id_col)))
    # complete windows, or the single all-shingles window of a short doc
    keep = (F.col("_n") == window_w) | ((F.col("_mx") < window_w) & (F.col("_n") == F.col("_mx")))
    return winnowed.where(keep).select(id_col, "fp").distinct()


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_alnum_ratio: float = 0.6,
    min_stopword_ratio: float = 0.01,
    min_quality: float = 0.5,
) -> DataFrame:
    """Training-corpus quality GATE (the C4/Gopher-style rule chain):
    (id, keep, reason) where reason is the FIRST failing rule in a pinned
    order — too_short / too_long / low_alnum / no_stopwords / low_quality
    / "" (kept). Built entirely from ``quality_score``'s JVM features;
    one column-pruned pass, no shuffle — the predicate a 100 TB filter
    stage pushes straight down onto the scan."""
    feats = quality_score(df, id_col, text_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("alnum_ratio") < min_alnum_ratio, F.lit("low_alnum"))
        .when(F.col("stopword_ratio") < min_stopword_ratio, F.lit("no_stopwords"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit(""))
    )
    return feats.select(
        id_col,
        reason.alias("reason"),
    ).withColumn("keep", F.col("reason") == "")
