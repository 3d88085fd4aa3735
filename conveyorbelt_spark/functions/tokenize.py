"""Vectorized tokenize kernels: documents → (doc_id, term, tf, dl) tuples.

This is the "ES analyzer" half the reference delegates
(src/ConveyorBelt.Tooling/NestBatchPusher.cs pushes raw docs; ES tokenizes).
Here it's an Arrow-batched pandas kernel over mapInPandas — no per-row
Python UDFs (input_hint mandate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..textutils import (
    _STEM_ES_GUARD_RE,
    _STEM_IES_RE,
    _STEM_S_RE,
    TOKEN_RE,
)

TOKENS_SCHEMA = "doc_id long, term string, tf long, dl long"


def _analyze_exploded(ex: pd.DataFrame, analyzer: dict) -> pd.DataFrame:
    """Vectorized analyzer chain over the exploded (_row, doc_id, dl, term)
    frame — the same regexes as ``textutils.stem_s``/``analyze`` (query and
    build agree by construction). ``dl`` is recomputed as the POST-filter
    token count (the Lucene convention: stopwords don't count toward
    length norms)."""
    stop = analyzer.get("stopwords") or []
    if stop:
        ex = ex[~ex["term"].isin(set(stop))]
    ml = int(analyzer.get("min_len", 1))
    if ml > 1:
        ex = ex[ex["term"].str.len() >= ml]
    if analyzer.get("stem") == "s":
        t = ex["term"]
        t_ies = t.str.replace(_STEM_IES_RE, "y", regex=True)
        ies_applied = t_ies.ne(t)
        guard = t.str.contains(_STEM_ES_GUARD_RE, regex=True)
        stripped = t.str.replace(_STEM_S_RE, "", regex=True)
        ex = ex.assign(term=t_ies.where(ies_applied, t.where(guard, stripped)))
    if not len(ex):
        return ex
    dl2 = ex.groupby("_row")["term"].transform("size").astype("int64")
    return ex.assign(dl=dl2)


def _tokenize_batch(
    pdf: pd.DataFrame, id_col: str, text_col: str, analyzer: dict | None = None
) -> pd.DataFrame:
    """One Arrow batch: explode tokens, count (doc, term) pairs, attach dl."""
    toks = pdf[text_col].str.lower().str.findall(TOKEN_RE)
    dl = toks.str.len().astype("int64")
    # group by input ROW (the reset index), not doc_id — two rows with the
    # same doc_id in one batch (dup urls) must not merge their tfs here;
    # duplicate docs are dropped later in the sorted block builder.
    ex = pd.DataFrame(
        {"doc_id": pdf[id_col].to_numpy(), "dl": dl.to_numpy(), "term": toks}
    ).reset_index(names="_row")
    ex = ex.explode("term", ignore_index=True)
    ex = ex.dropna(subset=["term"])
    if analyzer:
        ex = _analyze_exploded(ex, analyzer)
    grouped = (
        ex.groupby(["_row", "doc_id", "dl", "term"], sort=False).size().rename("tf").reset_index()
    )
    return grouped[["doc_id", "term", "tf", "dl"]].astype(
        {"doc_id": "int64", "tf": "int64", "dl": "int64"}
    )


def tokenize_to_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    analyzer: dict | None = None,
) -> DataFrame:
    """documents(id, text) → (doc_id, term, tf, dl), one row per (doc, term).

    ``dl`` (document length in tokens) is denormalized onto every tuple so
    the scorer never needs a doc-length join (SURVEY §2.6 J3: denormalized
    preferred). ``analyzer`` applies the optional stopword/min_len/stem
    chain (see textutils.analyze) vectorized."""

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield _tokenize_batch(pdf, id_col, text_col, analyzer)

    return df.select(id_col, text_col).mapInPandas(run, schema=TOKENS_SCHEMA)


POS_TOKENS_SCHEMA = "doc_id long, term string, tf long, dl long, posb binary"


def _tokenize_batch_pos(
    pdf: pd.DataFrame, id_col: str, text_col: str, analyzer: dict | None = None
) -> pd.DataFrame:
    """Positional variant: per (doc, term) also emit ``posb`` — the term's
    in-document token positions, delta-gapped + varint-encoded (ascending;
    first absolute). Everything vectorized: explode → cumcount →
    stable-sort → one flat varint encode + per-group byte slicing.

    With an ``analyzer``, positions keep the ORIGINAL pre-filter slot index
    (Lucene position-increment gaps: a removed stopword leaves a hole, it
    does not shift later tokens), while ``dl`` is the POST-filter token
    count (Lucene length-norm convention) — the query side mirrors both via
    ``textutils.analyze_with_slots``."""
    import numpy as np

    from .codecs import varint_encode_ex

    toks = pdf[text_col].str.lower().str.findall(TOKEN_RE)
    dl = toks.str.len().astype("int64")
    ex = pd.DataFrame(
        {"doc_id": pdf[id_col].to_numpy(), "dl": dl.to_numpy(), "term": toks}
    ).reset_index(names="_row")
    ex = ex.explode("term", ignore_index=True)
    ex["pos"] = ex.groupby("_row").cumcount()
    ex = ex.dropna(subset=["term"])
    if analyzer:
        # _analyze_exploded keeps extra columns (pos) intact: stopword/
        # min_len rows drop (their pos slots become gaps), stems rewrite
        # term, dl is recomputed post-filter
        ex = _analyze_exploded(ex, analyzer)
    if not len(ex):
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "term": pd.Series(dtype=object),
                "tf": pd.Series(dtype="int64"),
                "dl": pd.Series(dtype="int64"),
                "posb": pd.Series(dtype=object),
            }
        )
    ex = ex.sort_values(["_row", "term", "pos"], kind="mergesort")
    rows_a = ex["_row"].to_numpy()
    terms_a = ex["term"].to_numpy()
    pos_a = ex["pos"].to_numpy().astype(np.uint64)

    new_grp = np.ones(len(ex), dtype=bool)
    new_grp[1:] = (rows_a[1:] != rows_a[:-1]) | (terms_a[1:] != terms_a[:-1])
    starts = np.flatnonzero(new_grp)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:] - 1
    ends[-1] = len(ex) - 1
    tf = (ends - starts + 1).astype("int64")

    gaps = np.empty_like(pos_a)
    gaps[1:] = pos_a[1:] - pos_a[:-1]
    gaps[starts] = pos_a[starts]  # absolute restart per group
    buf, lens = varint_encode_ex(gaps)
    off = np.concatenate(([0], np.cumsum(lens)))
    raw = buf.tobytes()
    posb = [raw[off[s] : off[e + 1]] for s, e in zip(starts, ends)]

    return pd.DataFrame(
        {
            "doc_id": ex["doc_id"].to_numpy()[starts].astype("int64"),
            "term": terms_a[starts],
            "tf": tf,
            "dl": ex["dl"].to_numpy()[starts].astype("int64"),
            "posb": posb,
        }
    )


def tokenize_to_postings_pos(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    analyzer: dict | None = None,
) -> DataFrame:
    """Positional postings: (doc_id, term, tf, dl, posb) — the input stream
    for a positions=True index (phrase queries). ``analyzer`` composes with
    positions via increment gaps (see ``_tokenize_batch_pos``)."""

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield _tokenize_batch_pos(pdf, id_col, text_col, analyzer)

    return df.select(id_col, text_col).mapInPandas(run, schema=POS_TOKENS_SCHEMA)


def with_doc_id(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Deterministic non-negative docID = xxhash64(url) >>> 1.

    Stable across runs and cluster sizes (SURVEY §1.4); the unsigned shift
    keeps ids in [0, 2^63) so signed ordering == unsigned ordering, which
    lets the index use the top bits as *range* buckets."""
    return df.withColumn("doc_id", F.shiftrightunsigned(F.xxhash64(F.col(url_col)), 1))


def extract_text_df(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Pinned HTML→text as a vectorized kernel (parity with textutils.extract_text)."""
    from ..textutils import extract_text

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["extracted_text"] = pdf[html_col].map(
                lambda b: extract_text(bytes(b)) if b is not None else None
            )
            yield pdf

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema=out_schema + ", extracted_text string")
