"""Deterministic synthetic Common-Crawl-style corpus.

Shape is exactly BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Vocabulary is Zipf(1.2) over 10k terms so head-term skew is real (the salted
repartition path is exercised — reference analogue
Modulo10MinuteTableShardScheduler.cs:13-28). ``text`` is derived from ``html``
by the pinned extractor, so the byte-identical invariant holds by
construction. Seeded with numpy's legacy RandomState (stability guaranteed
across numpy versions).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from .textutils import extract_text

VOCAB_SIZE = 10_000
ZIPF_S = 1.2
EPOCH = dt.datetime(2016, 9, 16, 5, 0, 0)  # matches FIXTURES.md warc_ts rule
_LANGS = np.array(["en", "de", "fr", "es"])
_LANG_P = np.array([0.90, 0.04, 0.03, 0.03])


def vocabulary(size: int = VOCAB_SIZE) -> np.ndarray:
    """term0000..termNNNN — rank i is the i-th most frequent term."""
    return np.array([f"term{i:05d}" for i in range(size)])


def zipf_probs(size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def generate_corpus(n_docs: int, seed: int = 42, part: int = 0) -> pd.DataFrame:
    """Generate ``n_docs`` deterministic web pages as a pandas DataFrame.

    ``part`` offsets the doc-id space so multiple partitions can be generated
    independently (distributed generation at scale) without collisions.
    """
    rng = np.random.RandomState(seed + part * 1_000_003)
    vocab = vocabulary()
    probs = zipf_probs()
    base = part * n_docs

    doc_lens = rng.randint(20, 200, size=n_docs)
    total = int(doc_lens.sum())
    flat_terms = vocab[rng.choice(len(vocab), size=total, p=probs)]
    langs = _LANGS[rng.choice(len(_LANGS), size=n_docs, p=_LANG_P)]

    # vectorized doc assembly: paragraph-ize the flat term stream with
    # joins over precomputed offsets (no per-token Python)
    offs = np.concatenate(([0], np.cumsum(doc_lens)))
    urls, stamps, htmls, texts = [], [], [], []
    for i in range(n_docs):
        gi = base + i
        terms = flat_terms[offs[i] : offs[i + 1]]
        title = " ".join(terms[:5])
        paras = [" ".join(terms[j : j + 40]) for j in range(0, len(terms), 40)]
        body = "<p>" + "</p><p>".join(paras) + "</p>"
        html = (
            f"<html><head><title>{title}</title>"
            f"<script>var x = 1 &amp;&amp; 2;</script></head>"
            f"<body>{body}</body></html>"
        )
        urls.append(f"https://site{gi % 1000}.example/{gi * 2654435761 % 2**32:08x}/page{gi}")
        stamps.append(EPOCH + dt.timedelta(seconds=gi))
        htmls.append(html.encode("utf-8"))
        # text derived from html by the PINNED extractor semantics (script
        # content is stripped); for the synthetic html shape the result is
        # exactly this concatenation — asserted byte-identical against
        # extract_text in tests
        texts.append(title + " " + " ".join(paras))
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": stamps,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def corpus_spark_df(spark, n_docs: int, seed: int = 42, n_parts: int = 1, part_offset: int = 0):
    """Distributed corpus as a Spark DataFrame — each partition generated
    independently on executors via mapInPandas (no driver-side materialize).
    ``part_offset`` shifts the doc-id space (disjoint urls across calls —
    needed when simulating multiple ingestion batches)."""
    from pyspark.sql import functions as F  # noqa: N812

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    per_part = n_docs // n_parts
    parts = spark.range(part_offset, part_offset + n_parts).select(F.col("id").alias("part"))

    def gen(batches):
        for pdf in batches:
            for p in pdf["part"].tolist():
                yield generate_corpus(per_part, seed=seed, part=int(p))

    return parts.repartition(n_parts, "part").mapInPandas(gen, schema=schema)


def reference_query_set() -> list[dict]:
    """The fixed reference query set (FIXTURES.md §1): single rare terms,
    single head terms, 2–4-term conjunctions mixing rare+head, absent terms,
    k ∈ {10, 100}. Deterministic — checked by rank-identity tests."""
    qs: list[dict] = []
    heads = ["term00000", "term00001", "term00002", "term00005"]
    mids = ["term00050", "term00123", "term00200", "term00400"]
    rares = ["term05000", "term07777", "term08500", "term09321"]
    absent = ["zzzmissing", "notaword9"]
    for t in heads + mids + rares:
        qs.append({"q": t, "k": 10})
    qs += [
        {"q": f"{heads[0]} {rares[0]}", "k": 10},
        {"q": f"{heads[1]} {mids[1]}", "k": 100},
        {"q": f"{mids[0]} {rares[1]}", "k": 10},
        {"q": f"{heads[2]} {mids[2]} {rares[2]}", "k": 10},
        {"q": f"{heads[3]} {heads[0]} {mids[3]}", "k": 100},
        {"q": f"{heads[0]} {mids[0]} {rares[0]} {rares[3]}", "k": 10},
        {"q": f"{absent[0]}", "k": 10},
        {"q": f"{heads[0]} {absent[1]}", "k": 10},
        {"q": f"{mids[1]} {mids[2]}", "k": 100},
        {"q": f"{rares[0]} {rares[1]}", "k": 10},
    ]
    return qs
