"""Dedup + similarity + text-stats operator tests (training-pipeline ops)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: N812

from conveyorbelt_spark.functions.textstats import fingerprint, lang_id, quality_score, token_counts
from conveyorbelt_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_jaccard_estimate,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_near_pairs,
)
from conveyorbelt_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_batch,
    hyperplanes,
    lsh_index,
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs through the green field "
    "towards the old farm house near the river bank"
)
NEAR = BASE.replace("green", "wide")  # one token changed
FAR = "completely different content about database engines and query optimization with spark"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, NEAR), (3, FAR), (4, BASE), (5, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    assert kept == [1, 2, 3, 5]  # 4 is an exact dup of 1


def test_minhash_lsh_finds_near_dup(spark, docs):
    sigs = minhash_signatures(docs, num_perm=16)
    pairs = minhash_lsh_pairs(sigs).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 4) in got  # exact dup always collides
    assert (1, 2) in got  # near dup shares bands
    assert (1, 3) not in got and (2, 3) not in got


def test_minhash_jaccard_estimate(spark, docs):
    sigs = minhash_signatures(docs, num_perm=16)
    pairs = minhash_lsh_pairs(sigs)
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in minhash_jaccard_estimate(sigs, pairs).collect()}
    assert est[(1, 4)] == 1.0
    assert est[(1, 2)] > 0.5


def test_ngram_jaccard_exact(spark, docs):
    pairs = spark.createDataFrame([(1, 2), (1, 4), (1, 3)], "doc_a long, doc_b long")
    j = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard(docs, pairs).collect()}
    assert j[(1, 4)] == 1.0
    assert 0.5 < j[(1, 2)] < 1.0
    assert j[(1, 3)] == 0.0


def test_simhash_near_pairs(spark, docs):
    sh = simhash(docs)
    vals = {r.doc_id: r.simhash for r in sh.collect()}
    assert vals[1] == vals[4]
    # near-dup hamming small, far doc large
    ham12 = bin(vals[1] ^ vals[2]).count("1")
    ham13 = bin(vals[1] ^ vals[3]).count("1")
    assert ham12 < ham13
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(sh, max_hamming=3).collect()}
    assert pairs[(1, 4)] == 0


def test_embedding_near_dups(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.doc_a, r.doc_b) for r in embedding_near_dups(emb, threshold=0.9).collect()}
    assert got == {(1, 2)}
    exact = {(r.doc_a, r.doc_b) for r in embedding_near_dups(emb, threshold=0.9, exact=True).collect()}
    assert exact == got


def test_embedding_lsh_matches_exact_on_clusters(spark):
    """Bucketed-LSH default path finds the same near-dup pairs as the
    brute-force cross join on a clustered corpus (verification primitive)."""
    rng = np.random.RandomState(17)
    base = rng.randn(12, 16)
    rows = []
    vid = 0
    for i in range(12):
        for _ in range(3):  # 3 noisy copies per cluster → near-dup pairs
            v = base[i] + rng.randn(16) * 0.02
            rows.append((vid, (v / np.linalg.norm(v)).tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lsh = {(r.doc_a, r.doc_b) for r in embedding_near_dups(emb, threshold=0.98).collect()}
    exact = {
        (r.doc_a, r.doc_b) for r in embedding_near_dups(emb, threshold=0.98, exact=True).collect()
    }
    assert lsh == exact and len(exact) == 12 * 3  # 3 pairs per cluster


def test_cosine_topk_and_lsh(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 16)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    q = vecs[7].tolist()
    exact = [r.vec_id for r in cosine_topk(emb, q, 5).collect()]
    assert exact[0] == 7  # self is nearest

    planes = hyperplanes(16, n_planes=4, seed=11)
    idx = lsh_index(emb, planes)
    approx = [r.vec_id for r in lsh_topk(idx, q, planes, 5, multiprobe=2).collect()]
    assert approx[0] == 7  # self lands in its own bucket
    # recall sanity: LSH top-5 overlaps exact top-5
    assert len(set(exact) & set(approx)) >= 2


def test_cosine_topk_batch_matches_single(spark):
    rng = np.random.RandomState(5)
    vecs = rng.randn(100, 8)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    ).repartition(4)
    queries = [(0, vecs[3].tolist()), (1, vecs[50].tolist())]
    batch = cosine_topk_batch(emb, queries, k=5).collect()
    for qid, qv in queries:
        single = [r.vec_id for r in cosine_topk(emb, qv, 5).collect()]
        got = [r.vec_id for r in batch if r.query_id == qid]
        assert got == single


def test_ivf_topk(spark):
    """IVF-flat scale path: coarse k-means quantizer, cluster-pruned exact
    re-rank; self is retrieved and recall overlaps the exact top-k."""
    from conveyorbelt_spark.operators.similarity import ivf_index, ivf_topk, ivf_train

    rng = np.random.RandomState(9)
    base = rng.randn(8, 16)
    rows = []
    vid = 0
    for i in range(8):
        for _ in range(25):
            v = base[i] + rng.randn(16) * 0.15
            rows.append((vid, v.tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(4)
    cents = ivf_train(emb, n_centroids=8, iters=10)
    assert cents.shape == (8, 16)
    idx = ivf_index(emb, cents).persist()
    # every vector lands in exactly one cluster; clusters are populated
    assert idx.count() == 200
    assert idx.select("cluster").distinct().count() > 1

    q = rows[7][1]
    got = [r.vec_id for r in ivf_topk(idx, q, cents, 5, nprobe=2).collect()]
    assert got[0] == 7  # self in its own cluster
    exact = [r.vec_id for r in cosine_topk(emb, q, 5).collect()]
    assert len(set(got) & set(exact)) >= 3
    idx.unpersist()


def test_lang_id(spark):
    rows = [
        (1, "the cat and the dog is with that mouse"),
        (2, "der hund und die katze ist nicht mit"),
        (3, "le chien et la maison dans les champs pour"),
        (4, "xyz qqq zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_and_tokens_and_fp(spark, docs):
    q = {r.doc_id: r for r in quality_score(docs).collect()}
    assert q[1].quality > q[5].quality  # empty doc scores worst
    assert 0.0 <= q[1].quality <= 1.0
    t = {r.doc_id: r for r in token_counts(docs).collect()}
    assert t[1].ws_tokens == len(BASE.split())
    assert t[1].word_tokens == len(BASE.split())
    assert t[5].ws_tokens == 0
    fp = {r.doc_id: r.fp for r in fingerprint(docs).collect()}
    assert fp[1] == fp[4] != fp[2]


def test_connected_components_chain_and_convergence(spark):
    """Min-label propagation handles chains (diameter > 1 round) and
    disjoint clusters; non-convergence raises instead of mislabeling."""
    from conveyorbelt_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    import pytest as _pt

    with _pt.raises(RuntimeError, match="converge"):
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
        )
        connected_components(chain, max_iter=2)


def test_stratified_sample_deterministic(spark):
    from conveyorbelt_spark.operators.dedup import stratified_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = stratified_sample(
        df, {"a": 1.0, "b": 0.5}, stratum_col="source", default_rate=0.0
    )
    got = kept.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts["a"] == 1000            # rate 1.0 keeps everything
    assert 400 <= counts.get("b", 0) <= 600  # ~half
    assert "c" not in counts              # default 0 drops the stratum
    # bit-reproducible: the same call returns the same rows
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"] for r in stratified_sample(
            df, {"a": 1.0, "b": 0.5}, stratum_col="source", default_rate=0.0
        ).collect()
    )
    assert ids1 == ids2


def test_quality_filter_reasons(spark):
    from conveyorbelt_spark.functions.textstats import quality_filter

    rows = [
        (1, "the and of to is that with " * 20),          # kept
        (2, "tiny"),                                       # too_short
        (3, "the @@@@@@@@@@@@@@@@@@@@ " * 15),             # low_alnum
        (4, "zebra quark flux node grid " * 20),           # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["keep"], r["reason"])
        for r in quality_filter(df, min_tokens=10).collect()
    }
    assert got[1] == (True, "")
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "low_alnum")
    assert got[4] == (False, "no_stopwords")
