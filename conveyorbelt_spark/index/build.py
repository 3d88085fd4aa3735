"""Inverted-index build: tokenize → salted shuffle → compressed posting blocks.

The distributed re-expression of the half the reference delegates to
Elasticsearch (SURVEY.md §7 Phase 3; reference pushes raw docs via
NestBatchPusher.cs:47-98 and lets ES build the index — here we ARE the index).

Pipeline (all DataFrame ops + two Arrow kernels, no per-row Python):

  documents(url, text)
    → doc_id = xxhash64(url) >>> 1                (deterministic identity,
                                                   SURVEY §1.4)
    → pass 1: doc lengths + corpus stats           (cheap, no explode shuffle)
    → pass 2: (term, doc_id, tf, dl) tuples
    → bucket = top bits of doc_id                  (RANGE bucket: per-(term,
      bucket) posting runs are disjoint docID ranges, so the per-term merge
      is ordered block concatenation — no re-sort, no decode. This is the
      salt that defuses head-term skew: the reference's
      Modulo10MinuteTableShardScheduler.cs:13-28 pattern, but range-aligned.)
    → repartition(term, bucket) + sortWithinPartitions(term, bucket, doc_id)
    → block builder kernel: 128-doc blocks, delta-gap+varint docIDs,
      varint tf & dl, block-max score metadata
    → segments parquet partitioned by term-hash bucket (query-time partition
      pruning), dictionary parquet, per-bucket lineage manifest.

Scale notes (100 TB / 10^12 docs): the only wide shuffle is (term, bucket);
bucket count bounds per-task skew for stopword-grade terms (df ~ N) at
N_postings/n_buckets, and n_buckets scales with cluster size without
changing file layout. Pass 1 is a narrow scan. Dictionary aggregation reads
only block metadata columns (column pruning keeps the binary columns out).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from ..functions.codecs import varint_encode_ex
from ..functions.tokenize import tokenize_to_postings, with_doc_id
from ..textutils import BM25_B, BM25_K1, TOKEN_RE

BLOCKS_SCHEMA = (
    "term string, bucket int, blk int, n int, min_doc long, max_doc long, "
    "sum_tf long, max_tf long, min_dl long, docs binary, tfs binary, dls binary"
)
DEFAULT_N_BUCKETS = 16
DEFAULT_BLOCK_SIZE = 128
DEFAULT_TERM_BUCKETS = 64


def _bucket_col(n_buckets: int):
    """Range bucket = top log2(n_buckets) bits of the non-negative doc_id."""
    bits = int(np.log2(n_buckets))
    assert 2**bits == n_buckets, "n_buckets must be a power of two"
    return F.shiftrightunsigned(F.col("doc_id"), 63 - bits).cast("int")


def _doclens_kernel(batches):
    """Pass-1 kernel: token count per doc (no explode — cheap)."""
    for pdf in batches:
        toks = pdf["text"].str.lower().str.findall(TOKEN_RE)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "dl": toks.str.len().astype("int64")}
        )


def _make_block_builder(block_size: int):
    """Kernel: sorted (term,bucket,doc_id) runs → compressed posting blocks.

    Receives Arrow batches in partition-sort order; a (term,bucket) group may
    span batches, so the tail group is carried between batches — memory is
    bounded by one group's bucket slice, which the range bucketing bounds.

    Block-max metadata is (max_tf, min_dl), NOT a precomputed score: the
    BM25 weight is monotone increasing in tf and decreasing in dl, so
    w(max_tf, min_dl, avgdl) evaluated at QUERY time is a valid per-block
    upper bound — which means the build needs no corpus-stats pre-pass at
    all (avgdl is derived after the fact from dictionary cf totals).
    """

    def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = pdf["doc_id"].to_numpy().astype(np.uint64)
        tfs = pdf["tf"].to_numpy().astype(np.uint64)
        dls = pdf["dl"].to_numpy().astype(np.uint64)
        terms = pdf["term"].to_numpy()
        buckets = pdf["bucket"].to_numpy()

        # drop duplicate doc_ids within a (term,bucket) run (dup urls):
        # rows are sorted, so dups are adjacent — keep the first (lowest
        # tf/dl, deterministic via the sort key). This replaces a full-text
        # dropDuplicates shuffle upstream.
        first = np.ones(len(pdf), dtype=bool)
        first[1:] = (
            (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1]) | (docs[1:] != docs[:-1])
        )
        if not first.all():
            docs, tfs, dls = docs[first], tfs[first], dls[first]
            terms, buckets = terms[first], buckets[first]
            pdf = pdf[first]

        # group starts where (term, bucket) changes
        new_grp = np.ones(len(pdf), dtype=bool)
        new_grp[1:] = (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
        grp_id = np.cumsum(new_grp) - 1
        grp_start_idx = np.flatnonzero(new_grp)
        pos_in_grp = np.arange(len(pdf)) - grp_start_idx[grp_id]
        blk_in_grp = pos_in_grp // block_size

        # block starts: new group or block_size boundary
        new_blk = new_grp | (pos_in_grp % block_size == 0)
        blk_starts = np.flatnonzero(new_blk)
        blk_ends = np.empty_like(blk_starts)
        blk_ends[:-1] = blk_starts[1:] - 1
        blk_ends[-1] = len(pdf) - 1
        n_per_blk = blk_ends - blk_starts + 1

        # delta-gap docIDs with restart at each block start (block first
        # docID absolute → blocks independently decodable)
        gaps = np.empty_like(docs)
        gaps[1:] = docs[1:] - docs[:-1]
        gaps[blk_starts] = docs[blk_starts]

        doc_buf, doc_len = varint_encode_ex(gaps)
        tf_buf, tf_len = varint_encode_ex(tfs)
        dl_buf, dl_len = varint_encode_ex(dls)

        max_tf = np.maximum.reduceat(tfs.astype(np.int64), blk_starts)
        min_dl = np.minimum.reduceat(dls.astype(np.int64), blk_starts)
        sum_tf = np.add.reduceat(tfs.astype(np.int64), blk_starts)

        doc_off = np.concatenate(([0], np.cumsum(doc_len)))
        tf_off = np.concatenate(([0], np.cumsum(tf_len)))
        dl_off = np.concatenate(([0], np.cumsum(dl_len)))
        doc_bytes_all = doc_buf.tobytes()
        tf_bytes_all = tf_buf.tobytes()
        dl_bytes_all = dl_buf.tobytes()

        rows = {
            "term": terms[blk_starts],
            "bucket": buckets[blk_starts].astype("int32"),
            "blk": blk_in_grp[blk_starts].astype("int32"),
            "n": n_per_blk.astype("int32"),
            "min_doc": docs[blk_starts].astype("int64"),
            "max_doc": docs[blk_ends].astype("int64"),
            "sum_tf": sum_tf,
            "max_tf": max_tf,
            "min_dl": min_dl,
            "docs": [
                doc_bytes_all[doc_off[s] : doc_off[e + 1]]
                for s, e in zip(blk_starts, blk_ends)
            ],
            "tfs": [
                tf_bytes_all[tf_off[s] : tf_off[e + 1]] for s, e in zip(blk_starts, blk_ends)
            ],
            "dls": [
                dl_bytes_all[dl_off[s] : dl_off[e + 1]] for s, e in zip(blk_starts, blk_ends)
            ],
        }
        return pd.DataFrame(rows)

    def run(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the last (term, bucket) group — it may continue in
            # the next batch
            last_term = pdf["term"].iloc[-1]
            last_bucket = pdf["bucket"].iloc[-1]
            tail = (pdf["term"] == last_term) & (pdf["bucket"] == last_bucket)
            carry = pdf[tail]
            head = pdf[~tail]
            if len(head):
                yield encode_groups(head)
        if carry is not None and len(carry):
            yield encode_groups(carry)

    return run


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    n_buckets: int = DEFAULT_N_BUCKETS,
    block_size: int = DEFAULT_BLOCK_SIZE,
    n_term_buckets: int = DEFAULT_TERM_BUCKETS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    commit_groups: int = 1,
    resume: bool = False,
    run_id: str = "full",
) -> dict:
    """Build the full index under ``out_dir``. Returns the stats dict.

    ``commit_groups`` splits the doc-id bucket space into sequential commit
    units: each unit's segment files are written *before* its manifest rows
    (the reference's offset-after-push ordering,
    MinuteTableShardScheduler.cs:44). ``resume=True`` skips buckets whose
    manifest rows already exist — re-running a killed build yields identical
    segments (tested in tests/test_resume.py).
    """
    # NO dropDuplicates here: a global dedup would shuffle the full text
    # twice. Duplicate urls are removed where they're already adjacent —
    # doclens via a (doc_id → min dl) agg, postings inside the sorted block
    # builder — so the only wide shuffle over text-derived data is the
    # (term, bucket) tokenize shuffle itself.
    docs = with_doc_id(docs, url_col).select("doc_id", F.col(text_col).alias("text"))

    seg_dir = os.path.join(out_dir, "segments")
    man_dir = os.path.join(out_dir, "manifest")
    done: set[int] = set()
    if resume and os.path.isdir(man_dir):
        done = {r.bucket for r in spark.read.parquet(man_dir).select("bucket").collect()}
    else:
        for sub in ("segments", "manifest", "dictionary", "doclens"):
            p = os.path.join(out_dir, sub)
            if os.path.isdir(p):
                import shutil

                shutil.rmtree(p)

    verbose = os.environ.get("CB_BUILD_VERBOSE")
    t_last = time.time()

    def _mark(phase: str) -> None:
        nonlocal t_last
        if verbose:
            print(f"[build_index] {phase}: {time.time() - t_last:.1f}s", flush=True)
        t_last = time.time()

    # ---- pass 1 is just N: a JVM-only distinct count over doc ids (no
    # tokenize pre-pass — avgdl falls out of the dictionary's cf totals
    # after the build, because block-max metadata is (max_tf, min_dl))
    n_docs = docs.select("doc_id").distinct().count()
    _mark("pass1 n_docs")

    # ---- pass 2: postings → blocks, committed bucket-group at a time
    all_buckets = [bkt for bkt in range(n_buckets) if bkt not in done]
    groups = [
        all_buckets[i :: commit_groups] for i in range(commit_groups)
    ] if commit_groups > 1 else [all_buckets]
    groups = [g for g in groups if g]

    builder = _make_block_builder(block_size)
    for group in groups:
        tokens = tokenize_to_postings(docs, "doc_id", "text").withColumn(
            "bucket", _bucket_col(n_buckets)
        )
        if len(group) < n_buckets:
            tokens = tokens.where(F.col("bucket").isin(group))
        blocks = (
            tokens.repartition("term", "bucket")
            .sortWithinPartitions("term", "bucket", "doc_id")
            .mapInPandas(builder, schema=BLOCKS_SCHEMA)
            .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int"))
        )
        # Second (small) shuffle of the already-compressed blocks so each
        # term-hash dir gets one file instead of one per upstream task —
        # shuffle volume = compressed index size, a fraction of the raw
        # tokenize shuffle; buys query-side partition pruning over few files.
        blocks = blocks.repartition(n_term_buckets, "tb").sortWithinPartitions(
            "term", "bucket", "blk"
        )  # term-sorted row groups → parquet min/max stats prune term lookups
        blocks.write.mode("append").partitionBy("tb").parquet(seg_dir)
        _mark("pass2 segments")
        # manifest AFTER segment write (commit ordering); checksum over block
        # METADATA only — no re-read of the binary posting columns
        seg = spark.read.parquet(seg_dir).where(F.col("bucket").isin(group))
        man = seg.groupBy("bucket").agg(
            F.countDistinct("term").alias("n_terms"),
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(
                F.crc32(F.concat_ws("|", "term", "blk", "n", "min_doc", "max_doc"))
            ).alias("checksum"),
        ).withColumn("committed_at", F.lit(time.time()).cast("timestamp")).withColumn(
            "run_id", F.lit(run_id)
        )
        man.write.mode("append").parquet(man_dir)

    refresh_dictionary(spark, out_dir, n_term_buckets)
    _mark("dictionary")

    # ---- corpus stats from the dictionary (total tokens = Σ cf) — exact,
    # no extra scan of the raw corpus
    total_tokens = int(
        spark.read.parquet(os.path.join(out_dir, "dictionary"))
        .agg(F.sum("cf"))
        .collect()[0][0]
        or 0
    )
    stats = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": total_tokens / n_docs if n_docs else 0.0,
        "k1": k1,
        "b": b,
        "n_buckets": n_buckets,
        "block_size": block_size,
        "n_term_buckets": n_term_buckets,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    _mark("stats")
    return stats


def write_doclens(spark: SparkSession, docs: DataFrame, out_dir: str,
                  url_col: str = "url", text_col: str = "text") -> None:
    """Optional (doc_id, dl) sidecar — not needed by the query path (dl is
    denormalized into the postings); useful for debugging/analytics."""
    d = with_doc_id(docs, url_col).select("doc_id", F.col(text_col).alias("text"))
    (
        d.mapInPandas(_doclens_kernel, schema="doc_id long, dl long")
        .groupBy("doc_id")
        .agg(F.min("dl").alias("dl"))
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "doclens"))
    )


def refresh_dictionary(spark: SparkSession, out_dir: str, n_term_buckets: int) -> None:
    """(Re)derive the term dictionary from segment block metadata —
    metadata-only columns, the binary posting columns are pruned away."""
    seg = spark.read.parquet(os.path.join(out_dir, "segments"))
    dictionary = seg.groupBy("term", "tb").agg(
        F.sum("n").alias("df"),
        F.sum("sum_tf").alias("cf"),
        F.count("*").alias("n_blocks"),
    )
    dictionary.repartition(n_term_buckets, "tb").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).partitionBy("tb").parquet(os.path.join(out_dir, "dictionary"))


def load_stats(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "stats.json")) as f:
        return json.load(f)


def compact_segments(
    spark: SparkSession,
    out_dir: str,
    *,
    block_size: int | None = None,
) -> dict:
    """Hierarchical merge: defragment delta segments into full-size blocks.

    After many incremental batches a (term, bucket) group accumulates many
    short tail blocks (one per batch). Compaction re-sorts each group's
    postings, drops duplicate doc_ids (keep-first, same rule as the
    builder), and re-encodes into dense ``block_size`` blocks — the
    LSM/Lucene segment-merge step. Because per-(term,bucket) runs are
    disjoint docID ranges, the merge never crosses buckets; the shuffle
    moves only compressed blocks.

    Atomic swap: new segments land in ``segments_compacting`` and replace
    ``segments`` only after a successful write (commit ordering), then the
    dictionary is refreshed and the manifest gains a ``compact_*`` row set.
    Returns {"blocks_before": .., "blocks_after": ..}.
    """
    import shutil

    stats = load_stats(out_dir)
    block_size = block_size or stats["block_size"]
    seg_dir = os.path.join(out_dir, "segments")
    tmp_dir = os.path.join(out_dir, "segments_compacting")
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)

    seg = spark.read.parquet(seg_dir)
    blocks_before = seg.count()

    def recode(batches):
        """Decode (term,bucket) groups and re-encode densely. Delta segments
        interleave same-(term,bucket) blocks with colliding blk numbers and
        a group may span Arrow batches, so: decode preserving group
        contiguity, hold back the boundary group, sort each run of COMPLETE
        groups by (term,bucket,doc_id,tf,dl) (the build's dedup sort key),
        and feed the block builder one continuous sorted stream."""
        from ..functions.codecs import varint_decode

        builder = _make_block_builder(block_size)

        def decode_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for term, bucket, n, docs_b, tfs_b, dls_b in zip(
                pdf["term"], pdf["bucket"], pdf["n"], pdf["docs"], pdf["tfs"], pdf["dls"]
            ):
                d = np.cumsum(varint_decode(docs_b, int(n))).astype(np.int64)
                outs.append(
                    pd.DataFrame(
                        {
                            "term": term,
                            "bucket": bucket,
                            "doc_id": d,
                            "tf": varint_decode(tfs_b, int(n)).astype(np.int64),
                            "dl": varint_decode(dls_b, int(n)).astype(np.int64),
                        }
                    )
                )
            return (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame(columns=["term", "bucket", "doc_id", "tf", "dl"])
            )

        def complete_group_chunks():
            carry: pd.DataFrame | None = None
            for pdf in batches:
                decoded = decode_rows(pdf)
                if carry is not None and len(carry):
                    decoded = pd.concat([carry, decoded], ignore_index=True)
                if not len(decoded):
                    continue
                lt = decoded["term"].iloc[-1]
                lb = decoded["bucket"].iloc[-1]
                tail = (decoded["term"] == lt) & (decoded["bucket"] == lb)
                carry = decoded[tail]
                head = decoded[~tail]
                if len(head):
                    yield head.sort_values(
                        ["term", "bucket", "doc_id", "tf", "dl"], kind="mergesort"
                    )
            if carry is not None and len(carry):
                yield carry.sort_values(
                    ["term", "bucket", "doc_id", "tf", "dl"], kind="mergesort"
                )

        yield from builder(complete_group_chunks())

    recompacted = (
        seg.repartition("term", "bucket")
        .sortWithinPartitions("term", "bucket", "blk")
        .mapInPandas(recode, schema=BLOCKS_SCHEMA)
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(stats["n_term_buckets"])).cast("int"))
        .repartition(stats["n_term_buckets"], "tb")
        .sortWithinPartitions("term", "bucket", "blk")
    )
    recompacted.write.mode("overwrite").partitionBy("tb").parquet(tmp_dir)

    old_dir = os.path.join(out_dir, "segments_old")
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)
    os.rename(seg_dir, old_dir)
    os.rename(tmp_dir, seg_dir)
    shutil.rmtree(old_dir)
    refresh_dictionary(spark, out_dir, stats["n_term_buckets"])

    seg2 = spark.read.parquet(seg_dir)
    blocks_after = seg2.count()
    man = seg2.groupBy("bucket").agg(
        F.countDistinct("term").alias("n_terms"),
        F.count("*").alias("n_blocks"),
        F.sum("n").alias("n_postings"),
        F.sum(F.crc32(F.concat_ws("|", "term", "blk", "n", "min_doc", "max_doc"))).alias(
            "checksum"
        ),
    ).withColumn("committed_at", F.lit(time.time()).cast("timestamp")).withColumn(
        "run_id", F.lit(f"compact_{int(time.time())}")
    )
    man.write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    return {"blocks_before": int(blocks_before), "blocks_after": int(blocks_after)}
