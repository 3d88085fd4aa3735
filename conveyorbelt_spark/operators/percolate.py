"""ES percolator: reverse search — register queries, stream documents,
get (document, query) matches.

The reference manages its ES indexes so clients can register alert/routing
queries against them (the percolate API of the Elasticsearch the reference
delegates search to, ElasticsearchClient.cs:31-135); in a training-data
pipeline this is the rule-router: millions of documents classified against
a curated rule set in one pass.

Spark-first design, the same two-phase plan ES's percolator runs per doc,
turned into two distributed stages over the whole corpus:

1. CANDIDATE ROUTING (one broadcast hash join, no shuffle of the corpus):
   every compiled query exposes a small ROUTING TERM SET — a set of
   analyzed tokens such that any matching doc must contain at least one.
   Exploded doc tokens ⋈ broadcast(term → query_id) yields candidate
   pairs; queries with no extractable terms (pure column filters) are
   always-candidates. This is ES's term-extraction pre-filter
   (`query_builder` term extraction), done corpus-at-a-time.
2. EXACT VERIFY (vectorized pandas over candidate batches): each
   candidate pair is checked against the full compiled boolean —
   AND-of-OR token groups, phrase adjacency, minimum_should_match group
   counting, must_not tokens, and column filters (term/terms/range on
   stored columns). Only candidates pay this cost.

Supported query subset (compile_query raises on the rest — no silent
misparse): match (operator or/and), match_phrase, term/terms (main text
field → token groups; other fields → column equality), range (column),
and one level of bool {must, should, must_not, filter,
minimum_should_match} over those.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textutils import TOKEN_RE, analyze

MAIN_FIELD_NAMES = ("", "text", "_text")


class UnsupportedPercolateQuery(ValueError):
    pass


def _one(d: dict) -> tuple[str, Any]:
    if not isinstance(d, dict) or len(d) != 1:
        raise UnsupportedPercolateQuery(
            f"expected a single-key clause, got {d!r}"
        )
    return next(iter(d.items()))


def _match_tokens(body, analyzer) -> tuple[list[str], str]:
    field, spec = _one(body)
    if field not in MAIN_FIELD_NAMES:
        raise UnsupportedPercolateQuery(
            f"percolate match supports the main text field, got {field!r}"
        )
    if isinstance(spec, dict):
        text, op = str(spec.get("query", "")), str(spec.get("operator", "or"))
    else:
        text, op = str(spec), "or"
    return analyze(text, analyzer), op.lower()


def compile_query(query_id, body: dict, analyzer: dict | None = None) -> dict:
    """One ES query body → the percolator's compiled form:

    - ``groups``: AND-of-OR analyzed token groups (every group must have
      ≥1 token in the doc)
    - ``phrases``: lists of consecutive analyzed tokens
    - ``should``: OR token groups counted against ``msm``
    - ``not_terms``: tokens no match may contain
    - ``col_filters``: [(col, kind, payload)] over non-text columns
    - ``routing``: the candidate-extraction token set (None = always
      candidate)
    """
    c: dict[str, Any] = {
        "qid": query_id, "groups": [], "phrases": [], "should": [],
        "msm": 0, "not_terms": [], "col_filters": [],
    }
    _compile_into(body, c, analyzer)
    if not (c["groups"] or c["phrases"] or c["should"] or c["col_filters"]):
        raise UnsupportedPercolateQuery(
            f"query {query_id!r} has no positive clause (a must_not-only "
            "percolator matches almost everything — make it explicit with "
            "match_all semantics upstream)"
        )
    # ES: should with no must/filter context requires ≥1 matched group
    if c["should"] and c["msm"] == 0 and not (
        c["groups"] or c["phrases"] or c["col_filters"]
    ):
        c["msm"] = 1
    c["routing"] = _routing_terms(c)
    return c


def _compile_into(body: dict, c: dict, analyzer, *, negate: bool = False) -> None:
    kind, spec = _one(body)
    if kind == "match":
        toks, op = _match_tokens(spec, analyzer)
        if not toks:
            raise UnsupportedPercolateQuery("match text analyzed to nothing")
        if negate:
            c["not_terms"].extend(toks)  # ES must_not match: any term bans
        elif op == "and":
            c["groups"].extend([[t] for t in toks])
        else:
            c["groups"].append(sorted(set(toks)))
    elif kind == "match_phrase":
        field, spec2 = _one(spec)
        if field not in MAIN_FIELD_NAMES:
            raise UnsupportedPercolateQuery(
                "percolate match_phrase supports the main text field"
            )
        text = spec2["query"] if isinstance(spec2, dict) else str(spec2)
        toks = analyze(text, analyzer)
        if not toks:
            raise UnsupportedPercolateQuery("phrase analyzed to nothing")
        if negate:
            raise UnsupportedPercolateQuery(
                "must_not match_phrase is unsupported"
            )
        c["phrases"].append(toks)
    elif kind in ("term", "terms"):
        field, val = _one(spec)
        if kind == "term" and isinstance(val, dict):
            val = val["value"]
        vals = list(val) if kind == "terms" else [val]
        if field in MAIN_FIELD_NAMES:
            toks = [str(v).lower() for v in vals]
            if negate:
                c["not_terms"].extend(toks)
            else:
                c["groups"].append(sorted(set(toks)))
        elif negate:
            c["col_filters"].append((field, "not_in", vals))
        else:
            c["col_filters"].append((field, "in", vals))
    elif kind == "range":
        field, spec2 = _one(spec)
        if field in MAIN_FIELD_NAMES:
            raise UnsupportedPercolateQuery(
                "percolate range applies to stored columns, not the text"
            )
        bounds = {k: spec2[k] for k in ("gte", "gt", "lte", "lt") if k in spec2}
        if not bounds:
            raise UnsupportedPercolateQuery("range needs gte/gt/lte/lt")
        if negate:
            raise UnsupportedPercolateQuery("must_not range is unsupported")
        c["col_filters"].append((field, "range", bounds))
    elif kind == "bool":
        if negate:
            raise UnsupportedPercolateQuery("must_not bool is unsupported")
        for clause in list(spec.get("must") or []) + list(spec.get("filter") or []):
            _compile_into(clause, c, analyzer)
        for clause in spec.get("must_not") or []:
            _compile_into(clause, c, analyzer, negate=True)
        shoulds = spec.get("should") or []
        if shoulds:
            if c["should"]:
                raise UnsupportedPercolateQuery(
                    "one should group per percolator query"
                )
            for clause in shoulds:
                skind, sspec = _one(clause)
                if skind == "match":
                    toks, _op = _match_tokens(sspec, analyzer)
                    c["should"].append(sorted(set(toks)))
                elif skind == "term":
                    f, v = _one(sspec)
                    if isinstance(v, dict):
                        v = v["value"]
                    if f not in MAIN_FIELD_NAMES:
                        raise UnsupportedPercolateQuery(
                            "percolate should supports text clauses"
                        )
                    c["should"].append([str(v).lower()])
                else:
                    raise UnsupportedPercolateQuery(
                        f"percolate should supports match/term, got {skind!r}"
                    )
            c["msm"] = int(spec.get("minimum_should_match", 0))
    else:
        raise UnsupportedPercolateQuery(
            f"unsupported percolate clause {kind!r}"
        )


def _routing_terms(c: dict) -> list[str] | None:
    """The candidate-extraction token set: any matching doc must contain
    ≥1 of these. Pick the cheapest sufficient set — the smallest required
    OR-group (every match satisfies each group), else a phrase's tokens,
    else the union of should groups when ≥1 must match."""
    if c["groups"]:
        return min(c["groups"], key=len)
    if c["phrases"]:
        return sorted(set(c["phrases"][0]))
    if c["should"] and c["msm"] >= 1:
        return sorted({t for g in c["should"] for t in g})
    return None  # column-filter-only: every doc is a candidate


def _contains_phrase(toks: list[str], phrase: list[str]) -> bool:
    n, m = len(toks), len(phrase)
    first = phrase[0]
    for i in range(n - m + 1):
        if toks[i] == first and toks[i:i + m] == phrase:
            return True
    return False


def _verify_batch(pdf: pd.DataFrame, by_qid: dict, analyzer, text_col: str,
                  id_col: str) -> pd.DataFrame:
    """Exact boolean evaluation of candidate (doc, query) pairs: one
    vectorized pass per query over its candidate sub-frame."""
    toks = pdf[text_col].str.lower().str.findall(TOKEN_RE)
    if analyzer:
        toks = toks.apply(lambda ts: analyze(ts, analyzer))
    tsets = toks.apply(frozenset)
    out_ids: list = []
    out_qids: list = []
    for qid, grp_idx in pdf.groupby("query_id", sort=False).groups.items():
        c = by_qid[qid]
        sub = pdf.loc[grp_idx]
        ss = tsets.loc[grp_idx]
        mask = pd.Series(True, index=grp_idx)
        for grp in c["groups"]:
            g = set(grp)
            mask &= ss.apply(lambda s: not g.isdisjoint(s))
        for ph in c["phrases"]:
            tl = toks.loc[grp_idx]
            mask &= tl.apply(lambda t: _contains_phrase(list(t), ph))
        if c["not_terms"]:
            bad = set(c["not_terms"])
            mask &= ss.apply(lambda s: bad.isdisjoint(s))
        if c["should"] and c["msm"] >= 1:
            sets = [set(g) for g in c["should"]]
            mask &= ss.apply(
                lambda s: sum(not g.isdisjoint(s) for g in sets) >= c["msm"]
            )
        for col, kind, payload in c["col_filters"]:
            vals = sub[col] if col in sub.columns else pd.Series(
                index=grp_idx, dtype=object
            )
            if kind == "in":
                mask &= vals.isin(payload).fillna(False)
            elif kind == "not_in":
                mask &= (~vals.isin(payload)).fillna(False)
            else:  # range
                for op, bound in payload.items():
                    cmpv = {
                        "gte": vals >= bound, "gt": vals > bound,
                        "lte": vals <= bound, "lt": vals < bound,
                    }[op]
                    mask &= cmpv.fillna(False)
        hit = sub.loc[mask[mask].index, id_col]
        out_ids.extend(hit.tolist())
        out_qids.extend([qid] * len(hit))
    return pd.DataFrame({id_col: out_ids, "query_id": out_qids})


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[Any, dict]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: dict | None = None,
) -> DataFrame:
    """Match every document against every registered query; returns
    (id_col, query_id) pairs. ``queries`` = [(query_id, ES body)].

    Plan shape (100 TB-ready): the corpus is scanned once; routing is an
    exploded-token ⋈ broadcast(term → query) hash join (no corpus
    shuffle), always-candidate queries fan out via a broadcast cross
    join, and the exact verify joins candidates back to the corpus on
    the id (one shuffle of the CANDIDATE set, not of all (doc, query)
    pairs) before a vectorized pandas evaluation per batch."""
    compiled = [compile_query(qid, body, analyzer) for qid, body in queries]
    by_qid = {c["qid"]: c for c in compiled}
    if len(by_qid) != len(compiled):
        raise ValueError("duplicate query_id in the registered set")

    routing_rows = [
        (t, c["qid"]) for c in compiled if c["routing"] is not None
        for t in c["routing"]
    ]
    always = [c["qid"] for c in compiled if c["routing"] is None]
    qid_type = "string" if all(
        isinstance(c["qid"], str) for c in compiled
    ) else "long"

    if analyzer:
        # compiled routing terms are ANALYZED (stemmed/filtered) — the
        # explode must apply the same chain or stemmed routing terms never
        # equal raw doc tokens and candidates are silently missed
        import numpy as np

        def _tok(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                tl = (
                    pdf[text_col].str.lower().str.findall(TOKEN_RE)
                    .apply(lambda ts: analyze(ts, analyzer))
                )
                yield pd.DataFrame({
                    id_col: np.repeat(
                        pdf[id_col].to_numpy(), tl.str.len().to_numpy()
                    ),
                    "term": [t for ts in tl for t in ts],
                })

        tokens = docs.select(id_col, text_col).mapInPandas(
            _tok, schema=f"{id_col} long, term string"
        )
    else:
        tokens = docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("term"),
        ).where(F.col("term") != "")
    cand_parts = []
    if routing_rows:
        routing_df = spark.createDataFrame(
            routing_rows, f"term string, query_id {qid_type}"
        )
        cand_parts.append(
            tokens.join(F.broadcast(routing_df), "term")
            .select(id_col, "query_id").distinct()
        )
    if always:
        adf = spark.createDataFrame(
            [(q,) for q in always], f"query_id {qid_type}"
        )
        cand_parts.append(docs.select(id_col).crossJoin(F.broadcast(adf)))
    if not cand_parts:
        return spark.createDataFrame([], f"{id_col} long, query_id {qid_type}")
    cands = cand_parts[0]
    for p in cand_parts[1:]:
        cands = cands.unionByName(p)

    joined = cands.join(docs, id_col)
    schema = f"{id_col} long, query_id {qid_type}"

    def _verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield _verify_batch(pdf, by_qid, analyzer, text_col, id_col)

    return joined.mapInPandas(_verify, schema=schema)


def percolate_doc(
    document: dict,
    queries: list[tuple[Any, dict]],
    *,
    text_col: str = "text",
    analyzer: dict | None = None,
) -> list:
    """Serving twin — the ES percolate-query shape ({"percolate":
    {"document": {...}}}): one document dict in, the matching query_ids
    out (same compiled predicates, zero Spark jobs)."""
    pdf = pd.DataFrame([{**document, "_pid": 0}])
    out = []
    for qid, body in queries:
        c = compile_query(qid, body, analyzer)
        cand = pdf.assign(query_id=[qid])
        res = _verify_batch(cand, {qid: c}, analyzer, text_col, "_pid")
        if len(res):
            out.append(qid)
    return out
