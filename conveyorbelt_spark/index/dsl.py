"""Elasticsearch-request-shaped query DSL over the engine.

The reference's users talk to Elasticsearch with JSON request bodies
(Kibana panels, NEST queries — e.g. the ES queries the dashboards in
aliostad/ConveyorBelt's README issue against the pushed indexes). This
module accepts that shape directly, so those queries run against this
engine verbatim within the SUPPORTED SUBSET — the query types every other
part of this repo already implements:

query context:
  match            {"match": {"text": "spark join"}}          → scored SHOULD
  match_phrase     {"match_phrase": {"text": "exact phrase"}} → positional index
  multi_match      {"multi_match": {"query": q, "fields": ["title^2","text"],
                    "type": "best_fields"|"most_fields"}}
  prefix/wildcard/fuzzy  {"prefix": {"text": "te"}} …          → expansion bag
  more_like_this   {"more_like_this": {"like": <doc_id|text>, ...knobs}}
  match_all        {"match_all": {}} (only with filters/sort — something
                   must bound the result)
  bool             {"bool": {"must": [...], "should": [...],
                    "must_not": [...], "filter": [...],
                    "minimum_should_match": n}}

filter context (inside bool.filter, or top-level "filter"):
  term   {"term":  {"lang": "en"}}        — keyword-field posting filter
  terms  {"terms": {"status": ["200", "304"]}}
  range  {"range": {"nc": {"gte": "0100", "lte": "0300"}}} (inclusive
         string-order bounds over indexed keyword values)

request level: "size", "from", "sort" ([{"field": "desc"}] or ["field"]),
"search_after", "aggs" (the search_aggs shape), "highlight"
{"fields": {col: {}}}, "_source" (bool), "track_total_hits" (bool —
True runs the uncapped distributed count).

Response is ES-shaped: {"hits": {"total": {"value": N, "relation":
"eq"|"gte"}, "hits": [{"_id", "_score", "_source"?, "highlight"?}]},
"aggregations": {name: rows}}.

Simplifications vs real ES (documented, deliberate):
- match inside bool.must means REQUIRED terms (they score, like ES must);
  multiple must clauses concatenate their terms.
- term/terms/range queries are filter-context only (constant-score query
  context is not emulated).
- one scoring clause kind per request (match XOR phrase XOR multi_match…);
  compose via bool for the must/should/not/filter algebra.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

from .query import Searcher, search_aggs, search_sorted


class UnsupportedDSL(ValueError):
    """The request uses a shape outside the supported subset."""


def _one(d: dict) -> tuple[str, Any]:
    if not isinstance(d, dict) or len(d) != 1:
        raise UnsupportedDSL(f"expected a single-key clause, got {d!r}")
    return next(iter(d.items()))


def _match_text(clause: dict) -> str:
    field, spec = _one(clause)
    text = spec["query"] if isinstance(spec, dict) else spec
    if field not in ("text", "_text", ""):
        # a match on a non-main field is a single-field multi_match
        raise _NonMainMatch(field, str(text))
    return str(text)


class _NonMainMatch(Exception):
    def __init__(self, field: str, text: str):
        self.field, self.text = field, text


def _filter_clause(clause: dict, filters: dict, ranges: dict) -> None:
    kind, body = _one(clause)
    if kind == "term":
        field, val = _one(body)
        val = val["value"] if isinstance(val, dict) else val
        filters[field] = str(val)
    elif kind == "terms":
        field, vals = _one(body)
        filters[field] = [str(v) for v in vals]
    elif kind == "range":
        field, spec = _one(body)
        lo = spec.get("gte", spec.get("gt"))
        hi = spec.get("lte", spec.get("lt"))
        if lo is None or hi is None or "gt" in spec or "lt" in spec:
            raise UnsupportedDSL(
                "range filters need inclusive gte+lte bounds (exclusive "
                "gt/lt over string-ordered keyword terms are not emulated)"
            )
        ranges[field] = (str(lo), str(hi))
    else:
        raise UnsupportedDSL(f"unsupported filter clause {kind!r}")


def parse_query(query: dict) -> dict:
    """The query-context half of a request body → engine arguments."""
    plan: dict[str, Any] = {
        "query": "", "must": None, "must_not": None, "min_should": 0,
        "filters": {}, "ranges": {}, "phrase": None, "mm": None,
        "expand": None, "mlt": None, "match_all": False,
    }
    if query is None:
        plan["match_all"] = True
        return plan
    kind, body = _one(query)
    if kind == "match":
        try:
            plan["query"] = _match_text(body)
        except _NonMainMatch as nm:
            # ES semantics: match on a non-main field ≡ single-field
            # multi_match over that field
            plan["mm"] = {"query": nm.text, "fields": [nm.field], "type": "best_fields"}
    elif kind == "match_all":
        plan["match_all"] = True
    elif kind == "match_phrase":
        _field, spec = _one(body)
        plan["phrase"] = spec["query"] if isinstance(spec, dict) else str(spec)
    elif kind == "multi_match":
        plan["mm"] = {
            "query": body["query"],
            "fields": list(body["fields"]),
            "type": body.get("type", "best_fields"),
        }
    elif kind in ("prefix", "wildcard", "fuzzy", "regexp"):
        field, spec = _one(body)
        val = spec["value"] if isinstance(spec, dict) else spec
        plan["expand"] = (kind, str(val), spec if isinstance(spec, dict) else {})
    elif kind == "more_like_this":
        plan["mlt"] = dict(body)
    elif kind == "bool":
        shoulds, musts, must_nots = [], [], []
        for clause in body.get("filter", []) or []:
            _filter_clause(clause, plan["filters"], plan["ranges"])
        should_clauses = body.get("should", []) or []
        for clause in should_clauses:
            k2, b2 = _one(clause)
            if k2 != "match":
                raise UnsupportedDSL(f"bool.should supports match, got {k2!r}")
            try:
                shoulds.append(_match_text(b2))
            except _NonMainMatch as nm:
                # a lone non-main should ≡ single-field multi_match; mixed
                # with other clauses the field-vs-main score algebra is out
                # of subset — reject cleanly instead of mis-scoring
                if (
                    len(should_clauses) == 1
                    and not (body.get("must") or body.get("must_not"))
                    and not plan["filters"] and not plan["ranges"]
                ):
                    plan["mm"] = {
                        "query": nm.text, "fields": [nm.field],
                        "type": "best_fields",
                    }
                    return plan
                raise UnsupportedDSL(
                    f"match on non-main field {nm.field!r} inside a bool "
                    "with other clauses is unsupported (use multi_match)"
                ) from None
        for clause in body.get("must", []) or []:
            k2, b2 = _one(clause)
            if k2 == "match":
                try:
                    musts.append(_match_text(b2))
                except _NonMainMatch as nm:
                    raise UnsupportedDSL(
                        f"match on non-main field {nm.field!r} inside "
                        "bool.must is unsupported (required semantics over "
                        "a side field are not emulated; use multi_match)"
                    ) from None
            elif k2 in ("term", "terms", "range"):
                # ES scores term-queries in must; here they filter (const-
                # score emulation is out of subset — documented)
                _filter_clause(clause, plan["filters"], plan["ranges"])
            else:
                raise UnsupportedDSL(f"bool.must supports match/term/terms/range, got {k2!r}")
        for clause in body.get("must_not", []) or []:
            k2, b2 = _one(clause)
            if k2 != "match":
                raise UnsupportedDSL(f"bool.must_not supports match, got {k2!r}")
            try:
                must_nots.append(_match_text(b2))
            except _NonMainMatch as nm:
                raise UnsupportedDSL(
                    f"match on non-main field {nm.field!r} inside "
                    "bool.must_not is unsupported"
                ) from None
        plan["query"] = " ".join(shoulds)
        plan["must"] = " ".join(musts) or None
        plan["must_not"] = " ".join(must_nots) or None
        plan["min_should"] = int(body.get("minimum_should_match", 0) or 0)
        if not plan["query"] and not plan["must"]:
            plan["match_all"] = True
    else:
        raise UnsupportedDSL(f"unsupported query clause {kind!r}")
    return plan


def search_body(spark: SparkSession, out_dir: str, body: dict) -> dict:
    """Execute an ES-shaped request body; returns an ES-shaped response."""
    body = dict(body or {})
    plan = parse_query(body.get("query"))
    size = int(body.get("size", 10))
    from_ = int(body.get("from", 0))
    filters = plan["filters"] or None
    ranges = plan["ranges"] or None
    s = Searcher(spark, out_dir)

    sort_spec = body.get("sort")
    rows: list[tuple[int, float]]
    sorted_rows_cols: list[tuple] | None = None
    if sort_spec:
        keys = []
        for item in sort_spec:
            if isinstance(item, str):
                keys.append((item, "asc"))
            else:
                f, d = _one(item)
                keys.append((f, d.get("order", "asc") if isinstance(d, dict) else str(d)))
        if (
            plan["match_all"] and not plan["query"] and not plan["must"]
            and not filters and not ranges
        ):
            raise UnsupportedDSL(
                "sorted match_all needs at least a filter or match clause "
                "(an unbounded full-corpus export is a scan, not a search)"
            )
        sorted_rows_cols = [
            tuple(r)
            for r in search_sorted(
                spark, out_dir, plan["query"] or plan["must"] or "", keys,
                size, must=plan["must"], must_not=plan["must_not"],
                min_should=plan["min_should"], filters=filters, ranges=ranges,
                search_after=tuple(body["search_after"]) if body.get("search_after") else None,
            ).collect()
        ]
        rows = [(r[0], float("nan")) for r in sorted_rows_cols]
    elif plan["phrase"] is not None:
        rows = s.phrase_rows(plan["phrase"], size + from_)[from_:]
    elif plan["mm"] is not None:
        rows = s.multi_match_rows(
            plan["mm"]["query"], plan["mm"]["fields"], size + from_,
            type=plan["mm"]["type"],
        )[from_:]
    elif plan["expand"] is not None:
        kind, val, spec = plan["expand"]
        if kind == "prefix":
            rows = s.prefix_rows(val, size + from_)[from_:]
        elif kind == "wildcard":
            rows = s.wildcard_rows(val, size + from_)[from_:]
        elif kind == "regexp":
            rows = s.regexp_rows(val, size + from_)[from_:]
        else:
            rows = s.fuzzy_rows(
                val, size + from_, fuzziness=int(spec.get("fuzziness", 1)),
            )[from_:]
    elif plan["mlt"] is not None:
        knobs = {
            k: plan["mlt"][k]
            for k in ("max_query_terms", "min_doc_freq", "min_term_freq")
            if k in plan["mlt"]
        }
        rows = s.more_like_this(plan["mlt"]["like"], size + from_, **knobs)[from_:]
    elif plan["match_all"]:
        if not filters and not ranges:
            raise UnsupportedDSL(
                "match_all without sort or filters is unbounded; add a "
                "filter, a sort (export), or a scoring clause"
            )
        # filter-only query (the Kibana "all docs where …" shape): ES
        # scores these 1.0; order by doc_id for determinism
        from .query import bool_doc_ids

        ids = (
            bool_doc_ids(spark, out_dir, "", filters=filters, ranges=ranges)
            .orderBy("doc_id").limit(size + from_).collect()
        )
        rows = [(r.doc_id, 1.0) for r in ids][from_:]
    else:
        rows = s.search_rows(
            plan["query"], size, must=plan["must"], must_not=plan["must_not"],
            min_should=plan["min_should"], offset=from_,
            filters=filters, ranges=ranges,
        )

    hits = []
    want_source = body.get("_source", False)
    meta = {}
    if want_source or body.get("highlight"):
        from .build import lookup_docs

        meta = lookup_docs(out_dir, [d for d, _ in rows])
    hl_cols = list((body.get("highlight") or {}).get("fields") or {})
    for i, (d, sc) in enumerate(rows):
        hit: dict[str, Any] = {"_id": int(d), "_score": None if sort_spec else float(sc)}
        if sort_spec:
            hit["sort"] = list(sorted_rows_cols[i][1:]) + [int(d)]
        if want_source and d in meta:
            src = {k: v for k, v in meta[d].items() if k not in ("bucket", "run")}
            hit["_source"] = src
        if hl_cols and d in meta and plan["query"]:
            frags = {}
            for col in hl_cols:
                text = meta[d].get(col)
                if text:
                    frags[col] = _highlight_fragment(text, plan["query"])
            hit["highlight"] = {k: [v] for k, v in frags.items() if v}
        hits.append(hit)

    total = {"value": len(hits) + from_, "relation": "gte"}
    if body.get("track_total_hits"):
        total = {"value": _exact_total(spark, out_dir, s, plan, filters, ranges), "relation": "eq"}

    resp: dict[str, Any] = {"hits": {"total": total, "hits": hits}}
    if body.get("aggs"):
        kinds = {next(iter(spec)) for spec in body["aggs"].values()}
        if kinds <= {"terms", "date_histogram", "histogram", "stats"}:
            # serving fast path: row-for-row identical to the distributed
            # plan for these kinds (escalates itself past max_hits);
            # cardinality/percentiles keep ES's approximate semantics on
            # the distributed path below
            resp["aggregations"] = s.aggs_rows(
                body["aggs"], plan["query"], must=plan["must"],
                must_not=plan["must_not"], min_should=plan["min_should"],
                filters=filters, ranges=ranges,
            )
        else:
            aggs = search_aggs(
                spark, out_dir, body["aggs"], plan["query"],
                must=plan["must"], must_not=plan["must_not"],
                min_should=plan["min_should"], filters=filters, ranges=ranges,
            )
            resp["aggregations"] = {
                name: [r.asDict() for r in df.collect()] for name, df in aggs.items()
            }
    return resp


def search_body_daily(
    spark: SparkSession, root: str, body: dict, *, time_range: tuple | None = None
) -> dict:
    """Execute an ES-shaped request body against a DAILY index root with a
    time window — the Kibana shape (an index pattern like
    ``logs-2016.09.*`` selects day indexes; here ``time_range`` does,
    pruning to the overlapping day dirs before any file opens). Supported
    subset: match / bool (+ filter context), match_phrase, match_all +
    filters, sort + search_after, aggs, track_total_hits — each dispatched
    to the DailySearcher one-plan window path. multi_match / expansion
    (prefix/wildcard/regexp/fuzzy) / more_like_this are supported over
    windows too — their per-field stats, dictionary expansions, and MLT
    interestingness merge across the selected days (window-exact, see
    ``DailySearcher.multi_match_rows`` / ``expand_terms`` /
    ``mlt_terms``)."""
    from .daily import DailySearcher
    from .query import phrase_doc_ids

    body = dict(body or {})
    plan = parse_query(body.get("query"))
    size = int(body.get("size", 10))
    from_ = int(body.get("from", 0))
    filters = plan["filters"] or None
    ranges = plan["ranges"] or None
    ds = DailySearcher(spark, root)

    sort_spec = body.get("sort")
    rows: list[tuple[int, float]]
    sorted_rows_cols: list[tuple] | None = None
    if sort_spec:
        keys = []
        for item in sort_spec:
            if isinstance(item, str):
                keys.append((item, "asc"))
            else:
                f, d = _one(item)
                keys.append((f, d.get("order", "asc") if isinstance(d, dict) else str(d)))
        if (
            plan["match_all"] and not plan["query"] and not plan["must"]
            and not filters and not ranges
        ):
            raise UnsupportedDSL(
                "sorted match_all needs at least a filter or match clause"
            )
        sorted_rows_cols = [
            tuple(r)
            for r in ds.search_sorted(
                plan["query"] or plan["must"] or "", keys, size,
                time_range=time_range, must=plan["must"],
                must_not=plan["must_not"], min_should=plan["min_should"],
                filters=filters, ranges=ranges,
                search_after=tuple(body["search_after"]) if body.get("search_after") else None,
            ).collect()
        ]
        rows = [(r[0], float("nan")) for r in sorted_rows_cols]
    elif plan["phrase"] is not None:
        rows = ds.phrase_rows(plan["phrase"], size + from_, time_range=time_range)[from_:]
    elif plan["mm"] is not None:
        rows = ds.multi_match_rows(
            plan["mm"]["query"], plan["mm"]["fields"], size + from_,
            type=plan["mm"]["type"], time_range=time_range,
        )[from_:]
    elif plan["expand"] is not None:
        kind, val, spec = plan["expand"]
        rows = ds.expansion_rows(
            kind, val, size + from_,
            fuzziness=int(spec.get("fuzziness", 1)) if isinstance(spec, dict) else 1,
            time_range=time_range,
        )[from_:]
    elif plan["mlt"] is not None:
        knobs = {
            kk: plan["mlt"][kk]
            for kk in ("max_query_terms", "min_doc_freq", "min_term_freq")
            if kk in plan["mlt"]
        }
        rows = ds.more_like_this(
            plan["mlt"]["like"], size + from_, time_range=time_range, **knobs
        )[from_:]
    elif plan["match_all"]:
        if not filters and not ranges:
            raise UnsupportedDSL(
                "match_all without sort or filters is unbounded; add a "
                "filter, a sort (export), or a scoring clause"
            )
        from pyspark.sql import functions as F  # noqa: N812

        ids = (
            ds.bool_doc_ids(
                "", filters=filters, ranges=ranges, time_range=time_range
            )
            .orderBy(F.asc("doc_id")).limit(size + from_).collect()
        )
        rows = [(r.doc_id, 1.0) for r in ids][from_:]
    else:
        rows = ds.search_rows(
            plan["query"], size + from_, must=plan["must"],
            must_not=plan["must_not"], min_should=plan["min_should"],
            filters=filters, ranges=ranges, time_range=time_range,
        )[from_:]

    hits = [
        {"_id": int(d), "_score": None if sort_spec else float(sc)}
        for d, sc in rows
    ]
    if sort_spec:
        for i, h in enumerate(hits):
            h["sort"] = list(sorted_rows_cols[i][1:]) + [h["_id"]]

    total = {"value": len(hits) + from_, "relation": "gte"}
    if body.get("track_total_hits"):
        from functools import reduce

        from pyspark.sql import DataFrame as _DF

        from .daily import day_dir, select_days
        from .query import _multi_match_plan, posting_docs_terms

        days = select_days(root, time_range)

        def _union_count(per_day):
            # day corpora are doc-disjoint: the union of per-day matching
            # sets is exact, counted in one action
            dfs = [per_day(day_dir(root, d)) for d in days]
            return reduce(_DF.unionByName, dfs).count() if dfs else 0

        if plan["phrase"] is not None:
            n = _union_count(lambda dd: phrase_doc_ids(spark, dd, plan["phrase"]))
        elif plan["mm"] is not None:
            from .daily import _merged_lookup, _merged_stats

            stats = _merged_stats(root, days) if days else None
            mm_plan = _multi_match_plan(
                spark, root, stats, plan["mm"]["query"], plan["mm"]["fields"],
                lookup=_merged_lookup(spark, root, days, stats["n_term_buckets"]),
                field_avg=lambda _f: 1.0,  # totals need terms only, not norms
            ) if days else None
            n = 0 if mm_plan is None else _union_count(
                lambda dd: posting_docs_terms(spark, dd, mm_plan[2])
            )
        elif plan["expand"] is not None:
            kind, val, spec = plan["expand"]
            terms = ds.expand_terms(
                kind, val,
                fuzziness=int(spec.get("fuzziness", 1)) if isinstance(spec, dict) else 1,
                time_range=time_range,
            )
            n = 0 if not terms else _union_count(
                lambda dd: posting_docs_terms(spark, dd, terms)
            )
        elif plan["mlt"] is not None:
            # the selected interestingness bag (same terms the scoring path
            # ran), counted as a SHOULD union minus the liked doc
            knobs = {
                kk: plan["mlt"][kk]
                for kk in ("max_query_terms", "min_doc_freq", "min_term_freq")
                if kk in plan["mlt"]
            }
            sel, self_id = ds.mlt_terms(plan["mlt"]["like"], time_range=time_range, **knobs)
            if not sel:
                n = 0
            else:
                from pyspark.sql import functions as _FF  # noqa: N812

                ids = reduce(
                    _DF.unionByName,
                    [posting_docs_terms(spark, day_dir(root, d), sel) for d in days],
                )
                if self_id is not None:
                    ids = ids.where(_FF.col("doc_id") != self_id)
                n = ids.count()
        else:
            n = ds.bool_doc_ids(
                plan["query"], must=plan["must"], must_not=plan["must_not"],
                min_should=plan["min_should"], filters=filters, ranges=ranges,
                time_range=time_range,
            ).count()
        total = {"value": n, "relation": "eq"}

    resp: dict[str, Any] = {"hits": {"total": total, "hits": hits}}
    if body.get("aggs"):
        aggs = ds.search_aggs(
            body["aggs"], plan["query"], time_range=time_range,
            must=plan["must"], must_not=plan["must_not"],
            min_should=plan["min_should"], filters=filters, ranges=ranges,
        )
        resp["aggregations"] = {
            name: [r.asDict() for r in df.collect()] for name, df in aggs.items()
        }
    return resp


def _exact_total(spark, out_dir: str, s: Searcher, plan: dict, filters, ranges) -> int:
    """Exact ``track_total_hits`` for EVERY supported query shape,
    distributed and uncapped:

    - match/bool/filter → ``bool_doc_ids`` (one pruned scan + hash agg)
    - match_phrase      → ``phrase_doc_ids`` (positional kernel, top-k off)
    - multi_match       → ``posting_docs_terms`` over the field-qualified
                          expansion (a doc matches iff any field matches)
    - prefix/wildcard/regexp/fuzzy → same expansion bag the scoring path
                          uses, counted as a SHOULD union
    - more_like_this    → the selected interestingness terms' union, minus
                          the liked doc itself
    """
    from .query import (
        _multi_match_plan,
        bool_doc_ids,
        expand_fuzzy,
        expand_prefix,
        expand_regexp,
        expand_wildcard,
        phrase_doc_ids,
        posting_docs_terms,
    )

    if plan["phrase"] is not None:
        return phrase_doc_ids(spark, out_dir, plan["phrase"]).count()
    if plan["mm"] is not None:
        mm_plan = _multi_match_plan(
            spark, out_dir, s.stats, plan["mm"]["query"], plan["mm"]["fields"]
        )
        if mm_plan is None:
            return 0
        _per_field, _tbs, scan_terms = mm_plan
        return posting_docs_terms(spark, out_dir, scan_terms).count()
    if plan["expand"] is not None:
        kind, val, spec = plan["expand"]
        if kind == "prefix":
            terms = expand_prefix(out_dir, val)
        elif kind == "wildcard":
            terms = expand_wildcard(out_dir, val)
        elif kind == "regexp":
            terms = expand_regexp(out_dir, val)
        else:
            terms = expand_fuzzy(out_dir, val, int(spec.get("fuzziness", 1)))
        if not terms:
            return 0
        return posting_docs_terms(spark, out_dir, terms).count()
    if plan["mlt"] is not None:
        knobs = {
            k: plan["mlt"][k]
            for k in ("max_query_terms", "min_doc_freq", "min_term_freq")
            if k in plan["mlt"]
        }
        sel, self_id = s.mlt_terms(plan["mlt"]["like"], **knobs)
        if not sel:
            return 0
        ids = posting_docs_terms(spark, out_dir, sel)
        if self_id is not None:
            from pyspark.sql import functions as F  # noqa: N812

            ids = ids.where(F.col("doc_id") != self_id)
        return ids.count()
    return bool_doc_ids(
        spark, out_dir, plan["query"], must=plan["must"],
        must_not=plan["must_not"], min_should=plan["min_should"],
        filters=filters, ranges=ranges,
    ).count()


def _highlight_fragment(text: str, query: str, width: int = 160) -> str | None:
    """Plain-highlighter fragment: first query-term occurrence centered,
    every query-term occurrence tagged (token-boundary, case-insensitive)."""
    import re

    from ..textutils import tokenize

    terms = sorted(set(tokenize(query)))
    if not terms:
        return None
    rx = re.compile(
        r"(?<![a-z0-9])(" + "|".join(re.escape(t) for t in terms) + r")(?![a-z0-9])",
        re.IGNORECASE,
    )
    m = rx.search(text)
    if not m:
        return None
    lo = max(0, m.start() - width // 2)
    hi = min(len(text), lo + width)
    frag = text[lo:hi]
    return rx.sub(lambda mm: f"<em>{mm.group(0)}</em>", frag)
