"""Pure-Python BM25 oracle — no Spark, no numpy in the scoring loop.

Ground truth for rank-identity tests (BASELINE.json north_rule: top-k docIDs
and scores rank-identical). Formulas and accumulation order are pinned to
match the engine bit-for-bit:

- idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
- w     = tf*(k1+1) / (tf + k1*(1 - b + b*(dl/avgdl)))
- score = Σ over query terms in ASCENDING TERM ORDER of idf*w, float64,
  starting from 0.0 — the same pairwise addition sequence the engine's
  kernel performs.
- rank  = (score desc, doc_id asc)
"""

from __future__ import annotations

import math

from ..textutils import BM25_B, BM25_K1, tokenize


class BM25Oracle:
    def __init__(self, docs: list[tuple[int, str]], k1: float = BM25_K1, b: float = BM25_B):
        """docs: list of (doc_id, text) with doc_id already assigned
        (xxhash64(url) >>> 1 — collected from the Spark side so identity
        matches)."""
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.dl: dict[int, int] = {}
        seen = set()
        for doc_id, text in docs:
            if doc_id in seen:
                continue
            seen.add(doc_id)
            toks = tokenize(text)
            self.dl[doc_id] = len(toks)
            counts: dict[str, int] = {}
            for p, t in enumerate(toks):
                counts[t] = counts.get(t, 0) + 1
                self.positions.setdefault(t, {}).setdefault(doc_id, []).append(p)
            for t, tf in counts.items():
                self.postings.setdefault(t, {})[doc_id] = tf
        self.n_docs = len(self.dl)
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        return self.bool_search(should=query, k=k)

    def bool_search(
        self, should: str = "", must: str = "", must_not: str = "", k: int = 10,
        min_should: int = 0,
    ) -> list[tuple[int, float]]:
        """ES bool-query ground truth: SHOULD ∪ MUST terms score (ascending
        term order — pinned), hits must contain every MUST term, ≥
        ``min_should`` SHOULD terms, and no MUST_NOT term; a MUST term
        absent from the corpus ⇒ no hits."""
        should_set = sorted(set(tokenize(should))) if should else []
        must_terms = sorted(set(tokenize(must))) if must else []
        not_terms = {t for t in (tokenize(must_not) if must_not else []) if t in self.postings}
        if any(mt not in self.postings for mt in must_terms):
            return []
        terms = sorted(set(tokenize(should)) | set(must_terms))
        terms = [t for t in terms if t in self.postings]
        if not terms:
            return []
        scores: dict[int, float] = {}
        for t in terms:  # ascending term order — pinned
            ti = self.idf(t)
            for doc_id, tf in self.postings[t].items():
                dl = self.dl[doc_id]
                w = (tf * (self.k1 + 1.0)) / (
                    tf + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + ti * w
        hits = {
            d: s
            for d, s in scores.items()
            if all(d in self.postings[mt] for mt in must_terms)
            and sum(1 for st in should_set if d in self.postings.get(st, ()))
            >= min_should
            and not any(d in self.postings[nt] for nt in not_terms)
        }
        ranked = sorted(hits.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def phrase_search(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Phrase ground truth (Lucene PhraseQuery, pinned): hits contain
        the exact token sequence; tf := phraseFreq (count of start
        positions); score = (Σ idf over phrase tokens, duplicates included)
        · tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
        toks = tokenize(phrase)
        if not toks or any(t not in self.postings for t in set(toks)):
            return []
        cand = set(self.postings[toks[0]])
        for t in set(toks[1:]):
            cand &= set(self.postings[t])
        idf_sum = sum(self.idf(t) for t in toks)
        hits: dict[int, float] = {}
        for d in cand:
            starts = set(self.positions[toks[0]][d])
            for i, t in enumerate(toks[1:], start=1):
                pset = set(self.positions[t][d])
                starts = {p for p in starts if p + i in pset}
                if not starts:
                    break
            pf = len(starts)
            if not pf:
                continue
            dl = self.dl[d]
            w = (pf * (self.k1 + 1.0)) / (
                pf + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
            )
            hits[d] = idf_sum * w
        ranked = sorted(hits.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def span_near_search(
        self, terms: list[str], k: int = 10, *,
        slop: int = 0, in_order: bool = True,
    ) -> list[tuple[int, float]]:
        """span_near ground truth (single-term clauses, the engine's
        documented semantics — see ``_span_kernel``): ordered = greedy
        minimal chain from each clause-1 position, window ≤ (k−1)+slop;
        unordered = any clause-term position whose [p, p+W] window holds
        every clause term. spanFreq = matching anchors; score =
        idf_sum × tfNorm(spanFreq, dl)."""
        if any(t not in self.postings for t in terms):
            return []
        W = len(terms) - 1 + slop
        idf_sum = sum(self.idf(t) for t in terms)
        cand = set(self.postings[terms[0]])
        for t in terms[1:]:
            cand &= set(self.postings[t])
        scored = []
        for d in cand:
            pos = {t: sorted(self.positions[t][d]) for t in terms}
            pf = 0
            if in_order:
                for p in pos[terms[0]]:
                    cur, ok = p, True
                    for t in terms[1:]:
                        nxt = [q for q in pos[t] if q > cur]
                        if not nxt:
                            ok = False
                            break
                        cur = nxt[0]
                    if ok and cur - p <= W:
                        pf += 1
            else:
                for p in sorted({q for t in terms for q in pos[t]}):
                    if all(
                        any(p <= q <= p + W for q in pos[t]) for t in terms
                    ):
                        pf += 1
            if pf:
                dl = self.dl[d]
                w = (pf * (self.k1 + 1.0)) / (
                    pf + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
                )
                scored.append((d, idf_sum * w))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return scored[:k]

    def span_search(
        self, clauses: list, k: int = 10, *,
        slop: int = 0, in_order: bool = True,
        first_end: int | None = None,
        exclude: list | None = None, pre: int = 0, post: int = 0,
    ) -> list[tuple[int, float]]:
        """Generalized span ground truth mirroring ``_span_kernel``'s
        extensions: clauses may be OR-groups (position set = union of
        members, clause idf = max member), ``first_end`` keeps spans
        ending at ≤ that position (width-1: p+1 ≤ end), ``exclude`` drops
        anchors within [p−pre, p+post] of any exclude-term position."""
        groups = [
            (c,) if isinstance(c, str) else tuple(c) for c in clauses
        ]
        kept = [
            tuple(t for t in g if t in self.postings) for g in groups
        ]
        if any(not g for g in kept):
            return []
        idf_sum = sum(max(self.idf(t) for t in g) for g in kept)
        W = len(kept) - 1 + slop
        cand = set().union(*[set(self.postings[t]) for t in kept[0]])
        for g in kept[1:]:
            cand &= set().union(*[set(self.postings[t]) for t in g])
        ex_terms = [t for t in (exclude or []) if t in self.postings]
        scored = []
        for d in cand:
            pos = [
                sorted({
                    p for t in g
                    if d in self.positions[t]
                    for p in self.positions[t][d]
                })
                for g in kept
            ]
            anchors: list[int] = []
            if in_order:
                for p in pos[0]:
                    cur, ok = p, True
                    for ps in pos[1:]:
                        nxt = [q for q in ps if q > cur]
                        if not nxt:
                            ok = False
                            break
                        cur = nxt[0]
                    if ok and cur - p <= W:
                        anchors.append(p)
            else:
                for p in sorted({q for ps in pos for q in ps}):
                    if all(any(p <= q <= p + W for q in ps) for ps in pos):
                        anchors.append(p)
            if first_end is not None:
                anchors = [p for p in anchors if p + 1 <= first_end]
            if ex_terms:
                eps = sorted({
                    q for t in ex_terms
                    if d in self.positions[t]
                    for q in self.positions[t][d]
                })
                anchors = [
                    p for p in anchors
                    if not any(p - pre <= q <= p + post for q in eps)
                ]
            pf = len(anchors)
            if pf:
                dl = self.dl[d]
                w = (pf * (self.k1 + 1.0)) / (
                    pf + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
                )
                scored.append((d, idf_sum * w))
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return scored[:k]
