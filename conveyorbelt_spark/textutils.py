"""Pinned text functions — the per-row parity invariant.

``extract_text`` and ``tokenize`` are THE canonical definitions: the corpus
generator, the Spark kernels (via pandas ``.str`` ops compiled from the same
regexes), and the pure-Python BM25 oracle all import from here, so
"byte-identical extracted text per url" (BASELINE.json input_hint) holds by
construction and is asserted in tests.

No locale, no environment, no library beyond ``re`` — fully deterministic.
"""

from __future__ import annotations

import re

# --- HTML → text (pinned) ---------------------------------------------------
# Order matters and is part of the pin:
# 1. drop <script>/<style> elements with their content
# 2. replace every remaining tag with a single space
# 3. decode the 5 canonical entities (&amp; last so "&amp;lt;" -> "&lt;")
# 4. collapse all whitespace runs to single spaces, strip ends
SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1\s*>")
TAG_RE = re.compile(r"<[^>]*>")
WS_RE = re.compile(r"\s+")
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def extract_text(html: bytes | str) -> str:
    """Pinned HTML→text extractor (reference analogue: the parse step of
    IParser implementations, e.g. IisLogParser.cs — stream in, fields out;
    here: html bytes in, canonical text out)."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = SCRIPT_STYLE_RE.sub(" ", s)
    s = TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return WS_RE.sub(" ", s).strip()


# --- Tokenizer (pinned) -----------------------------------------------------
# lowercase, then keep maximal [a-z0-9]+ runs. ASCII-only by design (the
# analyzed-string semantics of the reference's ES "analyzed" fields,
# mappings/AzureIisLog.json, simplified to a pinned standard analyzer).
TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


# BM25 constants (ES defaults; SURVEY.md §2.6 J3)
BM25_K1 = 1.2
BM25_B = 0.75


# --- Optional analyzer chain (ES custom-analyzer analogue) ------------------
# The PINNED tokenizer above stays the default (the parity invariant); an
# index may opt into an analyzer at build time (build_index(analyzer=...));
# the config is persisted in stats.json and the query side applies the SAME
# chain, so index and query agree by construction. Filters, in order:
#   stopwords: "english" (the classic Lucene/ES 33-word list) or a list
#   min_len:   drop tokens shorter than this (default 1 = keep all)
#   stem:      "s" = minimal english plural stemmer (Lucene
#              EnglishMinimalStemFilter semantics, regex-pinned below)
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

# plural rules, applied in order (both sides use these exact regexes):
# 1. -ies → -y when ≥2 chars precede and the one before 'ies' isn't [ae]
#    (queries→query, bodies→body; dies/aies/eies untouched)
# 2. else keep protected -[iaoe]es endings (goes, dies) intact
# 3. else drop a final -s when ≥3 chars precede and it isn't -ss/-us
#    (windows→window; glass, virus, gas untouched)
_STEM_IES_RE = re.compile(r"(?<=\w\w)(?<![ae])ies$")
_STEM_S_RE = re.compile(r"(?<=\w{3})(?<![su])s$")
_STEM_ES_GUARD_RE = re.compile(r"[iaoe]es$")


def stem_s(word: str) -> str:
    """Minimal english plural stemmer — one word (query side / oracles).
    The build applies the SAME regexes vectorized (pandas .str.replace)."""
    w = _STEM_IES_RE.sub("y", word)
    if w != word:
        return w
    if _STEM_ES_GUARD_RE.search(word):
        return word
    return _STEM_S_RE.sub("", word)


def analyzer_config(analyzer) -> dict | None:
    """Normalize an analyzer spec: None → None; dict keys stopwords
    ("english" | list), min_len (int ≥1), stem ("s" | None)."""
    if not analyzer:
        return None
    stop = analyzer.get("stopwords")
    if stop == "english":
        stop = sorted(ENGLISH_STOPWORDS)
    return {
        "stopwords": sorted(stop) if stop else [],
        "min_len": int(analyzer.get("min_len", 1)),
        "stem": analyzer.get("stem") or None,
    }


def analyze(text_or_tokens, analyzer: dict | None) -> list[str]:
    """Tokenize + apply the analyzer chain (query-side / oracle use; the
    build applies the same chain vectorized in the tokenize kernel)."""
    toks = (
        tokenize(text_or_tokens)
        if isinstance(text_or_tokens, str)
        else list(text_or_tokens)
    )
    if not analyzer:
        return toks
    stop = set(analyzer.get("stopwords") or [])
    min_len = int(analyzer.get("min_len", 1))
    out = [t for t in toks if t not in stop and len(t) >= min_len]
    if analyzer.get("stem") == "s":
        out = [stem_s(t) for t in out]
    return out


def analyze_with_slots(text: str, analyzer: dict | None) -> list[tuple[str, int]]:
    """Tokenize + analyzer chain, KEEPING each surviving token's original
    slot index (Lucene position-increment semantics: a removed stopword
    leaves a gap, it doesn't shift later positions). This is the query-side
    twin of the positional build kernel's analyzer path — phrase matching
    over an analyzed index intersects on (term, original-slot) so "quick
    over dog" with stopword "over" requires doc positions p and p+2."""
    toks = tokenize(text)
    if not analyzer:
        return list(enumerate_tokens(toks))
    stop = set(analyzer.get("stopwords") or [])
    min_len = int(analyzer.get("min_len", 1))
    stem = analyzer.get("stem") == "s"
    out = []
    for i, t in enumerate(toks):
        if t in stop or len(t) < min_len:
            continue
        out.append((stem_s(t) if stem else t, i))
    return out


def analyze_with_offsets(
    text: str, analyzer: dict | None
) -> list[tuple[str, int, int, int]]:
    """Tokenize + analyzer chain keeping (token, position, start_offset,
    end_offset) — the ES ``_analyze`` response quadruple. Position is the
    original slot index (increment semantics, gaps where stopwords fell
    out — same rule as ``analyze_with_slots``); offsets index into the
    lowercased text (identical to the original for ASCII input)."""
    lowered = text.lower()
    stop = set((analyzer or {}).get("stopwords") or [])
    min_len = int((analyzer or {}).get("min_len", 1))
    stem = (analyzer or {}).get("stem") == "s"
    out = []
    for i, m in enumerate(TOKEN_RE.finditer(lowered)):
        t = m.group(0)
        if analyzer and (t in stop or len(t) < min_len):
            continue
        out.append((stem_s(t) if stem else t, i, m.start(), m.end()))
    return out


def enumerate_tokens(toks: list[str]) -> list[tuple[str, int]]:
    return [(t, i) for i, t in enumerate(toks)]
