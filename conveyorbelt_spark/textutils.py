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
