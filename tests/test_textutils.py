from __future__ import annotations

from conveyorbelt_spark.corpus import generate_corpus
from conveyorbelt_spark.textutils import extract_text, tokenize


def test_extract_text_pinned():
    html = (
        b"<html><head><title>A &amp; B</title><script>var x=1;</script></head>"
        b"<body><p>hello   world</p><style>p{}</style><div>bye</div></body></html>"
    )
    assert extract_text(html) == "A & B hello world bye"


def test_entities_order():
    # &amp;lt; must decode to &lt; (literal), not <
    assert extract_text("&amp;lt;") == "&lt;"


def test_tokenize():
    assert tokenize("Hello, WORLD-42 foo_bar") == ["hello", "world", "42", "foo", "bar"]
    assert tokenize("") == []


def test_corpus_deterministic_and_invariant():
    a = generate_corpus(50, seed=42)
    b = generate_corpus(50, seed=42)
    assert a.equals(b)
    # the parity invariant: text == pinned extractor applied to html, per url
    for html, text in zip(a["html"], a["text"]):
        assert extract_text(html) == text
    assert a["url"].is_unique


def test_corpus_parts_disjoint():
    a = generate_corpus(10, seed=42, part=0)
    b = generate_corpus(10, seed=42, part=1)
    assert set(a["url"]).isdisjoint(set(b["url"]))
