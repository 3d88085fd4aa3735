"""ES term suggester ("did you mean"): fuzzy dictionary candidates per
input token with the documented score 1 − ed/max(len), ordered
(score desc, freq desc, term asc); suggest_mode missing/popular/always,
min_word_length skip, ES-shaped entries with offsets — all served from
the term_index sidecar with zero Spark jobs, plus the DSL "suggest"
section."""

from __future__ import annotations

import pytest

from conveyorbelt_spark.index.build import build_index
from conveyorbelt_spark.index.query import Searcher, term_suggest


@pytest.fixture(scope="module")
def tsidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ts_idx"))
    rows = [(i, "window frame") for i in range(10)]          # df(window)=10
    rows += [(10, "windows pane"), (11, "windows sill")]     # df(windows)=2
    rows += [(12, "widow black")]                            # df(widow)=1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=2)
    return out


def test_missing_mode_and_ranking(spark, tsidx):
    """'windoww' is unindexed → options; score = 1 − ed/max(len), ties by
    freq desc then term: window and windows tie at ed1/len7, freq ranks
    window (df 10) first; widow is ed2."""
    out = term_suggest(tsidx, "windoww")
    assert len(out) == 1
    e = out[0]
    assert (e["text"], e["offset"], e["length"]) == ("windoww", 0, 7)
    got = [(o["text"], o["freq"]) for o in e["options"]]
    assert got == [("window", 10), ("windows", 2), ("widow", 1)]
    assert e["options"][0]["score"] == pytest.approx(1 - 1 / 7)
    assert e["options"][2]["score"] == pytest.approx(1 - 2 / 7)
    # indexed token in missing mode → no options
    assert term_suggest(tsidx, "window")[0]["options"] == []


def test_always_popular_and_min_length(spark, tsidx):
    """always suggests for indexed tokens too; popular keeps only
    higher-freq corrections; short tokens are skipped (empty options)."""
    opts = term_suggest(tsidx, "window", suggest_mode="always")[0]["options"]
    assert [o["text"] for o in opts] == ["windows", "widow"]
    # popular from 'windows' (df 2): only window (df 10) qualifies
    opts = term_suggest(tsidx, "windows", suggest_mode="popular")[0]["options"]
    assert [o["text"] for o in opts] == ["window"]
    # widow (df 1) is dropped by popular even though ed-close
    ent = term_suggest(tsidx, "pane widow", suggest_mode="popular")
    assert [e["text"] for e in ent] == ["pane", "widow"]
    assert [o["text"] for o in ent[1]["options"]] == ["window", "windows"]
    short = term_suggest(tsidx, "win")[0]
    assert short["options"] == [] and short["length"] == 3
    with pytest.raises(ValueError, match="suggest_mode"):
        term_suggest(tsidx, "x", suggest_mode="bogus")


def test_offsets_and_size(spark, tsidx):
    """Offsets index the lowercased raw text; size caps options."""
    out = term_suggest(tsidx, "Frame, windoww!", size=1)
    assert [(e["text"], e["offset"]) for e in out] == [("frame", 0), ("windoww", 7)]
    assert [o["text"] for o in out[1]["options"]] == ["window"]


def test_dsl_suggest_section(spark, tsidx):
    """The request-level "suggest" block: suggest-only bodies skip the
    search phase; combined bodies carry both hits and suggestions; the
    Searcher method serves warm."""
    from conveyorbelt_spark.index.dsl import UnsupportedDSL, search_body

    s = Searcher(spark, tsidx)
    body = {"suggest": {"fix": {"text": "windoww", "term": {"field": "text"}}}}
    resp = search_body(spark, tsidx, body, searcher=s)
    assert resp["hits"]["hits"] == []
    assert [o["text"] for o in resp["suggest"]["fix"][0]["options"]] == [
        "window", "windows", "widow"
    ]
    combo = search_body(
        spark, tsidx,
        {"query": {"match": {"text": "frame"}}, "size": 3, **body},
        searcher=s,
    )
    assert len(combo["hits"]["hits"]) == 3
    assert combo["suggest"]["fix"][0]["options"]
    assert resp["suggest"]["fix"] == s.term_suggest("windoww")
    with pytest.raises(UnsupportedDSL, match="term suggester"):
        search_body(
            spark, tsidx,
            {"suggest": {"p": {"text": "x", "phrase": {"field": "text"}}}},
        )
