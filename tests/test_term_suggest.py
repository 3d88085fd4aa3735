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
    with pytest.raises(UnsupportedDSL, match="suggester"):
        search_body(spark, tsidx, {"suggest": {"p": {"text": "x", "zzz": {}}}})


def test_dsl_completion_suggester(spark, tsidx):
    """{"prefix": ..., "completion": {...}}: top-df dictionary
    completions, ES entry shape, df surfaced as _score."""
    from conveyorbelt_spark.index.dsl import search_body

    s = Searcher(spark, tsidx)
    resp = search_body(spark, tsidx, {"suggest": {
        "c": {"prefix": "wi", "completion": {"field": "text", "size": 2}}
    }}, searcher=s)
    ent = resp["suggest"]["c"][0]
    assert (ent["text"], ent["offset"], ent["length"]) == ("wi", 0, 2)
    # df(window)=10 > df(windows)=2 > df(widow)=1; size caps at 2
    assert [(o["text"], o["_score"]) for o in ent["options"]] == [
        ("window", 10.0), ("windows", 2.0)
    ]
    assert resp["hits"]["hits"] == []


def test_match_none(spark, tsidx):
    """match_none: zero hits, exact total 0, and zero-matched write APIs."""
    from conveyorbelt_spark.index.dsl import count_body, search_body

    resp = search_body(spark, tsidx, {"query": {"match_none": {}}})
    assert resp["hits"] == {"total": {"value": 0, "relation": "eq"}, "hits": []}
    assert count_body(spark, tsidx, {"query": {"match_none": {}}}) == {"count": 0}


@pytest.fixture(scope="module")
def psidx(spark, tmp_path_factory):
    """Positional corpus where UNIGRAM frequency and BIGRAM context
    disagree: 'jane' is the more frequent term overall, but 'spark join'
    is the frequent bigram — the phrase suggester must out-rank the term
    suggester's frequency-only pick."""
    out = str(tmp_path_factory.mktemp("ps_idx"))
    rows = [(i, "spark join table") for i in range(5)]          # bg(spark,join)=5
    rows += [(10 + i, "jane doe writes") for i in range(11)]    # cf(jane)=11
    rows += [(30, "spark jane meeting")]                        # bg(spark,jane)=1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_index(spark, docs, out, url_col=None, n_buckets=2, positions=True)
    return out, rows


def test_phrase_freq(spark, psidx):
    from conveyorbelt_spark.index.query import Searcher

    out, rows = psidx
    s = Searcher(spark, out)
    assert s.phrase_freq("spark join") == 5
    assert s.phrase_freq("spark jane") == 1
    assert s.phrase_freq("jane doe") == 11
    assert s.phrase_freq("join spark") == 0
    assert s.phrase_freq("spark") == 6          # collection frequency
    assert s.phrase_freq("jane") == 12
    assert s.phrase_freq("nosuchterm") == 0


def test_phrase_suggest_context_beats_frequency(spark, psidx):
    """'spark jarn' → candidates for 'jarn' (ed 2, first char j) are
    {jane, join}; jane wins on raw frequency (df 12 > 5) but the bigram
    LM ranks 'spark join' first. Scores verified against the documented
    stupid-backoff formula computed from raw counts."""
    import math

    from conveyorbelt_spark.index.query import Searcher

    out, rows = psidx
    s = Searcher(spark, out)
    # term suggester (frequency-ranked) picks jane first — fixture sanity
    topts = s.term_suggest("jarn", suggest_mode="always")[0]["options"]
    assert [o["text"] for o in topts][:2] == ["jane", "join"]
    ent = s.phrase_suggest("spark jarn")
    assert len(ent) == 1 and ent[0]["text"] == "spark jarn"
    opts = ent[0]["options"]
    assert [o["text"] for o in opts][:2] == ["spark join", "spark jane"]
    T = sum(len(t.split()) for _, t in rows)      # 17 docs × 3 tokens
    uni = lambda c: (c + 1.0) / (T + 1.0)
    want_join = math.log(uni(6)) + math.log(5 / 6)    # bg(spark,join)/cf(spark)
    want_jane = math.log(uni(6)) + math.log(1 / 6)
    assert opts[0]["score"] == pytest.approx(want_join)
    assert opts[1]["score"] == pytest.approx(want_jane)
    # confidence: everything at/below the input's own score is dropped;
    # with an impossible bar no options survive
    assert s.phrase_suggest("spark jarn", confidence=1e9)[0]["options"] == []


def test_phrase_suggest_dsl_and_backoff(spark, psidx):
    """The DSL "phrase" suggest entry matches the API; an unseen bigram
    backs off to discount × Laplace unigram."""
    import math

    from conveyorbelt_spark.index.dsl import search_body
    from conveyorbelt_spark.index.query import Searcher

    out, rows = psidx
    s = Searcher(spark, out)
    resp = search_body(spark, out, {"suggest": {
        "fix": {"text": "spark jarn", "phrase": {"size": 2}},
    }}, searcher=s)
    assert resp["suggest"]["fix"] == s.phrase_suggest("spark jarn", size=2)
    # 'table jarn' → 'table join' exists as words but bigram(table, join)=0
    # → backoff path; verify the formula
    ent = s.phrase_suggest("table jarn")
    T = sum(len(t.split()) for _, t in rows)
    uni = lambda c: (c + 1.0) / (T + 1.0)
    got = {o["text"]: o["score"] for o in ent[0]["options"]}
    assert got["table join"] == pytest.approx(
        math.log(uni(5)) + math.log(0.4 * uni(5))
    )
    assert got["table jane"] == pytest.approx(
        math.log(uni(5)) + math.log(0.4 * uni(12))
    )
