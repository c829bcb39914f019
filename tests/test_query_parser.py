"""Solr/Lucene ``q=`` string parsing + QueryEngine.query dispatch.

The parser grammar is the standard-parser subset the reference's select
handler receives (``user_mtime:[NOW-24HOUR TO NOW] AND types:repository``
IndexRecords.java:124-132,174 plus the clause forms SolrHelper.java:39-80
accepts).  parse_query is pinned as a pure function; engine.query is pinned
against the dedicated per-family methods (one parse, same kernels — so the
string entry point can never drift from the programmatic API).
"""

import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.index.query_parser import parse_query

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)


# --- pure parser ---

def test_terms_default_or():
    pq = parse_query("spark stream")
    assert pq.terms == ["spark", "stream"]
    assert pq.mode == "or"
    assert not pq.exclude and not pq.boosts and pq.phrase is None


def test_and_connective_sets_conjunctive_mode():
    pq = parse_query("spark AND stream")
    assert pq.terms == ["spark", "stream"]
    assert pq.mode == "and"
    # OR is accepted and is the default
    assert parse_query("spark OR stream").mode == "or"


def test_must_not_and_boost():
    pq = parse_query("spark -stream sort^2.5")
    assert pq.terms == ["spark", "sort"]
    assert pq.exclude == ["stream"]
    assert pq.boosts == {"sort": 2.5}


def test_field_scoped_term_passthrough():
    # field scoping is resolved by the engine's _parse_term, not the parser
    pq = parse_query("types:repository")
    assert pq.terms == ["types:repository"]


def test_phrase_clause():
    pq = parse_query('"slow stream scan"')
    assert pq.phrase == "slow stream scan"
    assert pq.phrase_field is None
    assert parse_query('path:"a b"').phrase_field == "path"


def test_multi_term_clauses():
    pq = parse_query("pre* te?t fuzz~1 /sc.n/ [scan TO sort] {a TO b}")
    assert pq.prefixes == ["pre*"]
    assert pq.wildcards == ["te?t"]
    assert pq.fuzzies == [("fuzz", 1)]
    assert pq.regexps == ["sc.n"]
    assert pq.ranges == [
        ("scan", "sort", True, True, None),
        ("a", "b", False, False, None),
    ]


def test_fuzzy_default_edits_and_field_range():
    assert parse_query("term~").fuzzies == [("term", 2)]
    assert parse_query("lang:[en TO fr]").ranges == [
        ("en", "fr", True, True, "lang")
    ]
    assert parse_query("lang:[* TO fr]").ranges == [
        (None, "fr", True, True, "lang")
    ]


def test_rejects_unsupported_combinations():
    with pytest.raises(ValueError):
        parse_query('-"a phrase"')          # negated phrase
    with pytest.raises(ValueError):
        parse_query('"a b" term')           # mixed phrase + terms
    with pytest.raises(ValueError):
        parse_query("a -")                  # dangling occur
    with pytest.raises(ValueError):
        parse_query("-pre*")                # negated multi-term clause
    with pytest.raises(ValueError):
        parse_query('"one" "two"')          # two phrase clauses


# --- engine dispatch (string entry == programmatic API) ---

@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qp_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    return QueryEngine(spark, d, CFG)


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_query_terms_modes_and_occurs(engine):
    assert _rows(engine.query("spark stream")) == _rows(
        engine.search(["spark", "stream"], mode="or")
    )
    assert _rows(engine.query("spark AND stream")) == _rows(
        engine.search(["spark", "stream"], mode="and")
    )
    assert _rows(engine.query("spark -stream")) == _rows(
        engine.search(["spark"], exclude=["stream"])
    )
    assert _rows(engine.query("spark stream^2")) == _rows(
        engine.search(["spark", "stream"], boosts={"stream": 2.0})
    )


def test_query_phrase_dispatch(engine):
    assert _rows(engine.query('"slow stream"')) == _rows(
        engine.phrase_search("slow stream")
    )


def test_query_multiterm_dispatch(engine):
    assert _rows(engine.query("s*")) == _rows(engine.prefix_search("s*"))
    assert _rows(engine.query("sc?n")) == _rows(engine.wildcard_search("sc?n"))
    assert _rows(engine.query("scal~1")) == _rows(
        engine.fuzzy_search("scal", max_edits=1, max_expansions=1024)
    )
    assert _rows(engine.query("/sc.n/")) == _rows(engine.regexp_search("sc.n"))
    assert _rows(engine.query("[scan TO sort]")) == _rows(
        engine.term_range_search("scan", "sort")
    )


def test_query_mixed_literal_and_expansion(engine):
    # literal + prefix merge into one OR search over the union
    expanded = engine._expand_prefix("st*", 1024)
    assert _rows(engine.query("scan st*")) == _rows(
        engine.search(["scan"] + expanded, mode="or")
    )


def test_query_and_with_expansion_dispatches_boolean(engine):
    expanded = engine._expand_prefix("st*", 1024)
    assert _rows(engine.query("scan AND st*")) == _rows(
        engine.boolean_search([["scan"], expanded])
    )


def test_query_empty_results(engine):
    assert engine.query("zzznope").count() == 0


def test_must_occur_parses():
    pq = parse_query("+spark stream")
    assert pq.must == ["spark"] and pq.terms == ["stream"]
    assert parse_query("+spark +stream").must == ["spark", "stream"]
    # '+' with a boost keeps the boost on the MUST term
    pqb = parse_query("+spark^2 stream")
    assert pqb.must == ["spark"] and pqb.boosts == {"spark": 2.0}
    # '+' on multi-term clauses is rejected rather than silently ignored
    for bad in ("+pre*", "+te?t", "+fuzz~1", "+/sc.n/", "+[a TO b]"):
        with pytest.raises(ValueError):
            parse_query(bad)


def test_query_must_dispatch(engine):
    got = _rows(engine.query("+scan stream"))
    exp = _rows(engine.boolean_search([["scan"]],
                                      optional_terms=["stream"]))
    assert got == exp and got
    # all-MUST equals the conjunctive query
    assert _rows(engine.query("+scan +stream")) == _rows(
        engine.search(["scan", "stream"], mode="and")
    )


def test_query_must_semantics(engine):
    """'+scan stream' = docs containing scan, scored over scan+stream."""
    must_docs = {r["doc_id"] for r in engine.match_ids(["scan"]).collect()}
    scores = {r["doc_id"]: r["score"]
              for r in engine.score_matches(["scan", "stream"]).collect()}
    exp = sorted(((d, s) for d, s in scores.items() if d in must_docs),
                 key=lambda ds: (-ds[1], ds[0]))[:10]
    got = _rows(engine.query("+scan stream", k=10))
    assert got == [(d, round(s, 6)) for d, s in exp]
