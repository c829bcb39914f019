"""Lucene BooleanQuery clause semantics + Solr minimum-should-match.

``boolean_search`` (AND of clauses, each clause an OR over its terms — the
reference's compound query shape ``getQuery(...) + " AND types:repository"``
IndexRecords.java:174 generalized to expanded clauses) and
``search(min_should_match=m)`` are each pinned against an exact DuckDB
oracle over the same parquet corpus, and against the flat-mode engine
calls they must degenerate to (single-term clauses == AND; mm=1 == OR;
mm=n == AND).
"""

import duckdb
import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.functions.bm25 import (
    bm25_boolean_oracle_sql,
    bm25_oracle_sql,
)
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bool_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    return QueryEngine(spark, d, CFG)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    return c


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def _oracle(con, sql):
    return [(int(d), round(s, 6)) for d, s in con.execute(sql).fetchall()]


# --- boolean_search ---

def test_boolean_matches_duckdb_oracle(engine, con):
    clauses = [["table"], ["join", "merge"]]
    got = _rows(engine.boolean_search(clauses, k=10))
    exp = _oracle(con, bm25_boolean_oracle_sql(clauses, k=10))
    assert got == exp and len(got) > 0


def test_boolean_single_term_clauses_equal_and(engine):
    assert _rows(engine.boolean_search([["table"], ["join"]], k=10)) == _rows(
        engine.search(["table", "join"], k=10, mode="and")
    )


def test_boolean_one_clause_equals_or(engine):
    assert _rows(engine.boolean_search([["spark", "window"]], k=10)) == _rows(
        engine.search(["spark", "window"], k=10, mode="or")
    )


def test_boolean_shared_term_scores_per_clause(engine, con):
    # 'spark' sits in both clauses -> contributes twice (2x idf), exactly
    # as Lucene's BooleanQuery scores duplicate clauses
    clauses = [["spark"], ["spark", "window"]]
    got = _rows(engine.boolean_search(clauses, k=10))
    exp = _oracle(con, bm25_boolean_oracle_sql(clauses, k=10))
    assert got == exp and len(got) > 0


def test_boolean_with_exclude_and_boost(engine, con):
    clauses = [["table"], ["join", "merge"]]
    got = _rows(engine.boolean_search(
        clauses, k=10, exclude=["vector"], boosts={"join": 2.0}
    ))
    exp = _oracle(con, bm25_boolean_oracle_sql(
        clauses, k=10, exclude=["vector"], boosts={"join": 2.0}
    ))
    assert got == exp and len(got) > 0


def test_boolean_unsatisfiable_clause_empties(engine):
    assert engine.boolean_search([["table"], []]).count() == 0
    assert engine.boolean_search([["table"], ["zzznope"]]).count() == 0


# --- minimum-should-match ---

def test_mm_matches_duckdb_oracle(engine, con):
    terms = ["spark", "window", "merge"]
    got = _rows(engine.search(terms, k=10, min_should_match=2))
    exp = _oracle(con, bm25_oracle_sql(terms, k=10, min_should_match=2))
    assert got == exp and len(got) > 0


def test_mm_degenerate_cases(engine):
    terms = ["spark", "window", "merge"]
    assert _rows(engine.search(terms, k=10, min_should_match=1)) == _rows(
        engine.search(terms, k=10, mode="or")
    )
    assert _rows(engine.search(terms, k=10, min_should_match=3)) == _rows(
        engine.search(terms, k=10, mode="and")
    )
    assert engine.search(terms, k=10, min_should_match=4).count() == 0


def test_mm_match_ids_and_count(engine, con):
    terms = ["spark", "window", "merge"]
    n = engine.count(terms, min_should_match=2)
    (exp,) = con.execute(
        f"SELECT count(*) FROM ({bm25_oracle_sql(terms, k=10**9, min_should_match=2)})"
    ).fetchone()
    assert n == exp and n > 0
    ids = {r["doc_id"] for r in
           engine.match_ids(terms, min_should_match=2).collect()}
    assert len(ids) == n


def test_pure_should_path_keeps_filters(engine):
    """boolean_search with no MUST clauses (the '+'-less degenerate) must
    still honor fq filters on its flat-OR fast path."""
    flt = [["value", "data"]]
    got = [(r["doc_id"], round(r["score"], 6)) for r in
           engine.boolean_search([], optional_terms=["table"],
                                 filters=flt).collect()]
    exp = [(r["doc_id"], round(r["score"], 6)) for r in
           engine.search(["table"], filters=flt).collect()]
    assert got == exp and got


def test_pure_should_duplicate_terms_score_m_times(engine):
    """BooleanQuery does not dedup SHOULD clauses: 'table table' (no '+')
    scores the term twice.  The pure-SHOULD fast path must match both the
    boost-2 formulation and the clause path's opt_count contract."""
    got = [(r["doc_id"], round(r["score"], 6)) for r in
           engine.boolean_search([], optional_terms=["table", "table"],
                                 ).collect()]
    exp = [(r["doc_id"], round(r["score"], 6)) for r in
           engine.search(["table"], boosts={"table": 2.0}).collect()]
    assert got == exp and got
    # and a user-supplied boost composes multiplicatively with the m×
    got3 = [(r["doc_id"], round(r["score"], 6)) for r in
            engine.boolean_search([], optional_terms=["table", "table"],
                                  boosts={"table": 1.5}).collect()]
    exp3 = [(r["doc_id"], round(r["score"], 6)) for r in
            engine.search(["table"], boosts={"table": 3.0}).collect()]
    assert got3 == exp3 and got3
