"""Solr fq / Lucene BooleanClause.FILTER: non-scoring required clauses.

The reference's own Solr queries are exactly this shape — a scored clause
conjoined with a non-scoring type gate (``q=... AND types:repository``,
IndexRecords.java:174; Solr idiom: fq=types:repository).  Filters are
pinned against the exact DuckDB oracle (documents WHERE predicate gating
qualification, scores untouched) and against set algebra over unfiltered
results.
"""

import duckdb
import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.functions.bm25 import bm25_oracle_sql
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16, fields=("content", "lang"))
TERMS = ["spark", "window"]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fq_idx"))
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


def _lang_pred(*langs):
    vals = ", ".join(f"'{v}'" for v in langs)
    return (
        "tf.doc_id IN (SELECT doc_id FROM documents "
        f"WHERE lang IN ({vals}))"
    )


def test_filter_matches_duckdb_oracle(engine, con):
    got = _rows(engine.search(TERMS, k=10, filters=[["lang:en"]]))
    exp = _oracle(con, bm25_oracle_sql(TERMS, k=10,
                                       filter_sql=[_lang_pred("en")]))
    assert got == exp and len(got) > 0


def test_filter_or_clause(engine, con):
    got = _rows(engine.search(TERMS, k=10, filters=[["lang:en", "lang:de"]]))
    exp = _oracle(con, bm25_oracle_sql(TERMS, k=10,
                                       filter_sql=[_lang_pred("en", "de")]))
    assert got == exp and len(got) > 0


def test_filter_does_not_change_scores(engine):
    # every filtered hit keeps its unfiltered score (non-scoring clause)
    unfiltered = dict(_rows(engine.search(TERMS, k=500)))
    for d, s in _rows(engine.search(TERMS, k=10, filters=[["lang:en"]])):
        assert unfiltered[d] == s


def test_filter_composes_with_exclude_and_mode(engine, con):
    got = _rows(engine.search(TERMS, k=10, mode="and",
                              exclude=["merge"], filters=[["lang:en"]]))
    exp = _oracle(con, bm25_oracle_sql(
        TERMS, k=10, mode="and", exclude=["merge"],
        filter_sql=[_lang_pred("en")],
    ))
    assert got == exp


def test_filter_on_boolean_search(engine, con):
    # FILTER composes with clause queries too
    from archivesspace_virgo_spark.functions.bm25 import bm25_boolean_oracle_sql

    clauses = [["table"], ["join", "merge"]]
    got = _rows(engine.boolean_search(clauses, k=10, filters=[["lang:en"]]))
    all_rows = _rows(engine.boolean_search(clauses, k=500))
    en_ids = {int(r[0]) for r in con.execute(
        "SELECT doc_id FROM documents WHERE lang = 'en'").fetchall()}
    exp = [(d, s) for d, s in all_rows if d in en_ids][:10]
    assert got == exp and len(got) > 0
    assert bm25_boolean_oracle_sql  # imported for parity reference


def test_filter_match_ids_count_facet(engine, con):
    n = engine.count(TERMS, filters=[["lang:en"]])
    (exp_n,) = con.execute(
        "SELECT count(*) FROM "
        f"({bm25_oracle_sql(TERMS, k=10**9, filter_sql=[_lang_pred('en')])})"
    ).fetchone()
    assert n == exp_n and n > 0
    ids = {r["doc_id"] for r in
           engine.match_ids(TERMS, filters=[["lang:en"]]).collect()}
    assert len(ids) == n
    fc = {r["lang"]: r["facet_count"] for r in
          engine.facet_search(TERMS, "lang", filters=[["lang:en"]]).collect()}
    assert set(fc) == {"en"} and fc["en"] == n


def test_absent_or_empty_filter_term(engine):
    assert engine.search(TERMS, k=10, filters=[["lang:zz"]]).count() == 0
    assert engine.search(TERMS, k=10, filters=[[]]).count() == 0
    assert engine.count(TERMS, filters=[["lang:zz"]]) == 0
