"""Field-scoped queries (SURVEY.md §2.8-T10): the reference's Solr surface
scopes query clauses per field (``types:repository`` IndexRecords.java:174);
our engine stores non-default fields as prefixed composite terms with
per-field norms.  Rank-identity vs the multi-field brute-force oracle."""

import pytest
from pyspark.sql import functions as F

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.oracle import (
    build_oracle_index_fields,
    oracle_search_fields,
)

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16, fields=("content", "path", "lang"))


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("fidx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, index_dir, CFG)
    rows = corpus.select("doc_id", "content", "path", "lang").collect()
    oracle = build_oracle_index_fields(
        [(r["doc_id"], {"content": r["content"], "path": r["path"], "lang": r["lang"]})
         for r in rows],
        CFG.fields,
    )
    return QueryEngine(spark, index_dir, CFG), oracle


QUERIES = [
    (["path:doc"], "or"),              # hot in path field (every doc)
    (["path:42"], "or"),               # one specific path token
    (["lang:en"], "or"),               # keyword-ish field
    (["table", "path:7"], "or"),       # cross-field disjunction
    (["table", "lang:de"], "and"),     # cross-field conjunction
    (["path:doc", "path:13"], "and"),
    (["lang:nosuchlang"], "or"),       # absent field value
    (["table", "path:nosuch"], "and"), # AND with absent → empty
]


def test_field_scoped_rank_identity(built):
    engine, oracle = built
    for terms, mode in QUERIES:
        expected = oracle_search_fields(oracle, "content", terms, k=10, mode=mode)
        got = [(r["doc_id"], r["score"])
               for r in engine.search(terms, k=10, mode=mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in expected], (terms, mode)
        for (_, gs), (_, es) in zip(got, expected):
            assert abs(gs - es) < 1e-6, (terms, mode)


def test_per_field_corpus_stats(built, spark):
    engine, oracle = built
    for f in CFG.fields:
        n, avgdl = engine.field_stats[f]
        assert n == oracle[f].n_docs
        assert abs(avgdl - oracle[f].avgdl) < 1e-9


def test_default_field_unprefixed(built):
    """Bare terms hit the default field — identical to a single-field index
    for content-only queries (prefixing must not perturb content scoring)."""
    engine, oracle = built
    expected = oracle_search_fields(oracle, "content", ["table"], k=5)
    got = [(r["doc_id"], r["score"]) for r in engine.search(["table"], k=5).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected]


def test_field_term_stats(built):
    engine, oracle = built
    stats = engine.term_stats(["lang:en", "path:doc"])
    assert stats["lang:en"][0] == oracle["lang"].df.get("en", 0)
    assert stats["path:doc"][0] == oracle["path"].df.get("doc", 0)
    assert "lang:nosuch" not in engine.term_stats(["lang:nosuch"])


def test_default_field_expansions_exclude_scoped_terms(built):
    """Lucene expands multi-term queries PER FIELD: a default-field
    prefix/wildcard/fuzzy/regexp/suggest expansion must never leak scoped
    ``field:term`` lexicon entries (``pat*`` must not return ``path:doc``
    on a multi-field index)."""
    engine, _ = built
    # 'pat*' would previously match every 'path:...' entry via startswith
    assert all(":" not in t for t in engine._expand_prefix("pat*", 1 << 16))
    # 'la*' → rx '^la.*$' would previously match 'lang:de' etc.
    assert all(":" not in t for t in engine._expand_wildcard("la*", 1 << 16))
    assert all(":" not in t for t in engine._expand_regexp("la.*", 1 << 16))
    # 'ang:en' is a DEFAULT-field term (no indexed field 'ang') one edit
    # from the scoped entry 'lang:en' — fuzzy/suggest must not return it
    assert all(":" not in t
               for t in engine._expand_fuzzy("ang:en", 2, 0, 1 << 16))
    sug = [r["term"] for r in
           engine.suggest("ang:en", n=10, max_edits=2,
                          prefix_length=0).collect()]
    assert all(":" not in t for t in sug)


def test_scoped_expansions_stay_in_field(built):
    """Field-scoped expansions still work and stay inside their field."""
    engine, _ = built
    exp = engine._expand_prefix("path:d*", 1 << 16)
    assert exp and all(t.startswith("path:") for t in exp)
    lx = engine._expand_prefix("lang:*", 1 << 16)
    assert lx and all(t.startswith("lang:") for t in lx)
