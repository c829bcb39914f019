"""Lucene Explanation / Solr debugQuery=true: the per-term breakdown must
sum EXACTLY to the search score for the same docs (same kernel arithmetic),
with factors matching the brute-force oracle's tf/dl/idf.
"""

import math

import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.tokenizer import tokenize_text

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)
TERMS = ["spark", "window", "merge"]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ex_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    docs = {r["doc_id"]: r["content"]
            for r in corpus.select("doc_id", "content").collect()}
    return QueryEngine(spark, d, CFG), docs


def test_explain_sums_to_search_score(built):
    engine, _docs = built
    top = [(r["doc_id"], r["score"])
           for r in engine.search(TERMS, k=5).collect()]
    ids = [d for d, _ in top]
    ex = engine.explain(TERMS, ids).collect()
    by_doc = {}
    for r in ex:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, score in top:
        # deterministic accumulation: sorted-term order, like the kernel
        rows = sorted(by_doc[d], key=lambda r: r["term"])
        assert abs(sum(r["contrib"] for r in rows) - score) < 1e-9


def test_explain_factors_match_document(built):
    engine, docs = built
    top_doc = engine.search(TERMS, k=1).collect()[0]["doc_id"]
    rows = engine.explain(TERMS, [top_doc]).collect()
    toks = tokenize_text(docs[top_doc])
    for r in rows:
        assert r["tf"] == toks.count(r["term"])
        assert r["dl"] == len(toks)
        assert r["idf"] > 0


def test_explain_boosts_and_empty(built):
    engine, _docs = built
    top_doc = engine.search(TERMS, k=1).collect()[0]["doc_id"]
    plain = {r["term"]: r["contrib"]
             for r in engine.explain(TERMS, [top_doc]).collect()}
    boosted = {r["term"]: r["contrib"]
               for r in engine.explain(TERMS, [top_doc],
                                       boosts={"spark": 2.0}).collect()}
    for t in plain:
        want = plain[t] * (2.0 if t == "spark" else 1.0)
        assert math.isclose(boosted[t], want, rel_tol=1e-12)
    assert engine.explain(TERMS, []).count() == 0
    assert engine.explain(["zzznope"], [top_doc]).count() == 0
