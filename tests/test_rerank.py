"""Solr ReRankQParser (rq={!rerank}): window rescoring by a second query,
pinned against a pure-Python recombination of the two (already
oracle-pinned) passes.
"""

import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)
TERMS = ["table", "value"]
PHRASE = "value table"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rr_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    return QueryEngine(spark, d, CFG)


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def _expected(engine, k, rerank_docs, weight, slop=0, ordered=False):
    window = [(r["doc_id"], r["score"])
              for r in engine.search(TERMS, k=rerank_docs).collect()]
    if slop > 0 and ordered:
        second = engine.span_near_search(PHRASE, slop=slop, k=10 ** 6)
    elif slop > 0:
        # the API default: Solr-parity PhraseQuery slop, like query('"a b"~N')
        second = engine.sloppy_phrase_search(PHRASE, slop=slop, k=10 ** 6)
    else:
        second = engine.phrase_search(PHRASE, k=10 ** 6)
    ph = {r["doc_id"]: r["score"] for r in second.collect()}
    out = [(d, s + weight * ph.get(d, 0.0)) for d, s in window]
    out.sort(key=lambda ds: (-ds[1], ds[0]))
    return [(d, round(s, 6)) for d, s in out[:k]]


def test_rerank_matches_recombination(engine):
    got = _rows(engine.rerank(TERMS, PHRASE, k=10, rerank_docs=30,
                              weight=2.0))
    assert got == _expected(engine, 10, 30, 2.0) and len(got) == 10


def test_rerank_with_slop_and_weights(engine):
    # default slop semantics = PhraseQuery slop (consistent with
    # query('"a b"~N') and both CLIs); ordered=True = SpanNear
    got = _rows(engine.rerank(TERMS, PHRASE, k=10, rerank_docs=30,
                              weight=5.0, slop=2))
    assert got == _expected(engine, 10, 30, 5.0, slop=2)
    got_o = _rows(engine.rerank(TERMS, PHRASE, k=10, rerank_docs=30,
                                weight=5.0, slop=2, ordered=True))
    assert got_o == _expected(engine, 10, 30, 5.0, slop=2, ordered=True)
    # weight=0 degenerates to the main query's window order
    got0 = _rows(engine.rerank(TERMS, PHRASE, k=10, rerank_docs=30,
                               weight=0.0))
    assert got0 == _rows(engine.search(TERMS, k=10))


def test_rerank_actually_moves_phrase_docs_up(engine):
    base = [d for d, _s in _rows(engine.search(TERMS, k=30))]
    rr = [d for d, _s in _rows(engine.rerank(TERMS, PHRASE, k=30,
                                             rerank_docs=30, weight=10.0))]
    ph_docs = {r["doc_id"] for r in engine.phrase_search(PHRASE, k=30).collect()}
    moved = [d for d in rr[:5] if d in ph_docs]
    assert moved, (base[:5], rr[:5])  # heavy weight pulls phrase docs up
    assert set(rr) == set(base)       # rerank permutes the window only


def test_targeted_phrase_equals_global_restriction(engine):
    # only_doc_ids is the second pass's primitive: its result must equal
    # the unrestricted phrase result filtered to those ids
    ids = [r["doc_id"] for r in engine.search(TERMS, k=20).collect()]
    target = dict(_rows(engine.phrase_search(PHRASE, k=10 ** 6,
                                             only_doc_ids=ids)))
    full = dict(_rows(engine.phrase_search(PHRASE, k=10 ** 6)))
    assert target == {d: s for d, s in full.items() if d in set(ids)}
    assert engine.phrase_search(PHRASE, only_doc_ids=[]).count() == 0


def test_rerank_keeps_tail_beyond_window(engine):
    """k > rerank_docs: docs past the reranked window keep their original
    scores and order and follow the window (Solr ReRankQParser appends the
    main query's remainder instead of dropping it)."""
    got = _rows(engine.rerank(TERMS, PHRASE, k=20, rerank_docs=5,
                              weight=10.0))
    window = _expected(engine, 5, 5, 10.0)
    tail = _rows(engine.search(TERMS, k=20))[5:]
    assert got == window + tail and len(got) == 20


def test_only_doc_ids_respects_k(engine):
    """Direct phrase/span callers with only_doc_ids get ≤ k rows."""
    ids = [r["doc_id"] for r in engine.search(TERMS, k=20).collect()]
    assert engine.phrase_search(PHRASE, k=2, only_doc_ids=ids).count() <= 2
    assert engine.span_near_search(PHRASE, slop=2, k=2,
                                   only_doc_ids=ids).count() <= 2
