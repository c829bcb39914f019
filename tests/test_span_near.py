"""Ordered SpanNear proximity queries ("a b"~N): pinned against an
INDEPENDENT pure-Python reference implementing the same documented
contract (greedy next-occurrence chain per start, matchLength ≤ slop,
sloppy weight 1/(1+matchLength), phrase-form BM25), and against
phrase_search in the slop=0 degenerate case.
"""

import bisect
import math

import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.tokenizer import tokenize_text

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("span_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    docs = [(r["doc_id"], tokenize_text(r["content"]))
            for r in corpus.select("doc_id", "content").collect()]
    return QueryEngine(spark, d, CFG), docs


def _ref_topk(docs, terms, slop, k):
    n_docs = len(docs)
    avgdl = sum(len(t) for _d, t in docs) / n_docs
    dfs = {t: sum(1 for _d, toks in docs if t in set(toks)) for t in set(terms)}
    if any(dfs[t] == 0 for t in terms):
        return []
    idf_sum = sum(
        math.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
        for t in terms
    )
    out = []
    for doc_id, toks in docs:
        pos = {t: [i for i, x in enumerate(toks) if x == t]
               for t in set(terms)}
        if any(not pos[t] for t in terms):
            continue
        sf = 0.0
        for p1 in pos[terms[0]]:
            cur, ok = p1, True
            for t in terms[1:]:
                arr = pos[t]
                j = bisect.bisect_right(arr, cur)
                if j >= len(arr):
                    ok = False
                    break
                cur = arr[j]
            if ok:
                ml = cur - p1 - (len(terms) - 1)
                if ml <= slop:
                    sf += 1.0 / (1.0 + ml)
        if sf > 0:
            dl = len(toks)
            score = idf_sum * sf / (sf + K1 * (1.0 - B + B * dl / avgdl))
            out.append((doc_id, score))
    out.sort(key=lambda ds: (-ds[1], ds[0]))
    return [(d, round(s, 6)) for d, s in out[:k]]


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


@pytest.mark.parametrize("phrase,slop", [
    ("slow stream", 2),
    ("value table", 3),
    ("stream scan", 0),
    ("table join merge", 4),
])
def test_span_near_matches_python_reference(built, phrase, slop):
    engine, docs = built
    got = _rows(engine.span_near_search(phrase, slop=slop, k=10))
    exp = _ref_topk(docs, tokenize_text(phrase), slop, 10)
    assert got == exp


def test_slop_zero_equals_phrase(built):
    engine, _docs = built
    assert _rows(engine.span_near_search("slow stream", slop=0, k=10)) == \
        _rows(engine.phrase_search("slow stream", k=10))


def test_wider_slop_is_superset(built):
    engine, _docs = built
    tight = {d for d, _s in _rows(engine.span_near_search("slow stream",
                                                          slop=0, k=500))}
    loose = {d for d, _s in _rows(engine.span_near_search("slow stream",
                                                          slop=3, k=500))}
    assert tight <= loose and len(loose) > len(tight)


def test_query_string_dispatch_and_guards(built):
    engine, _docs = built
    # '"…"~N' dispatches to PhraseQuery slop (Solr semantics — see
    # test_sloppy_phrase.py); span_near_search is the explicit ordered API
    assert _rows(engine.query('"slow stream"~2', k=10)) == \
        _rows(engine.sloppy_phrase_search("slow stream", slop=2, k=10))
    from archivesspace_virgo_spark.index.query_parser import parse_query
    pq = parse_query('"slow stream"~2')
    assert pq.phrase == "slow stream" and pq.phrase_slop == 2
    assert parse_query('"a b"').phrase_slop == 0
    with pytest.raises(ValueError):
        engine.span_near_search("slow stream", slop=-1)
    assert engine.span_near_search("zzznope stream", slop=2).count() == 0
