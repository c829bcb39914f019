"""Multi-term query rewrites + highlighting (Lucene MultiTermQuery /
UnifiedHighlighter surface: the Solr ``q=pre*`` / ``q=term~1`` / ``hl=true``
syntax the reference's select handler accepts, SolrHelper.java:39-80).

prefix_search / fuzzy_search expand against the lexicon and score as a
boolean OR (SCORING_BOOLEAN rewrite), so each is pinned both against the
DuckDB BM25 oracle and against ``search`` over the hand-expanded term set.
highlight is pinned against a pure-Python minimal-window reference over the
raw tokenized text.
"""

import duckdb
import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.functions.bm25 import bm25_prefix_oracle_sql
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.tokenizer import tokenize_text

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)

# the corpus vocabulary's s-terms (fixed synthetic vocab, TESTDATA.md)
S_TERMS = ["scan", "slow", "small", "sort", "spark", "stream"]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mtq_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    return QueryEngine(spark, d, CFG)


@pytest.fixture(scope="module")
def raw_docs(spark):
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    return [
        (r["doc_id"], r["content"])
        for r in corpus.select("doc_id", "content").collect()
    ]


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


# --- prefix ---

def test_prefix_matches_duckdb_oracle(engine):
    got = _rows(engine.prefix_search("s*", k=10))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    exp = [
        (int(d), round(s, 6))
        for d, s in con.execute(bm25_prefix_oracle_sql("s", k=10)).fetchall()
    ]
    assert got == exp


def test_prefix_equals_manual_or_expansion(engine):
    # the rewrite contract: q=s* IS an OR over every matching lexicon term
    assert _rows(engine.prefix_search("s*", k=10)) == _rows(
        engine.search(S_TERMS, k=10, mode="or")
    )


def test_prefix_without_star_and_paging(engine):
    assert _rows(engine.prefix_search("s", k=10)) == _rows(
        engine.prefix_search("s*", k=10)
    )
    page2 = _rows(engine.prefix_search("s*", k=5, offset=5))
    assert page2 == _rows(engine.prefix_search("s*", k=10))[5:]


def test_prefix_no_match_is_empty(engine):
    assert engine.prefix_search("zzz*", k=10).count() == 0


def test_prefix_too_many_clauses_raises(engine):
    with pytest.raises(ValueError, match="expands to more than"):
        engine.prefix_search("*", max_expansions=5)  # '' matches every term


# --- fuzzy ---

def test_fuzzy_one_edit_expands_to_table(engine):
    # 'tble' --insert 'a'--> 'table' is the only vocab term within 1 edit
    assert _rows(engine.fuzzy_search("tble", k=10, max_edits=1)) == _rows(
        engine.search(["table"], k=10)
    )


def test_fuzzy_two_edits_widens(engine):
    # within 2 edits: 'table' (1) and 'the' (2: drop 'l', sub 'b'->'h')
    assert _rows(engine.fuzzy_search("tble", k=10, max_edits=2)) == _rows(
        engine.search(["table", "the"], k=10, mode="or")
    )


def test_fuzzy_prefix_length_restricts(engine):
    # prefixLength=2 requires the 'tb' prefix -> no vocab term qualifies
    assert engine.fuzzy_search("tble", k=10, max_edits=2,
                               prefix_length=2).count() == 0


def test_fuzzy_exact_term_included(engine):
    # an exact vocab term fuzzes to itself (0 edits) plus 1-edit neighbors;
    # the synthetic vocab has no 1-edit neighbor of 'spark'
    assert _rows(engine.fuzzy_search("spark", k=10, max_edits=1)) == _rows(
        engine.search(["spark"], k=10)
    )


# --- highlight ---

def _reference_windows(raw_docs, hit_ids, terms):
    """Pure-Python minimal-window over the raw tokenized text (same
    smallest-range-covering-present-terms contract as the kernel)."""
    by_id = dict(raw_docs)
    out = {}
    for d in hit_ids:
        toks = tokenize_text(by_id[d])
        evs = sorted(
            (p, t) for p, t in enumerate(toks) if t in set(terms)
        )
        present = {t for _p, t in evs}
        need = len(present)
        best = (1 << 30, 0, 0)
        counts, covered, lo = {}, 0, 0
        for hi, (p_hi, t_hi) in enumerate(evs):
            counts[t_hi] = counts.get(t_hi, 0) + 1
            if counts[t_hi] == 1:
                covered += 1
            while covered == need:
                p_lo, t_lo = evs[lo]
                if p_hi - p_lo < best[0]:
                    best = (p_hi - p_lo, p_lo, p_hi)
                counts[t_lo] -= 1
                if counts[t_lo] == 0:
                    covered -= 1
                lo += 1
        out[d] = (best[1], best[2], need)
    return out


@pytest.mark.parametrize("terms,mode", [
    (["spark", "window"], "or"),
    (["table", "join"], "and"),
    (["merge"], "or"),
])
def test_highlight_matches_reference(engine, raw_docs, terms, mode):
    res = engine.highlight(terms, k=10, mode=mode).collect()
    hits = _rows(engine.search(terms, k=10, mode=mode))
    # same docs, same order, same scores as plain search
    assert [(r["doc_id"], round(r["score"], 6)) for r in res] == hits
    ref = _reference_windows(raw_docs, [d for d, _ in hits], terms)
    for r in res:
        start, end, need = ref[r["doc_id"]]
        assert (r["snippet_start"], r["snippet_end"],
                r["n_matched"]) == (start, end, need)
        assert r["snippet_start"] <= r["snippet_end"]


def test_highlight_empty_on_no_hits(engine):
    assert engine.highlight(["zzznope"], k=5).count() == 0
