"""Boolean MUST_NOT + the rest of the Lucene query family (wildcard /
regexp / term-range rewrites, spell suggest, MoreLikeThis) — the remaining
Solr select-handler syntax (``q=a -b``, ``q=te*t``, ``q=/re/``,
``q=[a TO b]``, spellcheck, mlt) the reference programs against,
SolrHelper.java:39-80.

Exclusion is applied INSIDE the per-shard scoring kernel (a shard-local
mask decoded from the excluded terms' own postings rows — no extra shuffle,
pruning stays exact), so every test here pins rank-identity against the
brute-force numpy oracle with the same contract.
"""

import math

import pytest

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import load_documents_as_corpus
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine, lucene_idf
from archivesspace_virgo_spark.oracle import build_oracle_index, oracle_search
from archivesspace_virgo_spark.tokenizer import tokenize_text

from tests.conftest import SF_SMOKE

CFG = IndexConfig(docs_per_shard=64, block_size=16)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bool_idx"))
    corpus = load_documents_as_corpus(spark, SF_SMOKE)
    build_index(spark, corpus, d, CFG)
    docs = [(r["doc_id"], r["content"])
            for r in corpus.select("doc_id", "content").collect()]
    return QueryEngine(spark, d, CFG), build_oracle_index(docs), docs


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def _exp(pairs):
    return [(int(d), round(s, 6)) for d, s in pairs]


# --- MUST_NOT ---

@pytest.mark.parametrize("terms,mode,exclude", [
    (["spark", "window"], "or", ["merge"]),
    (["spark", "window"], "and", ["merge"]),
    (["table"], "or", ["join", "scan"]),
    (["path", "spark"], "or", ["the"]),        # exclude a stopword-hot term
])
def test_must_not_rank_identity(built, terms, mode, exclude):
    engine, oracle, _ = built
    got = _rows(engine.search(terms, k=10, mode=mode, exclude=exclude))
    exp = _exp(oracle_search(oracle, terms, k=10, mode=mode, exclude=exclude))
    assert got == exp


def test_must_not_is_pure_filter(built):
    # surviving docs keep their un-excluded score bit-for-bit
    engine, oracle, _ = built
    full = dict(_rows(engine.search(["spark", "window"], k=500)))
    excl = _rows(engine.search(["spark", "window"], k=10, exclude=["merge"]))
    for doc_id, score in excl:
        assert full[doc_id] == score


def test_must_not_absent_term_is_noop(built):
    engine, _, _ = built
    assert _rows(engine.search(["spark"], k=10, exclude=["zzznope"])) == _rows(
        engine.search(["spark"], k=10)
    )


def test_must_not_self_exclusion_empties(built):
    # q=spark -spark: every matching doc is excluded (Lucene semantics)
    engine, _, _ = built
    assert engine.search(["spark"], k=10, exclude=["spark"]).count() == 0


def test_must_not_with_paging(built):
    engine, _, _ = built
    full = _rows(engine.search(["spark", "table"], k=10, exclude=["join"]))
    page2 = _rows(engine.search(["spark", "table"], k=5, offset=5,
                                exclude=["join"]))
    assert page2 == full[5:]


def test_match_ids_exclusion(built):
    engine, oracle, _ = built
    got = sorted(r["doc_id"] for r in
                 engine.match_ids(["spark"], exclude=["merge"]).collect())
    exp = sorted(
        d for d, tfs in zip(oracle.doc_ids, oracle.doc_tfs)
        if "spark" in tfs and "merge" not in tfs
    )
    assert got == exp


def test_facet_search_exclusion(built, spark):
    engine, oracle, _ = built
    got = {r["lang"]: r["facet_count"] for r in
           engine.facet_search(["spark"], "lang", exclude=["merge"]).collect()}
    # reference: lang facet over the brute-force surviving doc set
    dm = engine.storage.read(spark, "doc_map").select("doc_id", "lang").collect()
    lang_of = {r["doc_id"]: r["lang"] for r in dm}
    exp: dict = {}
    for d, tfs in zip(oracle.doc_ids, oracle.doc_tfs):
        if "spark" in tfs and "merge" not in tfs:
            exp[lang_of[d]] = exp.get(lang_of[d], 0) + 1
    assert got == exp


# --- boosts (Lucene BoostQuery / Solr q=term^2) ---

@pytest.mark.parametrize("boosts", [
    {"window": 3.0},
    {"spark": 0.25, "window": 2.0},
])
def test_boost_rank_identity(built, boosts):
    engine, oracle, _ = built
    got = _rows(engine.search(["spark", "window"], k=10, boosts=boosts))
    exp = _exp(oracle_search(oracle, ["spark", "window"], k=10, boosts=boosts))
    assert got == exp


def test_boost_one_is_identity(built):
    engine, _, _ = built
    assert _rows(engine.search(["spark", "window"], k=10,
                               boosts={"spark": 1.0})) == _rows(
        engine.search(["spark", "window"], k=10)
    )


def test_boost_reweights_ranking(built):
    # heavily boosting one clause must pull its best doc to the top
    engine, _, _ = built
    best_window = _rows(engine.search(["window"], k=1))[0][0]
    boosted = _rows(engine.search(["spark", "window"], k=1,
                                  boosts={"window": 100.0}))
    assert boosted[0][0] == best_window


def test_boost_composes_with_exclude(built):
    engine, oracle, _ = built
    got = _rows(engine.search(["spark", "window"], k=10,
                              boosts={"window": 2.0}, exclude=["merge"]))
    exp = _exp(oracle_search(oracle, ["spark", "window"], k=10,
                             boosts={"window": 2.0}, exclude=["merge"]))
    assert got == exp


# --- count (Solr numFound) ---

def test_count_matches_brute_force(built):
    engine, oracle, _ = built
    exp = sum(1 for tfs in oracle.doc_tfs if "spark" in tfs)
    assert engine.count(["spark"]) == exp
    exp_and = sum(1 for tfs in oracle.doc_tfs
                  if "spark" in tfs and "window" in tfs)
    assert engine.count(["spark", "window"], mode="and") == exp_and
    exp_not = sum(1 for tfs in oracle.doc_tfs
                  if "spark" in tfs and "merge" not in tfs)
    assert engine.count(["spark"], exclude=["merge"]) == exp_not
    assert engine.count(["zzznope"]) == 0


# --- wildcard ---

def test_wildcard_question_mark(built):
    engine, oracle, _ = built
    exp_terms = sorted(t for t in oracle.df
                       if len(t) == 4 and t[0] == "s" and t[2:] == "an")
    assert exp_terms  # vocab sanity: 'scan' exists
    assert _rows(engine.wildcard_search("s?an", k=10)) == _rows(
        engine.search(exp_terms, k=10)
    )


def test_wildcard_star_equals_prefix(built):
    engine, _, _ = built
    assert _rows(engine.wildcard_search("s*", k=10)) == _rows(
        engine.prefix_search("s*", k=10)
    )


def test_wildcard_leading_star(built):
    engine, oracle, _ = built
    exp_terms = sorted(t for t in oracle.df if t.endswith("an"))
    assert _rows(engine.wildcard_search("*an", k=10)) == _rows(
        engine.search(exp_terms, k=10)
    )


def test_wildcard_is_anchored(built):
    # no wildcard chars → exact term match, not substring
    engine, _, _ = built
    assert _rows(engine.wildcard_search("scan", k=10)) == _rows(
        engine.search(["scan"], k=10)
    )


# --- regexp ---

def test_regexp_alternation(built):
    engine, _, _ = built
    assert _rows(engine.regexp_search("s(can|low)", k=10)) == _rows(
        engine.search(["scan", "slow"], k=10)
    )


def test_regexp_whole_term_anchoring(built):
    engine, oracle, _ = built
    # 'par' as a regexp matches only a whole term 'par' (absent), never
    # the substring inside 'spark' — Lucene RegexpQuery contract
    assert "par" not in oracle.df
    assert engine.regexp_search("par", k=10).count() == 0


def test_regexp_dot_runs(built):
    engine, oracle, _ = built
    exp_terms = sorted(t for t in oracle.df
                       if len(t) == 4 and t.startswith("s"))
    assert _rows(engine.regexp_search("s...", k=10)) == _rows(
        engine.search(exp_terms, k=10)
    )


# --- term range ---

def test_term_range_inclusive(built):
    engine, oracle, _ = built
    exp_terms = sorted(t for t in oracle.df if "scan" <= t <= "sort")
    assert _rows(engine.term_range_search("scan", "sort", k=10)) == _rows(
        engine.search(exp_terms, k=10)
    )


def test_term_range_exclusive_and_open(built):
    engine, oracle, _ = built
    exp_terms = sorted(t for t in oracle.df if "scan" < t < "sort")
    assert _rows(
        engine.term_range_search("scan", "sort", k=10,
                                 include_lo=False, include_hi=False)
    ) == _rows(engine.search(exp_terms, k=10))
    exp_hi = sorted(t for t in oracle.df if t >= "window")
    assert _rows(engine.term_range_search("window", None, k=10)) == _rows(
        engine.search(exp_hi, k=10)
    )


# --- suggest ---

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_suggest_matches_reference_ordering(built):
    engine, oracle, _ = built
    got = [(r["term"], r["df"], r["distance"])
           for r in engine.suggest("tble", n=5, max_edits=2).collect()]
    cands = [
        (t, oracle.df[t], _lev(t, "tble"))
        for t in oracle.df
        if t != "tble" and t.startswith("t") and _lev(t, "tble") <= 2
    ]
    exp = sorted(cands, key=lambda it: (it[2], -it[1], it[0]))[:5]
    assert got == exp
    assert got and got[0][0] == "table"  # the 1-edit fix ranks first


def test_suggest_excludes_input_term(built):
    engine, _, _ = built
    got = [r["term"] for r in engine.suggest("table", n=10,
                                             max_edits=2).collect()]
    assert "table" not in got


# --- more like this ---

def test_more_like_this_matches_reference(built):
    engine, oracle, docs = built
    seed_id, seed_text = docs[7]
    # reference interesting-terms ranking: seed-tf * idf, ties by term
    from collections import Counter
    tf = Counter(tokenize_text(seed_text))
    ranked = sorted(
        ((c * lucene_idf(oracle.n_docs, oracle.df[t]), t)
         for t, c in tf.items() if t in oracle.df),
        key=lambda it: (-it[0], it[1]),
    )
    top = [t for _s, t in ranked[:5]]
    exp_with_seed = oracle_search(oracle, top, k=11)
    exp = _exp([p for p in exp_with_seed if p[0] != seed_id][:10])
    got = _rows(engine.more_like_this(seed_text, k=10, max_query_terms=5,
                                      exclude_doc_id=seed_id))
    assert got == exp
    # seed doc itself ranks (near-)first without exclusion
    with_seed = _rows(engine.more_like_this(seed_text, k=10,
                                            max_query_terms=5))
    assert with_seed == _exp(exp_with_seed[:10])
    assert seed_id in [d for d, _ in with_seed]


def test_more_like_this_df_bounds(built):
    engine, oracle, docs = built
    _seed_id, seed_text = docs[7]
    # max_doc_freq_pct=0 filters every term -> empty result
    assert engine.more_like_this(seed_text, k=5,
                                 max_doc_freq_pct=0.0).count() == 0
    # min_doc_freq beyond corpus size likewise
    assert engine.more_like_this(seed_text, k=5,
                                 min_doc_freq=10 ** 9).count() == 0
