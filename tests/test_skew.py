"""Hot-term skew behavior (SURVEY.md §4.2, §7 Phase-3 item 9).

At 10^12 files, code keywords ("def", "return") appear in nearly every
document; a term-hash-partitioned index would put one ~10^12-entry posting
list in a single task.  Our doc-sharded layout bounds every posting list by
docs_per_shard *by construction* — this test builds a Zipfian corpus where
one term occurs in ALL documents and asserts (a) the hot term's postings are
split across every shard with disjoint doc ranges, (b) exact df survives the
split (sum of per-shard n_docs, never approx), and (c) hot-term queries stay
rank-identical to the brute-force oracle.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from archivesspace_virgo_spark import codec
from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.oracle import build_oracle_index, oracle_search

CFG = IndexConfig(docs_per_shard=32, block_size=8)
N_DOCS = 400
VOCAB = 150


def zipf_doc(doc_id: int) -> str:
    """Deterministic Zipfian document: term t{r} (rank r>=1) appears when
    doc_id % r == 0 — so t1 is in every doc, t2 in half, t3 in a third...
    Repetition count also decays with rank to exercise tf variance."""
    parts = []
    for r in range(1, VOCAB + 1):
        if doc_id % r == 0:
            parts.extend([f"t{r}"] * (1 + (doc_id + r) % 3))
    return " ".join(parts)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rows = [(i, "repo0", f"f/{i}", f"c{i}", "py", zipf_doc(i)) for i in range(N_DOCS)]
    corpus = spark.createDataFrame(
        rows, "doc_id long, repo string, path string, commit string, lang string, content string"
    )
    index_dir = str(tmp_path_factory.mktemp("skewidx"))
    build_index(spark, corpus, index_dir, CFG)
    oracle = build_oracle_index([(i, zipf_doc(i)) for i in range(N_DOCS)])
    return QueryEngine(spark, index_dir, CFG), oracle


def test_hot_term_bounded_per_shard(built):
    engine, oracle = built
    post = (
        engine.storage.read(engine.spark, "postings")
        .filter(F.col("term") == "t1")
        .collect()
    )
    n_shards = -(-N_DOCS // CFG.docs_per_shard)  # ceil
    assert len(post) == n_shards  # hot term present in EVERY shard
    seen_ranges = []
    total = 0
    for r in post:
        assert r["n_docs"] <= CFG.docs_per_shard  # bounded by construction
        ids, _, _ = codec.decode_postings(r["doc_blob"], r["tf_blob"], r["dl_blob"])
        lo, hi = int(ids.min()), int(ids.max())
        assert lo // CFG.docs_per_shard == r["doc_shard"]
        assert hi // CFG.docs_per_shard == r["doc_shard"]
        seen_ranges.append((lo, hi))
        total += r["n_docs"]
    # disjoint doc ranges across shards → per-shard dfs sum exactly
    seen_ranges.sort()
    for (_, h1), (l2, _) in zip(seen_ranges, seen_ranges[1:]):
        assert h1 < l2
    assert total == N_DOCS


def test_exact_df_after_split(built):
    engine, oracle = built
    stats = engine.term_stats([f"t{r}" for r in (1, 2, 3, 7, 50, 149)])
    for t, (df, _cf) in stats.items():
        assert df == oracle.df[t], t


def test_hot_queries_rank_identical(built):
    engine, oracle = built
    for terms, mode in [
        (["t1"], "or"),                      # the pathological term alone
        (["t1", "t2", "t3"], "or"),          # all-hot disjunction
        (["t1", "t149"], "or"),              # hot + rare (MaxScore prune path)
        (["t1", "t2"], "and"),
        (["t1", "t97"], "and"),
    ]:
        expected = oracle_search(oracle, terms, k=10, mode=mode)
        got = [(r["doc_id"], r["score"]) for r in engine.search(terms, k=10, mode=mode).collect()]
        assert [d for d, _ in got] == [d for d, _ in expected], (terms, mode)
        for (_, gs), (_, es) in zip(got, expected):
            assert abs(gs - es) < 1e-6


def test_shard_task_balance(built):
    """Postings rows (≈ pack/score work) are near-uniform across shards."""
    engine, _ = built
    per_shard = (
        engine.storage.read(engine.spark, "postings")
        .groupBy("doc_shard")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    )
    ns = np.array([r["n"] for r in per_shard], dtype=float)
    assert ns.max() / ns.mean() < 1.5  # no shard dominates


def test_block_skipping_activates_and_stays_exact(spark, tmp_path, monkeypatch):
    """Force the MaxScore prune branch (rare high-idf term first, weak hot
    terms after) and assert the per-block random-access decode actually runs
    — in-process, by driving the shard scorer kernel directly — while the
    ranked result stays identical to the brute-force oracle."""
    import archivesspace_virgo_spark.codec as codec_mod
    from archivesspace_virgo_spark.config import IndexConfig
    from archivesspace_virgo_spark.corpus import load_documents_as_corpus
    from archivesspace_virgo_spark.index.build import build_index
    from archivesspace_virgo_spark.index.query import (
        QueryEngine,
        _make_shard_scorer,
        lucene_idf,
    )
    from archivesspace_virgo_spark.oracle import build_oracle_index, oracle_search

    cfg = IndexConfig(docs_per_shard=4096, block_size=16)  # one shard
    d = str(tmp_path / "idx")
    corpus = load_documents_as_corpus(spark, "/root/testdata/sf0.01")
    build_index(spark, corpus, d, cfg)
    engine = QueryEngine(spark, d, cfg)

    terms = sorted(["customer", "a", "the"])  # rare + two very hot terms
    k = 2
    stats = engine.term_stats(terms)
    assert set(stats) == set(terms)
    idfs = [lucene_idf(engine.n_docs, stats[t][0]) for t in terms]

    calls = {"n": 0}
    orig = codec_mod.decode_posting_blocks

    def counting(*a):
        calls["n"] += 1
        return orig(*a)

    monkeypatch.setattr(codec_mod, "decode_posting_blocks", counting)
    pdf = (
        engine._postings_df()
        .filter(F.col("term").isin(terms))
        .toPandas()
    )
    scorer = _make_shard_scorer(
        terms, idfs, [engine.avgdl] * len(terms), k,
        cfg.k1, cfg.b, cfg.docs_per_shard, "or",
    )
    out = scorer(pdf).sort_values(["score", "doc_id"], ascending=[False, True])
    assert calls["n"] > 0, "prune branch never used block decode"

    docs = [(r["doc_id"], r["content"])
            for r in corpus.select("doc_id", "content").collect()]
    exp = oracle_search(build_oracle_index(docs), terms, k=k)
    got = [(int(r.doc_id), round(float(r.score), 6)) for _, r in out.head(k).iterrows()]
    assert got == [(d_, round(s, 6)) for d_, s in exp]
