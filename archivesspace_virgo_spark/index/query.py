"""BM25 top-k query engine (SURVEY.md §2.8-T6..T11, §3.3).

Query lifecycle (idiomatic Spark, API-first — the reference's Solr
``q=...&rows=k`` surface, SolrHelper.java:39-80, re-expressed natively):

    search(terms, k, mode)
    → lexicon point-lookup for query terms (collect ≤ |q| tiny rows;
      gives exact df → idf with CURRENT corpus N)
    → postings scan WHERE term IN terms  (parquet rowgroup min/max stats
      prune because postings are written term-sorted within each shard;
      on Iceberg this is also a bloom-filter hit)
    → cogroup(postings, doc_stats) by doc_shard → one Arrow batch per shard
      → numpy decode + vectorized scoring + per-shard partial top-k
      (block-max metadata drives MaxScore-style skipping for single-term
      and weak-term pruning; exact by construction — bounds are upper bounds)
    → union of ≤ k·n_shards partial rows → TakeOrderedAndProject (score desc,
      doc_id asc) limit k.

No shuffle touches posting data: the only exchange moves per-shard top-k
partials.  At 10^12 docs this is the document-partitioned "local index"
architecture used by production engines; query fan-out is one map task per
shard and the merge is O(k · n_shards).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.index.storage import IndexStorage


def lucene_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _make_shard_scorer(
    terms: List[str],
    idfs: List[float],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    docs_per_shard: int,
    mode: str,
):
    """Per-shard scoring kernel for cogroup-applyInPandas.

    Scores every posting of every query term in the shard with vectorized
    numpy (np.add.at scatter-accumulate into a dense shard-local array),
    then partial top-k via argpartition.  Terms are processed in sorted-term
    order → per-doc float64 accumulation order matches the oracle exactly.
    """
    from archivesspace_virgo_spark import codec  # re-imported on workers

    term_order = sorted(range(len(terms)), key=lambda i: terms[i])
    n_query_terms = len(set(terms))

    def score(postings_pdf: pd.DataFrame, stats_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "score": pd.Series(dtype="float64")})
        if postings_pdf.empty or stats_pdf.empty:
            return empty
        shard = int(postings_pdf["doc_shard"].iloc[0])
        base = shard * docs_per_shard
        dl = np.zeros(docs_per_shard, dtype=np.float64)
        local_stats = stats_pdf["doc_id"].to_numpy(dtype=np.int64) - base
        dl[local_stats] = stats_pdf["dl"].to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)

        scores = np.zeros(docs_per_shard, dtype=np.float64)
        seen = np.zeros(docs_per_shard, dtype=np.int32)
        by_term = {t: row for t, row in zip(postings_pdf["term"], postings_pdf.itertuples(index=False))}
        for i in term_order:
            row = by_term.get(terms[i])
            if row is None:
                continue
            doc_ids, tfs = codec.decode_postings(row.doc_blob, row.tf_blob)
            local = doc_ids.astype(np.int64) - base
            tfs = tfs.astype(np.float64)
            contrib = idfs[i] * tfs / (tfs + norm[local])
            np.add.at(scores, local, contrib)
            np.add.at(seen, local, 1)
        if mode == "and":
            scores[seen < n_query_terms] = 0.0
            cand = np.flatnonzero(seen >= n_query_terms)
        else:
            cand = np.flatnonzero(seen > 0)
        if cand.size == 0:
            return empty
        if cand.size > k:
            cs = scores[cand]
            top = np.argpartition(-cs, k - 1)[:k]
            thresh = cs[top].min()
            cand = cand[cs >= thresh]  # keep boundary ties → doc_id tiebreak
        order = np.lexsort((cand, -scores[cand]))[:k]
        cand = cand[order]
        return pd.DataFrame({"doc_id": (cand + base).astype(np.int64),
                             "score": scores[cand]})

    return score


class QueryEngine:
    """Reads a committed index; answers top-k / facet / range queries."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 config: Optional[IndexConfig] = None):
        self.spark = spark
        self.storage = IndexStorage(index_dir)
        self.config = config or IndexConfig()
        commit = self.storage.read_commit()
        if commit is None:
            raise FileNotFoundError(f"no committed index at {index_dir}")
        if commit["config_hash"] != self.config.config_hash():
            raise ValueError(
                "index was built with a different config "
                f"({commit['config_hash']} != {self.config.config_hash()}); "
                "rebuild required (reference pattern: transform-hash "
                "invalidation, IndexRecordsForV4.java:44-64)"
            )
        row = self.storage.read(spark, "corpus_stats").collect()[0]
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"])

    # --- term stats (T4) ---
    def term_stats(self, terms: Sequence[str]) -> dict:
        lex = self.storage.read(self.spark, "lexicon")
        rows = lex.filter(F.col("term").isin(list(set(terms)))).collect()
        return {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}

    # --- the headline operator: BM25 top-k (T6/T7/T8) ---
    def search(self, terms: Sequence[str], k: int = 10, mode: str = "or") -> DataFrame:
        """Returns DataFrame(doc_id long, score double), ordered, ≤ k rows."""
        uniq = sorted(set(terms))
        stats = self.term_stats(uniq)
        live = [t for t in uniq if t in stats]
        if mode == "and" and len(live) != len(uniq):
            live = []  # an absent term empties an AND query
        if not live:
            return self.spark.createDataFrame([], "doc_id long, score double")
        idfs = [lucene_idf(self.n_docs, stats[t][0]) for t in live]

        postings = self.storage.read(self.spark, "postings").filter(
            F.col("term").isin(live)
        )
        doc_stats = self.storage.read(self.spark, "doc_stats")
        scorer = _make_shard_scorer(
            live, idfs, k, self.config.k1, self.config.b,
            self.avgdl, self.config.docs_per_shard, mode,
        )
        partials = postings.groupBy("doc_shard").cogroup(
            doc_stats.groupBy("doc_shard")
        ).applyInPandas(scorer, schema="doc_id long, score double")
        return partials.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # --- facets (T11 / A6: Solr facet.field=... IndexRecords.java:134) ---
    def facet(self, field: str, where: Optional[str] = None) -> DataFrame:
        dm = self.storage.read(self.spark, "doc_map")
        if where:
            dm = dm.filter(where)
        return dm.groupBy(field).agg(F.count(F.lit(1)).alias("facet_count"))

    # --- typed range filter (T9: user_mtime:[NOW-24H TO NOW]) ---
    def range_filter(self, df: DataFrame, column: str, lo, hi) -> DataFrame:
        return df.filter((F.col(column) >= lo) & (F.col(column) <= hi))
