"""Distributed inverted-index construction (SURVEY.md §2.8-T2..T5, §7 Phase 1).

Dataflow (all declarative until the one packing UDF):

    corpus (doc_id, content, ...)                       [parquet/Iceberg scan]
      → tokens_column per indexed field (JVM split/lower/filter — codegen,
        no Python); non-default fields prefix their terms "field:token"
      → doc_stats: (doc_shard, doc_id, field, dl)       [narrow]
      → posexplode-free tf: explode(tokens) → groupBy(doc_shard, doc_id, dl,
        term).count()                                   [shuffle 1: partial
        map-side combine via hash agg]
      → repartition('doc_shard') + groupBy('doc_shard').applyInPandas(pack)
                                                        [shuffle 2: co-locate
        each shard; Arrow batch in, numpy delta-gap+varbyte out]
      → postings parquet partitioned by doc_shard, rows sorted by term so
        parquet rowgroup min/max stats prune term lookups at query time.

Scale notes (the 100 TB story):
- Shuffle 1 is the unavoidable tf aggregation; map-side combine collapses it
  to ~unique (doc, term) pairs.  Shuffle 2 moves only aggregated tf rows.
- Shards are contiguous doc_id ranges → hot terms ("def", "if") split across
  ALL shards with disjoint doc ranges: skew is bounded by shard size by
  construction (the salting scheme of SURVEY.md §4.2), and exact df is the
  sum of per-shard n_docs.
- Each shard is one applyInPandas group ≈ one task; docs_per_shard controls
  task granularity (4096 for tests; millions at cluster scale).
- Resume: shards listed in _lineage for the same input fingerprint are
  skipped; dynamic partition overwrite replaces exactly the rebuilt shards
  (reference checkpoint discipline IndexRecordsForV4.java:116-125).
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterable, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archivesspace_virgo_spark import codec
from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import assign_doc_ids, with_content_sha
from archivesspace_virgo_spark.index.storage import (
    POSTINGS_SCHEMA,
    IndexStorage,
)
from archivesspace_virgo_spark.tokenizer import tokens_column


def _make_packer(block_size: int):
    """Grouped-map packer: one call per doc_shard, loops terms in numpy."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                columns=[f.name for f in POSTINGS_SCHEMA.fields]
            )
        shard = int(pdf["doc_shard"].iloc[0])
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        uniq, starts = np.unique(terms, return_index=True)
        bounds = np.append(starts, terms.size)
        out = {
            "doc_shard": [], "term": [], "n_docs": [], "cf": [],
            "doc_blob": [], "tf_blob": [], "dl_blob": [],
            "block_last_doc": [], "block_max_tf": [], "block_min_dl": [],
        }
        for i, term in enumerate(uniq):
            s, e = bounds[i], bounds[i + 1]
            d_blob, t_blob, l_blob, b_last, b_maxtf, b_mindl = codec.encode_postings(
                doc_ids[s:e], tfs[s:e], dls[s:e], block_size
            )
            out["doc_shard"].append(shard)
            out["term"].append(str(term))
            out["n_docs"].append(int(e - s))
            out["cf"].append(int(tfs[s:e].sum()))
            out["doc_blob"].append(d_blob)
            out["tf_blob"].append(t_blob)
            out["dl_blob"].append(l_blob)
            out["block_last_doc"].append(b_last.tolist())
            out["block_max_tf"].append(b_maxtf.tolist())
            out["block_min_dl"].append(b_mindl.tolist())
        return pd.DataFrame(out)

    return pack


def tokenized(corpus: DataFrame, config: IndexConfig) -> DataFrame:
    """(doc_shard, doc_id, field, toks) — the analyzed relation (JVM-side).

    One row per (doc, indexed field); union of per-field narrow projections
    (no shuffle — unions of maps stay maps).  Missing columns raise early.
    """
    missing = [f for f in config.fields if f not in corpus.columns]
    if missing:
        raise ValueError(f"corpus lacks indexed field column(s) {missing}")
    shard = (F.col("doc_id") / F.lit(config.docs_per_shard)).cast("int")
    parts = [
        corpus.select(
            shard.alias("doc_shard"),
            "doc_id",
            F.lit(f).alias("field"),
            tokens_column(f).alias("toks"),
        )
        for f in config.fields
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def term_frequencies(toks: DataFrame, config: IndexConfig) -> DataFrame:
    """(doc_shard, doc_id, dl, term, tf) — the pre-packing long relation.

    dl is the PER-FIELD token count, carried through the explode as a
    grouping key (functionally dependent on (doc_id, field)) so no join with
    doc_stats is ever needed.  Non-default-field terms are stored prefixed
    ("field:token"), which makes (field, term) a single composite key — a
    term determines its field, so after prefixing the field column drops
    out.  Empty fields vanish here (explode of []) but stay in doc_stats.
    """
    default = config.fields[0]
    tok = F.col("tok")
    stored = F.when(F.col("field") == default, tok).otherwise(
        F.concat(F.col("field"), F.lit(":"), tok)
    )
    return (
        toks.select(
            "doc_shard",
            "doc_id",
            "field",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("tok"),
        )
        .select("doc_shard", "doc_id", "dl", stored.alias("term"))
        .groupBy("doc_shard", "doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def refresh_aggregates(spark: SparkSession, storage: IndexStorage) -> DataFrame:
    """Recompute lexicon + corpus_stats from per-shard summaries.

    Exact df: shards hold disjoint doc ranges, so summing per-shard n_docs
    is the two-level exact-df aggregation of SURVEY.md §4.2 (never
    approx_count_distinct — BM25 rank-identity needs exact df).
    Returns the postings DataFrame for reuse.
    """
    postings = storage.read(spark, "postings")
    lexicon = postings.groupBy("term").agg(
        F.sum("n_docs").alias("df"), F.sum("cf").alias("cf")
    )
    storage.write(lexicon, "lexicon")
    all_stats = storage.read(spark, "doc_stats")
    corpus_stats = all_stats.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        F.avg("dl").alias("avgdl"),
    )
    storage.write(corpus_stats, "corpus_stats")
    return postings


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    config: Optional[IndexConfig] = None,
    build_id: Optional[str] = None,
    input_fingerprint: Optional[str] = None,
    resume: bool = False,
    only_shards: Optional[Iterable[int]] = None,
) -> dict:
    """Full (or shard-scoped) index build.

    ``corpus`` must have ``content``; if it lacks ``doc_id`` one is assigned
    deterministically from (repo, path, commit).  ``only_shards`` restricts
    the build to specific doc_shards (used by incremental merge and by the
    resume test to simulate a mid-build failure).
    Returns build metadata dict.
    """
    config = config or IndexConfig()
    build_id = build_id or uuid.uuid4().hex[:12]
    storage = IndexStorage(index_dir)
    t0 = time.time()

    if "doc_id" not in corpus.columns:
        corpus = assign_doc_ids(corpus)
    if "content_sha256" not in corpus.columns:
        corpus = with_content_sha(corpus)

    shard_col = (F.col("doc_id") / F.lit(config.docs_per_shard)).cast("int")
    corpus = corpus.withColumn("doc_shard", shard_col)

    fingerprint = input_fingerprint or build_id
    done: List[int] = (
        storage.completed_shards(spark, fingerprint) if resume else []
    )
    if done:
        corpus = corpus.filter(~F.col("doc_shard").isin(done))
    if only_shards is not None:
        corpus = corpus.filter(F.col("doc_shard").isin(list(only_shards)))

    corpus = corpus.cache()  # reused by doc_map, stats and postings passes
    n_docs_built = corpus.count()
    if n_docs_built == 0:
        corpus.unpersist()
        # nothing to build, but a deletion-only update still needs fresh
        # global aggregates over the surviving shards
        if os.path.exists(storage.path("postings")):
            refresh_aggregates(spark, storage)
            storage.write_commit(config, build_id, {"input_fingerprint": fingerprint})
        return {"build_id": build_id, "n_docs": 0, "shards": [], "elapsed_sec": 0.0}

    # --- doc_map (identity + ingest invariant; facet columns live here) ---
    meta_cols = [c for c in ["repo", "path", "commit", "lang"] if c in corpus.columns]
    doc_map = corpus.select("doc_shard", "doc_id", *meta_cols, "content_sha256")
    storage.write(doc_map.repartition("doc_shard"), "doc_map", partition_shards=True)

    # --- tf relation + doc stats (doc_stats BEFORE explode so dl=0 docs
    # still count toward N / avgdl, matching the oracle) ---
    toks = tokenized(corpus, config)
    doc_stats = toks.select(
        "doc_shard", "doc_id", "field", F.size("toks").alias("dl")
    )
    storage.write(
        doc_stats.repartition("doc_shard"), "doc_stats", partition_shards=True
    )
    tf = term_frequencies(toks, config)

    # --- pack postings per shard ---
    packed = (
        tf.repartition("doc_shard")
        .groupBy("doc_shard")
        .applyInPandas(_make_packer(config.block_size), schema=POSTINGS_SCHEMA)
    )
    storage.write(packed, "postings", partition_shards=True)

    # --- global aggregates (tiny: one row per term / one row total) ---
    postings = refresh_aggregates(spark, storage)

    # --- lineage (per-shard checkpoint rows) + metrics + commit marker ---
    shard_summary = (
        postings.groupBy("doc_shard")
        .agg(F.sum("n_docs").alias("n_postings"), F.count(F.lit(1)).alias("n_terms"))
        .withColumn("build_id", F.lit(build_id))
        .withColumn("input_fingerprint", F.lit(fingerprint))
        .withColumn("finished_at", F.lit(time.time()))
    )
    built_shards = [r["doc_shard"] for r in corpus.select("doc_shard").distinct().collect()]
    storage.append(
        shard_summary.filter(F.col("doc_shard").isin(built_shards)).select(
            "build_id", "doc_shard", "input_fingerprint",
            F.col("n_postings"), "n_terms", "finished_at",
        ),
        "_lineage",
    )
    elapsed = time.time() - t0
    storage.log_metrics(
        spark, build_id, "build",
        {"n_docs": n_docs_built, "n_shards": len(built_shards),
         "elapsed_sec": elapsed, "docs_per_sec": n_docs_built / max(elapsed, 1e-9)},
    )
    storage.write_commit(config, build_id, {"input_fingerprint": fingerprint})
    corpus.unpersist()
    return {
        "build_id": build_id,
        "n_docs": n_docs_built,
        "shards": sorted(built_shards),
        "elapsed_sec": elapsed,
    }
