"""Distributed inverted-index construction (SURVEY.md §2.8-T2..T5, §7 Phase 1).

Dataflow — ONE shuffle total:

    corpus (doc_id, content, ...)                       [parquet/Iceberg scan]
      → repartition(n_part, doc_shard), cached          [THE shuffle: raw
        corpus bytes, 5-10x smaller than the exploded token relation]
      → doc_map  (identity + sha256)                    [partition-local write]
      → tokenized: explode of per-field token structs (JVM codegen
        lower/split/filter; non-default fields prefixed "field:token";
        Generate preserves the doc_shard partitioning)
      → doc_stats (doc_shard, doc_id, field, dl)        [partition-local write]
      → groupBy(doc_shard).applyInPandas(pack): partition-LOCAL sort, no
        exchange; the kernel does tf aggregation (pandas groupby) + delta-gap
        + varbyte + block-max in numpy per shard
      → postings parquet partitioned by doc_shard, rows sorted by term so
        parquet rowgroup min/max stats prune term lookups at query time.

Scale notes (the 100 TB story):
- Tokens, tf rows and blobs NEVER cross an exchange; the only shuffled bytes
  are the raw corpus, once.  (An earlier 4-exchange design — tf groupBy +
  three per-table repartitions — spent more time in shuffle + write commits
  than in real work and scaled at 0.4; this layout is what made the N-vs-4N
  efficiency target reachable.)
- Shards are contiguous doc_id ranges → hot terms ("def", "if") split across
  ALL shards with disjoint doc ranges: skew is bounded by shard size by
  construction (the salting scheme of SURVEY.md §4.2), and exact df is the
  sum of per-shard n_docs.
- Each shard is one applyInPandas group; docs_per_shard controls kernel
  memory (4096 for tests; millions at cluster scale — size so one shard's
  tokens fit an Arrow batch comfortably).
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
from pyspark.sql.window import Window

from archivesspace_virgo_spark import codec
from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import assign_doc_ids, with_content_sha
from archivesspace_virgo_spark.index.storage import (
    POSTINGS_SCHEMA,
    IndexStorage,
)
from archivesspace_virgo_spark.tokenizer import tokens_column


def _pack_occurrences(
    shard: int, codes, uniq_terms, doc_ids, dls, positions, block_size: int
) -> pd.DataFrame:
    """Encode raw token OCCURRENCES into one posting row per term.

    Input: one entry per token occurrence — its term as a code into the
    LEXICOGRAPHICALLY SORTED ``uniq_terms`` (the caller factorizes:
    Arrow ``dictionary_encode`` + an argsort of the uniques only — a C++
    hash pass over the occurrence stream; ``pd.factorize`` hashed the
    same stream through Python string objects and ``np.unique`` would
    comparison-sort every occurrence), plus doc_id, dl, and position
    within the doc's field token stream.  Everything — tf aggregation,
    delta-gap, varbyte, positions, block-max — is computed with batched
    numpy over the whole shard at once; the only per-term Python work is
    slicing the pre-encoded byte stream
    (``codec.varbyte_encode_segments``).  This replaces the round-1
    per-term interpreter loop that bounded build CPU.
    """
    n = codes.size
    cols = [f.name for f in POSTINGS_SCHEMA.fields]
    if n == 0:
        return pd.DataFrame(columns=cols)
    # stable lexsort on (term, doc): occurrences are generated in ascending
    # position order per (doc, field) and a term never spans fields, so
    # positions stay ascending within each posting without a third sort key
    order = np.lexsort((doc_ids, codes))
    codes = codes[order]
    docs = doc_ids[order]
    dls = dls[order]
    poss = positions[order]

    # posting boundaries: one posting per (term, doc)
    newpost = np.empty(n, dtype=bool)
    newpost[0] = True
    newpost[1:] = (codes[1:] != codes[:-1]) | (docs[1:] != docs[:-1])
    p_start = np.flatnonzero(newpost)
    tf = np.diff(np.append(p_start, n))
    post_doc = docs[p_start]
    post_dl = dls[p_start]
    post_code = codes[p_start]
    m = p_start.size

    # per-posting position deltas (first absolute, then gaps; ascending
    # within a posting by the lexsort)
    pos_d = np.empty(n, dtype=np.int64)
    pos_d[0] = poss[0]
    pos_d[1:] = poss[1:] - poss[:-1]
    pos_d[p_start] = poss[p_start]

    # term boundaries over postings
    t_new = np.empty(m, dtype=bool)
    t_new[0] = True
    t_new[1:] = post_code[1:] != post_code[:-1]
    t_start = np.flatnonzero(t_new)
    t_end = np.append(t_start[1:], m)
    n_terms = t_start.size

    # per-term doc-id gaps (first absolute)
    gap = np.empty(m, dtype=np.int64)
    gap[0] = post_doc[0]
    gap[1:] = post_doc[1:] - post_doc[:-1]
    gap[t_start] = post_doc[t_start]

    doc_blobs, doc_voff = codec.varbyte_encode_segments(
        gap.astype(np.uint64), t_start, return_value_offsets=True
    )
    tf_blobs, tf_voff = codec.varbyte_encode_segments(
        tf.astype(np.uint64), t_start, return_value_offsets=True
    )
    dl_blobs, dl_voff = codec.varbyte_encode_segments(
        post_dl.astype(np.uint64), t_start, return_value_offsets=True
    )
    pos_blobs = codec.varbyte_encode_segments(
        pos_d.astype(np.uint64), p_start[t_start]
    )

    # block-max metadata: fixed-size blocks WITHIN each term's posting list.
    # Block starts partition [0, m), so one reduceat per stat covers all
    # terms at once.
    counts = t_end - t_start
    nb = (counts + block_size - 1) // block_size
    total_blocks = int(nb.sum())
    block_term = np.repeat(np.arange(n_terms), nb)
    nb_prefix = np.concatenate([[0], np.cumsum(nb)[:-1]])
    within = np.arange(total_blocks) - nb_prefix[block_term]
    block_start = t_start[block_term] + within * block_size
    block_end = np.minimum(block_start + block_size, t_end[block_term])
    b_maxtf = np.maximum.reduceat(tf, block_start)
    b_mindl = np.minimum.reduceat(post_dl, block_start)
    b_last = post_doc[block_end - 1]
    # per-block byte offsets into each blob, RELATIVE to the term's segment
    # start — the random-access handles for per-block (WAND-style) decode
    b_doc_off = doc_voff[block_start] - doc_voff[t_start][block_term]
    b_tf_off = tf_voff[block_start] - tf_voff[t_start][block_term]
    b_dl_off = dl_voff[block_start] - dl_voff[t_start][block_term]
    nb_bounds = np.cumsum(nb)[:-1]
    b_last_per = np.split(b_last, nb_bounds)
    b_maxtf_per = np.split(b_maxtf, nb_bounds)
    b_mindl_per = np.split(b_mindl, nb_bounds)
    b_doc_off_per = np.split(b_doc_off, nb_bounds)
    b_tf_off_per = np.split(b_tf_off, nb_bounds)
    b_dl_off_per = np.split(b_dl_off, nb_bounds)

    # per-term cf (sum of tfs) via reduceat over postings
    cf = np.add.reduceat(tf, t_start)
    return pd.DataFrame({
        "doc_shard": np.full(n_terms, shard, dtype=np.int32),
        "term": np.asarray(uniq_terms, dtype=object),
        "n_docs": counts.astype(np.int32),
        "cf": cf.astype(np.int64),
        "doc_blob": doc_blobs,
        "tf_blob": tf_blobs,
        "dl_blob": dl_blobs,
        "pos_blob": pos_blobs,
        "block_last_doc": [b.tolist() for b in b_last_per],
        "block_max_tf": [b.tolist() for b in b_maxtf_per],
        "block_min_dl": [b.tolist() for b in b_mindl_per],
        "block_doc_off": [b.tolist() for b in b_doc_off_per],
        "block_tf_off": [b.tolist() for b in b_tf_off_per],
        "block_dl_off": [b.tolist() for b in b_dl_off_per],
    })


def _make_packer(block_size: int, fields: tuple = ("content",)):
    """Grouped-map packer over RAW FIELD TEXT: one call per doc_shard with
    rows (doc_shard, doc_id, <field columns...>).

    Tokenization AND tf aggregation happen here, inside the Python worker:
    - Arrow ships raw content bytes (5-10x smaller than an exploded token
      relation), and tokens never exist JVM-side at all.  A JVM
      `split(lower(...))` materializes one UTF8String per token — at
      realistic file sizes that allocation storm hits a GC wall that stops
      scaling past ~8 threads in one JVM, while Python workers are separate
      processes that tokenize embarrassingly parallel.
    - the tokenizer is the literal shared `tokenize_series` (oracle parity
      by construction, SURVEY §2.8-T1).
    dl is the per-(doc, field) token count; non-default fields are stored
    prefix-composite ("field:token"), so each (term, doc) has exactly one dl.
    """
    from archivesspace_virgo_spark.tokenizer import tokenize_flat

    default = fields[0]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        empty = pd.DataFrame(columns=[f.name for f in POSTINGS_SCHEMA.fields])
        if pdf.empty:
            return empty
        shard = int(pdf["doc_shard"].iloc[0])
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        doc_parts, dl_parts, term_parts, pos_parts = [], [], [], []
        for f in fields:
            flat, lens = tokenize_flat(pdf[f])
            total = int(lens.sum())
            if total == 0:
                continue
            doc_parts.append(np.repeat(doc_ids, lens))
            dl_parts.append(np.repeat(lens, lens))
            # token position within the doc's field stream (0-based): a
            # single arange minus each doc's broadcast start offset
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos_parts.append(np.arange(total, dtype=np.int64)
                             - np.repeat(starts, lens))
            if not isinstance(flat, pa.Array):  # unicode fallback path
                flat = pa.array(flat, type=pa.string())
            if f != default:
                # prefix-composite terms, vectorized over the FLAT token
                # array (one Arrow element-wise join, no per-row loop)
                flat = pc.binary_join_element_wise(f + ":", flat, "")
            term_parts.append(flat)
        if not term_parts:
            return empty
        # factorize the occurrence stream Arrow-side: a C++ hash encode
        # over string views (no per-token Python objects), then sort the
        # UNIQUES only and remap codes — pd.factorize(sort=True) semantics
        enc = pc.dictionary_encode(
            pa.concat_arrays(term_parts) if len(term_parts) > 1
            else term_parts[0]
        )
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_numpy(zero_copy_only=False)
        perm = np.argsort(uniq)
        rank = np.empty(perm.size, dtype=np.int64)
        rank[perm] = np.arange(perm.size)
        return _pack_occurrences(
            shard,
            rank[idx],
            uniq[perm],
            np.concatenate(doc_parts),
            np.concatenate(dl_parts),
            np.concatenate(pos_parts),
            block_size,
        )

    return pack


def tokenized(corpus: DataFrame, config: IndexConfig) -> DataFrame:
    """(doc_shard, doc_id, field, toks) — the analyzed relation (JVM-side).

    One row per (doc, indexed field), produced by explode of a per-field
    struct array rather than a union: Generate preserves the child's output
    partitioning on ``doc_shard``, so a downstream groupBy(doc_shard) needs
    only a partition-local sort — no shuffle (a union would erase the
    partitioning info and force one).  Non-default-field tokens are prefixed
    "field:token" here, inside codegen.  Missing columns raise early.
    """
    missing = [f for f in config.fields if f not in corpus.columns]
    if missing:
        raise ValueError(f"corpus lacks indexed field column(s) {missing}")
    default = config.fields[0]

    def toks_of(f: str):
        toks = tokens_column(f)
        if f == default:
            return toks
        return F.transform(toks, lambda t: F.concat(F.lit(f + ":"), t))

    if "doc_shard" in corpus.columns:
        # keep the existing attribute (an alias would mint a new attribute id
        # and break output-partitioning propagation past the projection)
        shard_col = "doc_shard"
    else:
        corpus = corpus.withColumn(
            "doc_shard",
            (F.col("doc_id") / F.lit(config.docs_per_shard)).cast("int"),
        )
        shard_col = "doc_shard"
    per_field = F.array(
        *[
            F.struct(F.lit(f).alias("field"), toks_of(f).alias("toks"))
            for f in config.fields
        ]
    )
    return corpus.select(
        shard_col,
        "doc_id",
        F.explode(per_field).alias("_ft"),
    ).select(
        "doc_shard",
        "doc_id",
        F.col("_ft.field").alias("field"),
        F.col("_ft.toks").alias("toks"),
    )


def term_frequencies(toks: DataFrame, config: IndexConfig) -> DataFrame:
    """(doc_shard, doc_id, dl, term, tf) — the declarative tf relation.

    Retained as the pure-DataFrame rendering (tests / ad-hoc analysis); the
    build path computes the same aggregation inside the pack kernel so
    tokens never shuffle.  Tokens arrive from ``tokenized`` already
    field-prefixed; dl is the per-(doc, field) token count, carried through
    the explode as a grouping key (a term determines its field, so each
    (term, doc) pair has exactly one dl).
    """
    return (
        toks.select(
            "doc_shard",
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
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


def quarantine_invalid(
    corpus: DataFrame, storage: IndexStorage, build_id: str,
    config: Optional[IndexConfig] = None,
) -> DataFrame:
    """Fail-soft row-level error isolation (reference: per-record try/catch
    with run-level error reporting, IndexRecords.java:97-101, 110-115).

    Rows that cannot be indexed — null/negative doc_id, a null value in any
    indexed field, or a duplicate doc_id (identity violation) — are appended
    to the ``_errors`` table with a reason instead of failing the build; the
    caller can assert on the table afterwards (the reference exits nonzero
    if any errors).  Returns the clean corpus.
    """
    fields = (config or IndexConfig()).fields
    reason = F.when(F.col("doc_id").isNull(), "null_doc_id").when(
        F.col("doc_id") < 0, "negative_doc_id"
    )
    for fld in fields:
        reason = reason.when(F.col(fld).isNull(), f"null_{fld}")
    reason = reason.when(
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")) > 1,
        "duplicate_doc_id",
    )
    flagged = corpus.withColumn("_reason", reason)
    bad = flagged.filter(F.col("_reason").isNotNull())
    if not bad.isEmpty():
        path_col = (
            F.col("path") if "path" in corpus.columns
            else F.lit(None).cast("string")
        )
        storage.append(
            bad.select(
                F.lit(build_id).alias("build_id"),
                F.col("doc_id").cast("long").alias("doc_id"),
                path_col.alias("path"),
                F.col("_reason").alias("reason"),
                F.lit(time.time()).alias("ts"),
            ),
            "_errors",
        )
    return flagged.filter(F.col("_reason").isNull()).drop("_reason")


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    config: Optional[IndexConfig] = None,
    build_id: Optional[str] = None,
    input_fingerprint: Optional[str] = None,
    resume: bool = False,
    only_shards: Optional[Iterable[int]] = None,
    validate: bool = False,
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

    missing = [f for f in config.fields if f not in corpus.columns]
    if missing:
        raise ValueError(f"corpus lacks indexed field column(s) {missing}")
    if "doc_id" not in corpus.columns:
        corpus = assign_doc_ids(corpus)
    if validate:
        # opt-in: the duplicate-id window adds a shuffle, so validation is an
        # ingest-boundary step, not part of the steady-state rebuild path
        corpus = quarantine_invalid(corpus, storage, build_id, config)
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

    # one pass over the source to size the job (column-pruned scan)
    sizing = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_shard").alias("n_shards"),
    ).collect()[0]
    n_docs_built, n_shards = int(sizing["n"]), int(sizing["n_shards"])
    if n_docs_built == 0:
        # nothing to build, but a deletion-only update still needs fresh
        # global aggregates over the surviving shards
        if os.path.exists(storage.path("postings")):
            refresh_aggregates(spark, storage)
            storage.write_commit(config, build_id, {"input_fingerprint": fingerprint})
        return {"build_id": build_id, "n_docs": 0, "shards": [], "elapsed_sec": 0.0}

    # --- THE one shuffle of the build: repartition raw corpus bytes by
    # doc_shard.  Everything downstream (doc_map, doc_stats, postings) is
    # partition-local: tokens, tf rows and blobs never cross an exchange.
    # Explicit partition count (AQE never coalesces a user-specified
    # repartition) so the partitioned writes keep enough writers — one task
    # per shard up to ~4 tasks/core, multiple shards per task beyond that.
    n_part = max(1, min(n_shards, spark.sparkContext.defaultParallelism * 4))
    layout = corpus.repartition(n_part, "doc_shard").cache()

    # --- doc_map (identity + ingest invariant; facet columns live here) ---
    meta_cols = [c for c in ["repo", "path", "commit", "lang"] if c in corpus.columns]
    doc_map = layout.select("doc_shard", "doc_id", *meta_cols, "content_sha256")
    storage.write(doc_map, "doc_map", partition_shards=True)

    # --- per-(doc, field) stats.  dl via regexp_count: counts token runs
    # WITHOUT materializing a token array (a JVM split would allocate one
    # UTF8String per token — GC-bound, stops scaling past ~8 threads).
    # Equivalence with len(tokenize_text(x)) is pinned by a tokenizer test.
    # dl=0 docs appear here (not in postings) so N/avgdl match the oracle.
    per_field_dl = F.array(
        *[
            F.struct(
                F.lit(f).alias("field"),
                # coalesce: a NULL field value must count as dl=0 (the pack
                # kernel's fillna('') convention) — otherwise the row stays in
                # n_docs but silently drops out of avg(dl)/sum(dl), skewing
                # avgdl and violating DOC_STATS_SCHEMA's non-null dl
                F.coalesce(
                    F.regexp_count(F.lower(F.col(f)), F.lit("[a-z0-9]+")),
                    F.lit(0),
                ).cast("long").alias("dl"),
            )
            for f in config.fields
        ]
    )
    doc_stats = layout.select(
        "doc_shard", "doc_id", F.explode(per_field_dl).alias("_fd")
    ).select(
        "doc_shard", "doc_id",
        F.col("_fd.field").alias("field"), F.col("_fd.dl").alias("dl"),
    )
    storage.write(doc_stats, "doc_stats", partition_shards=True)

    # --- pack postings per shard (tokenize + tf + encode in the kernel) ---
    packed = layout.select(
        "doc_shard", "doc_id", *config.fields
    ).groupBy("doc_shard").applyInPandas(
        _make_packer(config.block_size, config.fields), schema=POSTINGS_SCHEMA
    )
    storage.write(packed, "postings", partition_shards=True)
    corpus = layout  # built_shards query below reuses the cached layout

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
