"""Incremental index maintenance (SURVEY.md §2.8-T12, §3.1).

The reference's incremental path (IndexRecords.java:64-75, 136-170) detects
changed records in a time window, expands the dirty set through dependency
joins, and reindexes exactly that set.  Our Spark-native equivalent:

1. **Delta detection** — full-outer join of the new corpus against the
   stored ``doc_map`` on the document identity ``(repo, path)``; the per-row
   ``sha256(content)`` ingest invariant doubles as the change detector (the
   reference's md5-hash discipline, IndexRecordsForV4.java:157).
2. **Dirty-set expansion** — a changed/added/deleted doc dirties its whole
   doc_shard (the shard is the index's unit of rebuild, like the reference's
   per-record Solr doc).
3. **Shard-scoped rebuild** — ``build_index(only_shards=dirty)`` with
   dynamic partition overwrite replaces exactly the dirty shards in
   doc_map/doc_stats/postings; global lexicon/corpus_stats re-aggregate from
   the per-shard summaries (a two-level agg — exact df, SURVEY §4.2).

Identity rules: unchanged docs keep their doc_id (rank stability); new docs
get ids above the previous max (they land in tail shards, so appends touch
only tail + explicitly modified shards); deleted ids are never reused
(shards may go sparse — scoring tolerates holes).

On Iceberg the delta-detection input would be a snapshot-diff read instead
of the full corpus; the join below is the format-agnostic fallback and the
dirty-shard logic is identical.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.corpus import assign_doc_ids, with_content_sha
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.storage import IndexStorage

IDENTITY = ["repo", "path"]


def detect_changes(spark: SparkSession, new_corpus: DataFrame, index_dir: str) -> dict:
    """Classify new_corpus rows vs the stored doc_map.

    Returns dict of DataFrames: unchanged / modified / added (all carrying
    doc_id) and deleted (old doc_ids gone from the corpus).
    """
    storage = IndexStorage(index_dir)
    old = storage.read(spark, "doc_map").select(
        *IDENTITY, F.col("doc_id").alias("_old_id"),
        F.col("content_sha256").alias("_old_sha"),
    )
    new = with_content_sha(new_corpus) if "content_sha256" not in new_corpus.columns else new_corpus
    joined = new.join(old, IDENTITY, "full_outer")

    unchanged = joined.filter(
        F.col("_old_id").isNotNull()
        & F.col("content_sha256").isNotNull()
        & (F.col("content_sha256") == F.col("_old_sha"))
    ).withColumn("doc_id", F.col("_old_id"))
    modified = joined.filter(
        F.col("_old_id").isNotNull()
        & F.col("content_sha256").isNotNull()
        & (F.col("content_sha256") != F.col("_old_sha"))
    ).withColumn("doc_id", F.col("_old_id"))
    deleted = joined.filter(F.col("content_sha256").isNull()).select(
        F.col("_old_id").alias("doc_id")
    )

    max_old = old.agg(F.max("_old_id")).collect()[0][0]
    base = (max_old if max_old is not None else -1) + 1
    # two-phase prefix-sum id assignment with a base offset: a first
    # backfill or bulk append IS the common case at scale, so the added set
    # must never funnel through a single un-partitioned window task
    added = assign_doc_ids(
        joined.filter(F.col("_old_id").isNull()), base=base
    )

    drop = ["_old_id", "_old_sha"]
    return {
        "unchanged": unchanged.drop(*drop),
        "modified": modified.drop(*drop),
        "added": added.drop(*drop),
        "deleted": deleted,
    }


def incremental_update(
    spark: SparkSession,
    new_corpus: DataFrame,
    index_dir: str,
    config: Optional[IndexConfig] = None,
    build_id: Optional[str] = None,
    input_fingerprint: Optional[str] = None,
) -> dict:
    """Merge corpus changes into an existing index; returns build metadata
    plus the dirty-shard list.  Falls back to implicit full rebuild when the
    stored config hash differs (reference: transform-hash change forces full
    reindex, IndexRecordsForV4.java:44-64)."""
    config = config or IndexConfig()
    storage = IndexStorage(index_dir)
    if not storage.is_committed_with(config):
        meta = build_index(spark, new_corpus, index_dir, config,
                           build_id=build_id, input_fingerprint=input_fingerprint)
        meta["mode"] = "full_rebuild"
        return meta

    ch = detect_changes(spark, new_corpus, index_dir)
    shard = lambda c: (c / F.lit(config.docs_per_shard)).cast("int")  # noqa: E731
    dirty = (
        ch["modified"].select(shard(F.col("doc_id")).alias("s"))
        .union(ch["added"].select(shard(F.col("doc_id")).alias("s")))
        .union(ch["deleted"].select(shard(F.col("doc_id")).alias("s")))
        .distinct()
    )
    dirty_shards = sorted(r["s"] for r in dirty.collect())
    if not dirty_shards:
        return {"mode": "noop", "shards": [], "n_docs": 0}

    # rebuild corpus = every surviving doc whose id falls in a dirty shard
    survivors = ch["unchanged"].unionByName(ch["modified"]).unionByName(ch["added"])
    rebuild = survivors.filter(shard(F.col("doc_id")).isin(dirty_shards))

    # STAGE the rebuild rows before touching the index: the lazy `rebuild`
    # plan reads doc_map, which build_index is about to overwrite — you must
    # never overwrite a table a live plan still scans (Iceberg gets this via
    # snapshot isolation; plain parquet needs an explicit staging write).
    import shutil
    import uuid as _uuid

    staging = os.path.join(index_dir, "_staging", _uuid.uuid4().hex[:12])
    rebuild.write.mode("overwrite").parquet(staging)
    rebuild = spark.read.parquet(staging)

    # a shard fully emptied by deletions writes no partition → dynamic
    # overwrite would leave its old data behind; drop those partitions
    live = {r["s"] for r in rebuild.select(shard(F.col("doc_id")).alias("s")).distinct().collect()}
    emptied = [s for s in dirty_shards if s not in live]
    for s in emptied:
        for table in ("doc_map", "doc_stats", "postings"):
            storage.drop_shard_partition(table, s)

    try:
        meta = build_index(
            spark, rebuild, index_dir, config,
            build_id=build_id, input_fingerprint=input_fingerprint,
            only_shards=dirty_shards,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        spark.catalog.refreshByPath(index_dir)
    meta["mode"] = "incremental"
    meta["dirty_shards"] = dirty_shards
    meta["emptied_shards"] = emptied
    return meta
