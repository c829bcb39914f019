#!/usr/bin/env python
"""Cluster job entry point: build (or incrementally merge) the inverted index
and optionally answer a smoke query.  Designed for the north_rule submission
protocol:

    spark-submit --py-files dist/archivesspace_virgo_spark.zip \
        scripts/submit_index_build.py \
        --input  /path/to/corpus_parquet \
        --index-dir /path/to/index \
        --docs-per-shard 1000000 \
        --query "spark window merge" --k 10

On a real cluster the master/executor topology comes from spark-submit
(`--master yarn --num-executors N ...`); this script never hardcodes a
master so the SAME artifact runs at N and 4N executors for the scaling
measurement.  Input may be the input_hint shape (repo, path, commit, lang,
content) or the driver's documents shape (doc_id, text, ...) — adapted
automatically.  Prints one JSON metrics line on success.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet corpus dir/file")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--docs-per-shard", type=int, default=100_000)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--fingerprint", default=None,
                    help="input snapshot fingerprint for resume/lineage")
    ap.add_argument("--query", default=None, help="space-separated smoke terms")
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from archivesspace_virgo_spark.config import IndexConfig
    from archivesspace_virgo_spark.corpus import adapt_documents
    from archivesspace_virgo_spark.index.build import build_index
    from archivesspace_virgo_spark.index.query import QueryEngine

    spark = SparkSession.builder.appName("avs-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.time()

    raw = spark.read.parquet(args.input)
    corpus = adapt_documents(raw) if "text" in raw.columns else raw

    cfg = IndexConfig(docs_per_shard=args.docs_per_shard,
                      block_size=args.block_size)
    meta = build_index(
        spark, corpus, args.index_dir, cfg,
        input_fingerprint=args.fingerprint, resume=args.resume,
    )

    out = {
        "build_id": meta["build_id"],
        "n_docs": meta["n_docs"],
        "n_shards": len(meta["shards"]),
        "build_sec": round(meta["elapsed_sec"], 3),
        "docs_per_sec": round(meta["n_docs"] / max(meta["elapsed_sec"], 1e-9), 1),
        "total_sec": round(time.time() - t0, 3),
    }
    if args.query:
        engine = QueryEngine(spark, args.index_dir, cfg)
        tq = time.time()
        rows = engine.search(args.query.split(), k=args.k, mode=args.mode).collect()
        out["query_sec"] = round(time.time() - tq, 4)
        out["query_top"] = [[int(r["doc_id"]), round(float(r["score"]), 6)]
                            for r in rows]
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
