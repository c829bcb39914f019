"""Operational CLI — the reference's command-line entry-point surface
(IndexRecords.java / IndexRecordsForV4.java main methods) re-expressed for
this engine.  Built for ``spark-submit --py-files pkg.zip -m`` or plain
``python -m archivesspace_virgo_spark`` on a gateway host:

    build   --corpus DIR|--table DIR --index DIR [--fields a,b] [--validate]
    sync    --table DIR --index DIR            (snapshot-diff incremental)
    query   --index DIR --terms t1,t2 [--mode or|and] [-k N] [--offset N]
            [--exclude t3,t4] [--mm N] [--fq lang:en,lang:fr]...
    search  --index DIR --q 'spark -stream s*^2' [-k N] [--offset N]
            (full Solr q= string syntax, one parse + dispatch)
    phrase  --index DIR --phrase "exact phrase" [-k N] [--slop N]
    facet   --index DIR --terms t1,t2 --field lang [--exclude t3]
    group   --index DIR --terms t1,t2 --field lang [--k-per-group N]
    sort    --index DIR --terms t1,t2 --field path [--desc] [-k N]
    dismax  --index DIR --terms t1,t2 --qf content,lang [--tie T]
            (--fields sets the index field config; --qf is the DisMax
            qf list)
    rerank  --index DIR --terms t1,t2 --phrase "p" [--weight W]
            [--rerank-docs N] [--slop N] [--ordered]
    explain --index DIR --terms t1,t2 --ids 3,17
    stats   --index DIR --terms t1,t2 [--field content]
    terms   --index DIR [--prefix s] [-n N] [--min-df N] [--index-order]
    suggest --index DIR --term tble [-n N]

Results print as TSV to stdout; exit code is 0 on success (the reference
exits nonzero on any record error — ``build --validate`` mirrors that by
failing when rows were quarantined).
"""

from __future__ import annotations

import argparse
import sys


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("archivesspace-virgo-spark")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _print_df(df) -> None:
    cols = df.columns
    print("\t".join(cols))
    for r in df.collect():
        print("\t".join("" if r[c] is None else str(r[c]) for c in cols))


def main(argv=None) -> int:
    from archivesspace_virgo_spark.config import IndexConfig

    p = argparse.ArgumentParser(prog="archivesspace_virgo_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    src = b.add_mutually_exclusive_group(required=True)
    src.add_argument("--corpus", help="parquet dir in input_hint shape")
    src.add_argument("--table", help="SnapshotTable dir (snapshot-pinned build)")
    b.add_argument("--index", required=True)
    b.add_argument("--fields", default="content")
    b.add_argument("--docs-per-shard", type=int, default=4096)
    b.add_argument("--validate", action="store_true")

    s = sub.add_parser("sync")
    s.add_argument("--table", required=True)
    s.add_argument("--index", required=True)
    s.add_argument("--fields", default="content")
    s.add_argument("--docs-per-shard", type=int, default=4096)

    for name in ("query", "search", "phrase", "facet", "group", "sort",
                 "dismax", "rerank", "explain", "stats", "terms", "suggest"):
        q = sub.add_parser(name)
        q.add_argument("--index", required=True)
        q.add_argument("--fields", default="content")
        q.add_argument("--docs-per-shard", type=int, default=4096)
        q.add_argument("-k", type=int, default=10)
        if name == "query":
            q.add_argument("--terms", required=True)
            q.add_argument("--mode", default="or", choices=["or", "and"])
            q.add_argument("--offset", type=int, default=0)
            q.add_argument("--exclude", default="",
                           help="MUST_NOT terms, comma-separated")
            q.add_argument("--mm", type=int, default=1,
                           help="minimum-should-match (Solr mm)")
            q.add_argument("--fq", action="append", default=[],
                           help="non-scoring filter clause (Solr fq), "
                                "comma-separated OR terms; repeatable")
        elif name == "search":
            q.add_argument("--q", required=True,
                           help="Solr q= string (phrases, -must_not, "
                                "boosts, pre*/te?t/term~N//re//[a TO b])")
            q.add_argument("--offset", type=int, default=0)
        elif name == "phrase":
            q.add_argument("--phrase", required=True)
            q.add_argument("--slop", type=int, default=0,
                           help='proximity budget ("a b"~N, Solr '
                                "PhraseQuery slop: transpositions allowed)")
            q.add_argument("--ordered", action="store_true",
                           help="use the stricter ordered SpanNear "
                                "contract instead of PhraseQuery slop")
        elif name == "group":
            q.add_argument("--terms", required=True)
            q.add_argument("--field", required=True)
            q.add_argument("--k-per-group", type=int, default=3)
        elif name == "sort":
            q.add_argument("--terms", required=True)
            q.add_argument("--field", required=True)
            q.add_argument("--desc", action="store_true")
        elif name == "dismax":
            q.add_argument("--terms", required=True)
            q.add_argument("--qf", default="",
                           help="fields to search, comma-separated "
                                "(default: all indexed fields)")
            q.add_argument("--tie", type=float, default=0.0)
        elif name == "rerank":
            q.add_argument("--terms", required=True)
            q.add_argument("--phrase", required=True)
            q.add_argument("--weight", type=float, default=2.0)
            q.add_argument("--rerank-docs", type=int, default=50)
            q.add_argument("--slop", type=int, default=0,
                           help="proximity budget for the rerank query "
                                "(Solr PhraseQuery slop, like `phrase`)")
            q.add_argument("--ordered", action="store_true",
                           help="use the stricter ordered SpanNear "
                                "contract for the rerank query")
        elif name == "explain":
            q.add_argument("--terms", required=True)
            q.add_argument("--ids", required=True,
                           help="doc ids to explain, comma-separated")
        elif name == "stats":
            q.add_argument("--terms", required=True)
            q.add_argument("--stats-field", default=None)
        elif name == "terms":
            q.add_argument("--prefix", default="")
            q.add_argument("-n", type=int, default=10)
            q.add_argument("--min-df", type=int, default=1)
            q.add_argument("--index-order", action="store_true")
        elif name == "facet":
            q.add_argument("--terms", required=True)
            q.add_argument("--field", required=True)
            q.add_argument("--exclude", default="",
                           help="MUST_NOT terms, comma-separated")
            q.add_argument("--fq", action="append", default=[],
                           help="non-scoring filter clause (Solr fq), "
                                "comma-separated OR terms; repeatable")
        else:
            q.add_argument("--term", required=True)
            q.add_argument("-n", type=int, default=5)
            q.add_argument("--max-edits", type=int, default=2)

    a = p.parse_args(argv)
    cfg = IndexConfig(
        docs_per_shard=a.docs_per_shard,
        fields=tuple(a.fields.split(",")),
    )
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if a.cmd == "build":
            from archivesspace_virgo_spark.index.build import build_index
            from archivesspace_virgo_spark.index.storage import IndexStorage

            if a.table:
                from archivesspace_virgo_spark.index.incremental import (
                    incremental_update_from_table,
                )
                from archivesspace_virgo_spark.sources import SnapshotTable

                meta = incremental_update_from_table(
                    spark, SnapshotTable(a.table), a.index, cfg
                )
            else:
                corpus = spark.read.parquet(a.corpus)
                meta = build_index(
                    spark, corpus, a.index, cfg, validate=a.validate
                )
            print(meta)
            if a.validate:
                import os

                st = IndexStorage(a.index)
                if os.path.exists(st.path("_errors")):
                    # _errors is append-only across builds; only THIS build's
                    # quarantined rows should fail this run
                    from pyspark.sql import functions as F

                    n_err = (
                        st.read(spark, "_errors")
                        .filter(F.col("build_id") == meta.get("build_id"))
                        .count()
                    )
                    if n_err:
                        print(f"{n_err} rows quarantined", file=sys.stderr)
                        return 1
            return 0
        if a.cmd == "sync":
            import os

            from archivesspace_virgo_spark.index.incremental import (
                incremental_update_from_table,
            )
            from archivesspace_virgo_spark.sources import (
                SnapshotTable,
                wrap_parquet_dir,
            )

            if os.path.exists(
                os.path.join(a.table, "metadata", "version-hint.text")
            ):
                table = SnapshotTable(a.table)
            else:
                # plain parquet dir: auto-wrap it in a snapshot log (stored
                # under the index) so repeated syncs scan only new files
                # instead of re-reading the whole corpus
                table = wrap_parquet_dir(
                    a.table, os.path.join(a.index, "_corpus_log")
                )
            print(incremental_update_from_table(spark, table, a.index, cfg))
            return 0

        from archivesspace_virgo_spark.index.query import QueryEngine

        engine = QueryEngine(spark, a.index, cfg)
        if a.cmd == "query":
            excl = [t for t in a.exclude.split(",") if t]
            fq = [[t for t in cl.split(",") if t] for cl in a.fq]
            _print_df(engine.search(
                a.terms.split(","), k=a.k, mode=a.mode, offset=a.offset,
                exclude=excl, min_should_match=a.mm, filters=fq,
            ))
        elif a.cmd == "search":
            _print_df(engine.query(a.q, k=a.k, offset=a.offset))
        elif a.cmd == "phrase":
            if a.slop > 0 and a.ordered:
                _print_df(engine.span_near_search(a.phrase, slop=a.slop,
                                                  k=a.k))
            elif a.slop > 0:
                _print_df(engine.sloppy_phrase_search(a.phrase, slop=a.slop,
                                                      k=a.k))
            else:
                _print_df(engine.phrase_search(a.phrase, k=a.k))
        elif a.cmd == "group":
            _print_df(engine.grouped_search(
                a.terms.split(","), a.field, k_per_group=a.k_per_group
            ))
        elif a.cmd == "sort":
            _print_df(engine.sorted_search(
                a.terms.split(","), a.field, k=a.k, ascending=not a.desc
            ))
        elif a.cmd == "dismax":
            qf = tuple(f for f in a.qf.split(",") if f) or None
            _print_df(engine.dismax_search(
                a.terms.split(","), fields=qf, tie=a.tie, k=a.k
            ))
        elif a.cmd == "rerank":
            # CLI slop semantics match the `phrase` subcommand: Solr
            # PhraseQuery slop by default, --ordered opts into SpanNear
            _print_df(engine.rerank(
                a.terms.split(","), a.phrase, k=a.k,
                rerank_docs=a.rerank_docs, weight=a.weight, slop=a.slop,
                ordered=a.ordered,
            ))
        elif a.cmd == "explain":
            ids = [int(x) for x in a.ids.split(",") if x]
            _print_df(engine.explain(a.terms.split(","), ids))
        elif a.cmd == "stats":
            _print_df(engine.stats_component(
                a.terms.split(","), field=a.stats_field
            ))
        elif a.cmd == "terms":
            _print_df(engine.terms_component(
                a.prefix, n=a.n, min_df=a.min_df,
                by_count=not a.index_order
            ))
        elif a.cmd == "facet":
            excl = [t for t in a.exclude.split(",") if t]
            fq = [[t for t in cl.split(",") if t] for cl in a.fq]
            _print_df(engine.facet_search(
                a.terms.split(","), a.field, exclude=excl, filters=fq
            ))
        else:
            _print_df(engine.suggest(a.term, n=a.n, max_edits=a.max_edits))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
