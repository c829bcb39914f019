"""Corpus ingestion: the input_hint contract + deterministic identity.

Input contract (BASELINE.json input_hint): a table of source-code files
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Identity discipline mirrors the reference (SURVEY.md §1.4): the reference
derives a deterministic primary key from source coordinates
(SolrHelper.java:105-111 ``getIdFromRef``); we derive ``doc_id`` from a total
order on ``(repo, path, commit)`` — NEVER ``monotonically_increasing_id()``,
which is partition-layout-dependent and nondeterministic under retries.

At the 10^12-row design point a global ``row_number() OVER (ORDER BY ...)``
is a single-reducer sort; ``assign_doc_ids`` therefore uses the two-phase
scheme: range-repartition by key → per-partition counts collected (one tiny
row per partition) → prefix-sum offsets → partition-local row_number + offset.
The ingest invariant is per-row ``sha2(content, 256)`` (input_hint / the
reference's md5 change-detection analog, IndexRecordsForV4.java:157).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]
KEY_COLUMNS = ["repo", "path", "commit"]


def with_content_sha(df: DataFrame) -> DataFrame:
    """Attach the ingest-invariant column (input_hint: sha256 of content)."""
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def assign_doc_ids(df: DataFrame, num_partitions: int = 32, base: int = 0) -> DataFrame:
    """Deterministic dense doc_id from the total order on (repo, path, commit).

    Two-phase prefix-sum: scales to 10^12 rows because no single task ever
    sees more than one range-partition, and the driver only collects one
    count per partition.  ``base`` offsets the whole sequence (incremental
    appends allocate above the stored max id).
    """
    keyed = df.repartitionByRange(num_partitions, *KEY_COLUMNS)
    keyed = keyed.sortWithinPartitions(*KEY_COLUMNS)
    part = keyed.withColumn("_pid", F.spark_partition_id())
    counts = part.groupBy("_pid").count().orderBy("_pid").collect()
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*KEY_COLUMNS)
    out = (
        part.join(offsets_df, "_pid")
        .withColumn("doc_id", F.row_number().over(w) - 1 + F.col("_offset") + F.lit(base))
        .drop("_pid", "_offset")
    )
    return out


def adapt_documents(docs: DataFrame) -> DataFrame:
    """Adapt a driver-shaped ``documents`` table (doc_id, text, lang, source,
    n_chars) into the input_hint shape, keeping its stable doc_id.

    FIXTURES.md §1: text→content, source→repo, path=f"doc/{doc_id}",
    commit=sha256(doc_id).
    """
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def load_documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the driver's documents.parquet and adapt it (see adapt_documents)."""
    return adapt_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))
