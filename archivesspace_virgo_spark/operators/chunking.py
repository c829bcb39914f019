"""Document chunking + sequence packing for LLM training-data pipelines.

Two operators a 100-TB pretraining pipeline runs over every document
(downstream of the dedup/quality operators in this package):

- ``chunk_documents``: split each doc's token stream into fixed-size
  overlapping windows (the context-window chunking step before embedding /
  tokenize-and-shard).  Pure built-ins: tokens → ``sequence`` of window
  starts → ``posexplode`` → ``slice`` + ``array_join`` — JVM-side, one
  Generate per doc, no shuffle, no Python.
- ``pack_linear``: assign docs to training-sequence bins under a token
  budget with the deterministic LINEAR packing rule — docs in ``order_col``
  order, cut a new bin whenever the running token total would exceed the
  budget (the streaming first-fit used when sample order must be stable;
  oversized docs get a bin of their own).  A prefix-sum over one window;
  at cluster scale the same two-phase range-partition prefix-sum as
  doc_id assignment (corpus.py:assign_doc_ids) applies.

Both have exact DuckDB twins (``*_sql``) co-maintained below, in the same
style as the rest of this module family (textstats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from archivesspace_virgo_spark.tokenizer import TOKEN_SPLIT_PATTERN, tokens_column


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int, overlap: int = 0) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens): fixed-size token windows with
    ``overlap`` tokens shared between consecutive chunks.

    Window starts are 0, step, 2·step… with step = chunk_tokens − overlap;
    the last chunk may be short; empty docs yield no chunks.  All chunk
    text is rebuilt by joining the canonical tokens with single spaces
    (chunking happens post-analysis, as in a tokenize-then-shard
    pipeline)."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens_column(text_col)
    d = df.select(F.col(id_col), toks.alias("_toks"))
    d = d.withColumn("_n", F.size("_toks")).filter(F.col("_n") > 0)
    # starts: 0, step, ... the last start is the largest multiple of step
    # strictly below n (so a final sub-overlap tail still lands in the
    # previous chunk's window rather than spawning a duplicate-only chunk)
    d = d.withColumn(
        "_starts",
        F.sequence(
            F.lit(0),
            ((F.col("_n") - 1) / step).cast("int") * step,
            F.lit(step),
        ),
    )
    return (
        d.select(
            id_col,
            F.posexplode("_starts").alias("chunk_id", "_start"),
            "_toks",
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice("_toks", F.col("_start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.size("_toks") - F.col("_start")
            ).alias("n_tokens"),
        )
    )


def chunk_documents_sql(table: str, id_col: str, text_expr: str,
                        chunk_tokens: int, overlap: int = 0) -> str:
    """DuckDB twin of ``chunk_documents`` (same contract, same names)."""
    step = chunk_tokens - overlap
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )
    return f"""
WITH t AS (SELECT {id_col}, {toks} AS toks FROM {table}),
nz AS (SELECT {id_col}, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
st AS (
  SELECT {id_col}, toks, n,
         unnest(range(0, ((n - 1) // {step}) * {step} + 1, {step})) AS start,
         unnest(range(0, ((n - 1) // {step}) + 1)) AS chunk_id
  FROM nz
)
SELECT {id_col}, CAST(chunk_id AS INT) AS chunk_id,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ') AS chunk_text,
       CAST(least({chunk_tokens}, n - start) AS INT) AS n_tokens
FROM st
"""


def pack_linear(df: DataFrame, id_col: str, text_col: str,
                budget: int, order_col: str | None = None,
                num_partitions: int = 32) -> DataFrame:
    """(id, n_tokens, bin_id, offset_in_bin): deterministic concat-and-cut
    packing (the "concatenate the corpus, cut every ``budget`` tokens"
    rule common in pretraining pipelines).

    Docs are laid out in ``order_col`` (default: ``id_col``) order as one
    token stream; bin b covers stream positions [b·budget, (b+1)·budget),
    and a doc belongs to the bin containing its FIRST token —
    bin_id = floor((cumsum − n_tokens) / budget), a closed form over the
    prefix sum (no sequential scan, unlike greedy first-fit whose bin
    state depends on every prior cut).  A bin may therefore overflow by
    up to one doc's tail, which the training loader truncates or carries
    over — the standard contract for this packing style.

    The prefix sum is the TWO-PHASE distributed form (the
    corpus.py:assign_doc_ids pattern): deterministic range buckets on
    ``order`` (``corpus.range_bucket_column`` — boundaries sampled ONCE
    and baked into a pure expression, so the totals job and the window job
    see the SAME bucketing by construction; back-to-back
    ``repartitionByRange`` executions do not guarantee that, because Spark
    re-seeds boundary sampling per plan) → per-bucket token totals
    collected (one tiny row per bucket) → broadcast prefix offsets →
    bucket-local cumulative sum.  No row ever flows through a
    single-partition exchange, so the packing scales with the cluster
    instead of serializing on one task.  The bin assignment is independent
    of how the boundary sample fell — the bucket id is monotone in
    ``order``, so the composed prefix sum is the exact global one.

    Determinism contract: the baked boundaries make the bucket-assignment
    FUNCTION deterministic, not the input row SET.  The totals job and
    the window job each re-evaluate ``df``'s lineage; a nondeterministic
    source (an unseeded ``.sample()``, a non-idempotent UDF, an unstable
    limit) can hand the two phases different rows, yielding offsets that
    describe rows phase 2 never sees.  Pipe such sources through a
    materialization (write/read, ``localCheckpoint``) first — same
    contract as every multi-job consumer of a nondeterministic plan."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from archivesspace_virgo_spark.corpus import (
        prefix_sum_offsets, range_bucket_column,
    )

    order = order_col or id_col
    n_tok = F.size(tokens_column(text_col))
    cols = [F.col(id_col), n_tok.alias("n_tokens")]
    if order != id_col:
        cols.append(F.col(order))
    d = df.select(*cols)
    # phase 1: deterministic range buckets over the packing order; each
    # bucket owns a contiguous slice of the stream
    pid_col, n_buckets = range_bucket_column(d, [order], num_partitions)
    part = d.withColumn("_pid", pid_col)
    totals = {
        int(r["_pid"]): int(r["_tok"])
        for r in part.groupBy("_pid").agg(F.sum("n_tokens").alias("_tok")).collect()
    }
    offsets_df = prefix_sum_offsets(df.sparkSession, totals, n_buckets)
    # phase 2: partition-local running sum + the broadcast global offset.
    # ROWS frame explicitly: Spark's default frame for an ordered window
    # is RANGE, under which TIED order keys (e.g. NULL keys, duplicate
    # timestamps) all receive the PEAK cumulative sum of their tie group —
    # every tied doc would land in the tie group's last bin, leaving
    # earlier bins empty.  ROWS gives each row its own running total (ties
    # broken arbitrarily but linearly), matching the SQL twin's
    # ROWS UNBOUNDED PRECEDING.
    wp = (Window.partitionBy("_pid").orderBy(order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = (
        part.join(offsets_df, "_pid")
        .withColumn("_cum", F.sum("n_tokens").over(wp) + F.col("_offset"))
    )
    # bin of a doc = how many full budgets precede its span start; a doc
    # whose span crosses a budget boundary belongs to the bin its END
    # lands in only if its start does too — the linear rule: bin_id =
    # floor((cum - n_tokens) / budget) counts whole budgets BEFORE the doc
    d = d.withColumn(
        "bin_id", ((F.col("_cum") - F.col("n_tokens")) / budget).cast("long")
    )
    wb = Window.partitionBy("bin_id").orderBy(order)
    return d.select(
        id_col, "n_tokens", "bin_id",
        (F.row_number().over(wb) - 1).alias("offset_in_bin"),
    )


def pack_linear_sql(table: str, id_col: str, text_expr: str,
                    budget: int, order_col: str | None = None) -> str:
    """DuckDB twin of ``pack_linear``."""
    order = order_col or id_col
    toks = (
        f"len(list_filter(string_split_regex(lower({text_expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> ''))"
    )
    extra = f", {order}" if order != id_col else ""
    return f"""
WITH t AS (SELECT {id_col}{extra}, {toks} AS n_tokens FROM {table}),
c AS (
  SELECT {id_col}{extra}, n_tokens,
         sum(n_tokens) OVER (ORDER BY {order} NULLS FIRST
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT {id_col}, CAST(n_tokens AS INT) AS n_tokens,
       CAST((cum - n_tokens) // {budget} AS BIGINT) AS bin_id,
       CAST(row_number() OVER (
           PARTITION BY (cum - n_tokens) // {budget}
           ORDER BY {order} NULLS FIRST
       ) - 1 AS INT) AS offset_in_bin
FROM c
"""
