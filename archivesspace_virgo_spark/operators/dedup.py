"""Deduplication operators (exact, MinHash-LSH, SimHash, n-gram Jaccard).

All hash functions are defined as "first 15 hex chars of md5 → int64" so the
identical computation is expressible in Spark (conv/md5) AND DuckDB
(CAST '0x'||substr(md5) AS BIGINT) for the driver's oracle.  That costs some
speed vs xxhash but buys an exactly-reproducible cross-engine contract; the
Spark side stays entirely in JVM built-ins (no Python in the hot path).

Scale notes: every operator here is a groupBy/join on a derived key —
shuffle-heavy by nature.  The LSH band trick bounds the self-join: docs only
pair within a band-signature bucket, so the join key is (band_id, band_hash)
and AQE skew-join handles pathological buckets.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from archivesspace_virgo_spark.tokenizer import TOKEN_SPLIT_PATTERN, tokens_column


def _hash64(col: Column, seed: int) -> Column:
    """Deterministic cross-engine 60-bit hash of a string column."""
    salted = F.concat(F.lit(f"{seed}|"), col)
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int) -> str:
    return f"CAST(('0x' || substr(md5('{seed}|' || {expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Exact dedup — hash-groupBy (the baseline)
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups with >1 identical text: (text_md5, n_dups, keeper=min id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_duplicates_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT md5({text_col}) AS text_md5, count(*) AS n_dups, min({id_col}) AS keeper
FROM {table} GROUP BY 1 HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# Shingles + MinHash + LSH banding
# ---------------------------------------------------------------------------

def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the canonical token stream."""
    toks = tokens_column(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(grams)


def shingles_sql(expr: str, n: int = 3) -> str:
    toks = (
        f"list_filter(string_split_regex(lower({expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      n_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """(id, sig array<long>) — per-doc MinHash signature.

    Plan shape: explode distinct shingles → n_hashes min-aggregates in ONE
    groupBy (map-side partial min; a single shuffle of (doc, shingle) rows).
    Empty-shingle docs get an empty signature row preserved via left join.
    """
    ex = df.select(
        F.col(id_col).alias("_id"), F.explode(shingles(text_col, shingle_n)).alias("sh")
    )
    aggs = [F.min(_hash64(F.col("sh"), seed)).alias(f"h{seed}") for seed in range(n_hashes)]
    sigs = ex.groupBy("_id").agg(*aggs)
    return df.select(F.col(id_col).alias("_id")).join(sigs, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.array(*[f"h{s}" for s in range(n_hashes)]).alias("sig"),
    )


def minhash_band_pairs(df: DataFrame, id_col: str, text_col: str,
                       n_hashes: int = 16, bands: int = 4,
                       shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: (id_a < id_b, n_bands_hit).

    Docs sharing ALL hashes within any band collide in that band's bucket.
    The self-join is keyed on (band, band_sig) — bounded buckets, no full
    cross product.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signature(df, id_col, text_col, n_hashes, shingle_n)
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.array(*[
                F.array_join(
                    F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda h: h.cast("string"),
                    ),
                    ",",
                )
                for b in range(bands)
            ])
        ).alias("band", "band_sig"),
    ).filter(F.col("band_sig") != "")
    a = banded.alias("a")
    bb = banded.alias("b")
    return (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )


def minhash_band_pairs_sql(table: str, id_col: str, text_expr: str,
                           n_hashes: int = 16, bands: int = 4,
                           shingle_n: int = 3) -> str:
    """DuckDB oracle for ``minhash_band_pairs`` — the banding is fully
    deterministic (seeded md5 hashes), so the exact pair set is SQL-
    expressible: same signature mins, same band slicing, same bucket join."""
    rows_per_band = n_hashes // bands
    sh = shingles_sql(text_expr, shingle_n)
    mins = ", ".join(
        f"min({hash64_sql('sh', seed)}) AS h{seed}" for seed in range(n_hashes)
    )
    band_rows = " UNION ALL ".join(
        "SELECT _id, {b} AS band, {sig} AS band_sig FROM sig".format(
            b=b,
            sig=" || ',' || ".join(
                f"h{b * rows_per_band + i}::VARCHAR" for i in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return f"""
WITH ex AS (SELECT {id_col} AS _id, unnest({sh}) AS sh FROM {table}),
sig AS (SELECT _id, {mins} FROM ex GROUP BY _id),
banded AS ({band_rows})
SELECT a._id AS id_a, b._id AS id_b, count(*) AS n_bands_hit
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_sig = b.band_sig AND a._id < b._id
GROUP BY 1, 2
"""


def duplicate_clusters(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Connected components over candidate pairs → (doc_id, keeper).

    The operator a pretraining pipeline runs AFTER LSH banding: near-dup
    pairs are edges; each doc keeps the minimum doc_id of its component as
    the canonical representative (everything else is dropped downstream).

    Iterative min-label propagation: each round every node takes
    min(own label, neighbors' labels); converges in O(component diameter)
    rounds — near-dup clusters are shallow, so a handful of rounds.  Each
    round is one shuffle of the (still-shrinking) label relation against the
    edge relation; frontiers are localCheckpointed so the plan stays flat.
    Only docs that appear in ≥1 pair are returned (singletons are trivially
    their own keeper and would dominate row count at scale).
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("id"), F.col("u").alias("label")).distinct()
    converged = False
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges["v"] == labels["id"])
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select("id", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
        )
        done = changed.isEmpty()
        labels = new_labels
        if done:
            converged = True
            break
    if not converged:
        # a silently partial clustering picks WRONG keepers; fail loudly
        # like transitive_ancestors does on depth overflow
        raise RuntimeError(
            f"duplicate_clusters did not converge within {max_rounds} "
            "rounds (duplicate chain deeper than max_rounds); raise "
            "max_rounds"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("keeper"))


def duplicate_clusters_sql(pairs_sql: str) -> str:
    """DuckDB oracle: min reachable id via recursive transitive closure."""
    return f"""
WITH RECURSIVE cand AS ({pairs_sql}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM cand
  UNION
  SELECT id_b AS u, id_a AS v FROM cand
),
reach(id, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v
)
SELECT id AS doc_id, min(r) AS keeper FROM reach GROUP BY id
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard over candidate pairs
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        shingle_n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over shingle sets for docs sharing the same MIN shingle
    hash (a 1-hash MinHash prefilter keeps the self-join bounded).

    Returns (id_a, id_b, jaccard) with jaccard >= threshold, rounded 6.
    """
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(text_col, shingle_n)).alias("sh"),
    )
    sizes = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    minsh = ex.groupBy("_id").agg(F.min(_hash64(F.col("sh"), 0)).alias("min_h"))
    cand = (
        minsh.alias("a")
        .join(minsh.alias("b"), (F.col("a.min_h") == F.col("b.min_h"))
              & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )
    # semi-join prefilter: most docs appear in NO candidate pair, so shrink
    # the exploded shingle relation to candidate ids before the two
    # intersect joins — same result, far fewer shuffled shingle rows
    cand_ids = (
        cand.select(F.col("id_a").alias("_id"))
        .union(cand.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    ex_c = ex.join(cand_ids, "_id", "left_semi")
    inter = (
        cand.join(ex_c.alias("x"), F.col("id_a") == F.col("x._id"))
        .join(
            ex_c.alias("y"),
            (F.col("id_b") == F.col("y._id")) & (F.col("x.sh") == F.col("y.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("sa"), F.col("id_a") == F.col("sa._id"))
        .join(sizes.alias("sb"), F.col("id_b") == F.col("sb._id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, tf-weighted)
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash long) — tf-weighted sign-sum over per-term hash bits.

    bits<=60 because the cross-engine hash is 60-bit.  Declarative plan:
    explode → tf → per-bit contribution via bitwise ops → one groupBy
    producing the packed signature (no UDF).
    """
    toks = df.select(F.col(id_col).alias("_id"), tokens_column(text_col).alias("toks"))
    tf = (
        toks.select("_id", F.explode("toks").alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = tf.withColumn("h", _hash64(F.col("term"), 7))
    bit_sums = h.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    packed = bit_sums.select(
        F.col("_id").alias(id_col),
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(bits)
            ],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return packed
