"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force cosine top-k — the correctness baseline.
  Pure JVM expressions (zip_with/aggregate) — no Python in the hot path.
- ``lsh_cosine_topk``: random-hyperplane LSH bucketing — the scale path.
  Deterministic hyperplanes derived from md5 (seeded), so results are
  reproducible across runs/engines; candidates are re-ranked exactly, so
  recall<1 but precision=1 w.r.t. returned candidates.

At 100 TB the brute-force variant is a single map-side pass per query
(broadcast query vector, no shuffle except final top-k); LSH replaces the
full scan with a bucket-pruned scan (partition by bucket id).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cos) rounded 6, score-desc/id-asc."""
    q = [float(x) for x in query_vec]
    qnorm = float(np.sqrt(np.dot(q, q)))
    qcol = F.array(*[F.lit(x) for x in q])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = _dot(v, qcol) / (F.sqrt(_dot(v, v)) * F.lit(qnorm))
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), cos.alias("_cos"))
        .orderBy(F.desc("_cos"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round("_cos", 6).alias("cos"))
    )


def cosine_topk_sql(
    query_vec: Sequence[float],
    k: int = 10,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle: identical math in double precision."""
    q = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH q AS (SELECT {q} AS qv),
s AS (
  SELECT {id_col} AS vec_id,
         list_dot_product({vec_col}::DOUBLE[], qv)
           / (sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]))
              * sqrt(list_dot_product(qv, qv))) AS _cos
  FROM {table}, q
)
SELECT vec_id, round(_cos, 6) AS cos FROM s
ORDER BY _cos DESC, vec_id ASC LIMIT {k}
"""


def deterministic_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Seeded pseudo-random unit hyperplanes (reproducible everywhere)."""
    out = []
    for p in range(n_planes):
        vals = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{i}".encode()).digest()
            u = int.from_bytes(h[:8], "big") / 2**64  # [0,1)
            vals.append(2.0 * u - 1.0)
        n = float(np.sqrt(sum(v * v for v in vals)))
        out.append([v / n for v in vals])
    return out


def lsh_bucket(vec_col: Column, planes: List[List[float]]) -> Column:
    """Sign-pattern bucket id (int) for random-hyperplane LSH."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(_dot(v, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _sql_vec(vals: Sequence[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vals) + "]::DOUBLE[]"


def lsh_bucket_sql(vec_expr: str, planes: List[List[float]]) -> str:
    """DuckDB twin of ``lsh_bucket`` (planes inlined as literal arrays)."""
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}, {_sql_vec(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def lsh_cosine_topk_sql(
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> str:
    """DuckDB oracle for ``lsh_cosine_topk``: the hyperplanes, query bucket
    and probe set are all deterministic, so the approximate result is itself
    an exact contract — same buckets, same candidates, same re-rank."""
    dim = len(query_vec)
    planes = deterministic_hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(q, np.asarray(plane))) >= 0:
            qbucket |= 1 << i
    probes = [qbucket]
    if probe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]
    probe_list = ", ".join(str(p) for p in sorted(set(probes)))
    qv = _sql_vec(query_vec)
    return f"""
WITH cand AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS _v
  FROM {table}
  WHERE {lsh_bucket_sql(f"{vec_col}::DOUBLE[]", planes)} IN ({probe_list})
),
s AS (
  SELECT vec_id,
         list_dot_product(_v, {qv})
           / (sqrt(list_dot_product(_v, _v)) * sqrt(list_dot_product({qv}, {qv}))) AS _cos
  FROM cand
)
SELECT vec_id, round(_cos, 6) AS cos FROM s
ORDER BY _cos DESC, vec_id ASC LIMIT {k}
"""


def embedding_neardup_pairs_lsh_sql(
    threshold: float = 0.9,
    n_planes: int = 8,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int = 64,
) -> str:
    """DuckDB oracle for ``embedding_neardup_pairs_lsh`` (same deterministic
    buckets, same within-bucket exact cosine + threshold)."""
    planes = deterministic_hyperplanes(dim, n_planes, seed)
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, {vec_col}::DOUBLE[] AS _v,
         sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[])) AS _n,
         {lsh_bucket_sql(f"{vec_col}::DOUBLE[]", planes)} AS _bucket
  FROM {table}
)
SELECT a._id AS id_a, b._id AS id_b,
       round(list_dot_product(a._v, b._v) / (a._n * b._n), 6) AS cos
FROM base a JOIN base b ON a._bucket = b._bucket AND a._id < b._id
WHERE round(list_dot_product(a._v, b._v) / (a._n * b._n), 6) >= {threshold}
"""


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a < id_b, cos).

    Correctness baseline: full self-join with cosine >= threshold, all math
    in JVM expressions.  Norms are precomputed once per side (projection,
    not recomputation per pair).  Quadratic — at 100 TB use
    ``embedding_neardup_pairs_lsh`` which blocks the join on an LSH bucket.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
    return (
        a.join(b, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs_sql(
    threshold: float = 0.9,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for ``embedding_neardup_pairs`` (identical math)."""
    return f"""
WITH base AS (
  SELECT {id_col} AS _id, {vec_col}::DOUBLE[] AS _v,
         sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[])) AS _n
  FROM {table}
)
SELECT a._id AS id_a, b._id AS id_b,
       round(list_dot_product(a._v, b._v) / (a._n * b._n), 6) AS cos
FROM base a JOIN base b ON a._id < b._id
WHERE round(list_dot_product(a._v, b._v) / (a._n * b._n), 6) >= {threshold}
"""


def embedding_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Scale path: block the self-join on the LSH bucket (docs only pair
    within a bucket), then exact cosine re-rank.  Misses cross-bucket pairs
    (recall<1, rises with threshold); every returned pair is exact.  The
    bucket id becomes a partition column at scale → co-partitioned join, no
    full cross product (same trick as dedup.minhash_band_pairs).

    Pass ``dim`` explicitly to skip the sniffing job; without it an empty
    input short-circuits to an empty result."""
    if dim is None:
        head = embeddings.select(vec_col).head(1)
        if not head:
            return embeddings.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cos double"
            )
        dim = len(head[0][0])
    planes = deterministic_hyperplanes(dim, n_planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a._v"), F.col("b._v")) / (F.col("a._n") * F.col("b._n"))
    return (
        a.join(b, (F.col("a._bucket") == F.col("b._bucket"))
               & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(cos, 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def write_bucketed_embeddings(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> None:
    """Materialize embeddings partitioned BY LSH BUCKET — the scale wiring
    for ANN: a top-k probe then reads only the probed buckets' partitions
    (partition pruning at the file-listing level), so query cost is
    |probed buckets| / 2^n_planes of the corpus instead of a full scan."""
    if dim is None:
        head = embeddings.select(vec_col).head(1)
        if not head:
            raise ValueError("cannot infer dim from empty embeddings")
        dim = len(head[0][0])
    planes = deterministic_hyperplanes(dim, n_planes, seed)
    (
        embeddings.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    )


def lsh_cosine_topk_bucketed(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN over a bucket-partitioned store: the bucket filter prunes at the
    partition level (verified by a scan-scope test), then exact re-rank."""
    planes = deterministic_hyperplanes(len(query_vec), n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(q, np.asarray(plane))) >= 0:
            qbucket |= 1 << i
    probes = [qbucket]
    if probe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer -> one partition per
# list -> probe the nprobe nearest lists, exact re-rank.  The second scale
# path next to LSH: data-adaptive lists beat random hyperplanes on skewed
# embedding distributions.
# ---------------------------------------------------------------------------

def _assign_fn(centroids: np.ndarray, vec_col: str):
    """Arrow-batched list assignment: one numpy matmul per batch against the
    broadcast centroid matrix (cosine argmax)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)

    @pandas_udf("int")
    def assign(vecs):
        import pandas as pd

        M = np.vstack(vecs.to_numpy())
        Mn = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
        return pd.Series(np.argmax(Mn @ Cn.T, axis=1).astype(np.int32))

    return assign(F.col(vec_col))


def ivf_train(
    embeddings: DataFrame,
    n_lists: int = 16,
    n_iter: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Lloyd's k-means coarse quantizer, Spark-native:

    - init: seeded deterministic unit vectors (reproducible across runs);
    - assign: Arrow-batched matmul (map-side only);
    - update: posexplode -> (list, dim) avg — the ONLY shuffle, and it moves
      k x dim aggregate rows, not vectors.  Per-iteration driver traffic is
      the k x dim centroid matrix.  Empty lists keep their centroid.

    ``sample_fraction`` is the corpus-scale training path: k-means needs
    only a representative sample, not every vector (FAISS trains IVF on
    ~256 vectors per centroid), so at 100 TB pass e.g.
    ``max(n_lists * 256 / n_vecs, 1e-6)`` and the n_iter scans + the
    posexplode aggregate run over the (seeded, deterministic) sample
    instead of the full corpus; assignment of the FULL corpus to the
    trained centroids stays the map-side-only matmul in
    ``write_ivf_embeddings``."""
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError("sample_fraction must be in (0, 1]")
        if sample_fraction < 1.0:
            embeddings = embeddings.sample(
                fraction=sample_fraction, seed=seed
            )
    if dim is None:
        head = embeddings.select(vec_col).head(1)
        if not head:
            raise ValueError("cannot train IVF on empty embeddings")
        dim = len(head[0][0])
    cent = np.asarray(deterministic_hyperplanes(dim, n_lists, seed))
    for _ in range(n_iter):
        assigned = embeddings.select(
            _assign_fn(cent, vec_col).alias("_list"),
            F.col(vec_col).alias("_v"),
        )
        rows = (
            assigned.select("_list", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_list", "_pos")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .collect()
        )
        nxt = cent.copy()
        for r in rows:
            nxt[r["_list"]][r["_pos"]] = r["_m"]
        cent = nxt
    return cent


def write_ivf_embeddings(
    embeddings: DataFrame,
    centroids: np.ndarray,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Materialize embeddings partitioned by IVF list id (the coarse index);
    probes then prune at the file-listing level like the LSH bucket store."""
    (
        embeddings.withColumn("list_id", _assign_fn(centroids, vec_col))
        .write.mode("overwrite").partitionBy("list_id").parquet(path)
    )


def nearest_lists(
    centroids: np.ndarray, query_vec: Sequence[float], nprobe: int
) -> List[int]:
    """The ``nprobe`` nearest IVF lists to the query (centroid cosine order).
    Shared by ``ivf_topk`` and its SQL twin so both probe identical lists."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) + 1e-12)
    return [int(p) for p in np.argsort(-(Cn @ qn))[:nprobe]]


def ivf_topk(
    spark,
    path: str,
    centroids: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest lists (by centroid cosine), exact
    re-rank inside them.  nprobe = n_lists degenerates to exact search."""
    probes = nearest_lists(centroids, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("list_id").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_topk_sql(
    centroids: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for ``ivf_topk``: the centroid matrix is inlined as
    literal arrays (normalized with the same numpy expression the Spark
    ``_assign_fn`` kernel uses, so both engines see bit-identical floats),
    list assignment is a first-max argmax over centroid dot products (the
    np.argmax contract), the probe set is computed by the shared
    ``nearest_lists`` helper, and candidates are exactly re-ranked."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
    probes = nearest_lists(centroids, query_vec, nprobe)
    probe_list = ", ".join(str(p) for p in sorted(probes))
    dots = ", ".join(
        f"list_dot_product(_v, {_sql_vec(Cn[i])}) AS d{i}"
        for i in range(len(Cn))
    )
    # first-max argmax: list i wins iff d_i >= every later d_j (ties keep
    # the earlier index, matching np.argmax)
    cases = []
    n = len(Cn)
    for i in range(n - 1):
        conds = " AND ".join(f"d{i} >= d{j}" for j in range(i + 1, n))
        cases.append(f"WHEN {conds} THEN {i}")
    argmax = "CASE " + " ".join(cases) + f" ELSE {n - 1} END"
    qv = _sql_vec(query_vec)
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS _v FROM {table}
),
d AS (SELECT vec_id, _v, {dots} FROM base),
assigned AS (SELECT vec_id, _v, {argmax} AS list_id FROM d),
cand AS (SELECT vec_id, _v FROM assigned WHERE list_id IN ({probe_list})),
s AS (
  SELECT vec_id,
         list_dot_product(_v, {qv})
           / (sqrt(list_dot_product(_v, _v)) * sqrt(list_dot_product({qv}, {qv}))) AS _cos
  FROM cand
)
SELECT vec_id, round(_cos, 6) AS cos FROM s
ORDER BY _cos DESC, vec_id ASC LIMIT {k}
"""


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN: scan only buckets within `probe_hamming` bits of the query's
    bucket (multi-probe), then exact re-rank.  At scale the bucket id is a
    partition column → partition pruning replaces the full scan."""
    dim = len(query_vec)
    planes = deterministic_hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, plane in enumerate(planes):
        if float(np.dot(q, np.asarray(plane))) >= 0:
            qbucket |= 1 << i
    probes = [qbucket]
    if probe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]
    bucketed = embeddings.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
