"""Declarative (pure-DataFrame) BM25 + the matching DuckDB oracle SQL.

Two co-maintained renderings of the same ranking function (SURVEY.md
§2.8-T6):

- ``bm25_topk_df``: Spark DataFrame composition — tokenize (JVM split) →
  explode → tf/df/dl aggregates → scalar corpus stats (broadcast) → score →
  TakeOrderedAndProject.  This is the "let Catalyst pick the plan" rendering;
  the compressed-index ``QueryEngine`` is the scale rendering.  Both must
  produce identical numbers.
- ``bm25_oracle_sql``: the ANSI-SQL equivalent DuckDB runs for the driver's
  CORRECTNESS gate.

Scores are rounded to 6 decimals in BOTH so cross-engine float formatting
can't break the value-hash compare; ordering uses the unrounded score.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from archivesspace_virgo_spark.tokenizer import TOKEN_SPLIT_PATTERN, tokens_column

K1 = 1.2
B = 0.75
ROUND = 6


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), tokens_column(text_col).alias("toks")
    )


def _term_frequencies(toks: DataFrame) -> DataFrame:
    return toks.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    ).groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk_df(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    mode: str = "or",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k BM25 over a (id, text) DataFrame; returns (doc_id, score)."""
    uniq: List[str] = sorted(set(terms))
    toks = _tokenized(docs, id_col, text_col)
    tf = _term_frequencies(toks)
    # corpus stats from the PRE-explode relation so dl=0 docs count toward
    # n_docs/avgdl (matches the oracle's LEFT JOIN + coalesce(dl, 0))
    stats = toks.select(F.size("toks").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = (
        tf.filter(F.col("term").isin(uniq))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    qtf = tf.filter(F.col("term").isin(uniq))
    scored = (
        qtf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("contrib").alias("_score"), F.count(F.lit(1)).alias("_nterms")
    )
    if mode == "and":
        agg = agg.filter(F.col("_nterms") == len(uniq))
    return (
        agg.orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("_score", ROUND).alias("score"))
    )


def phrase_oracle_sql(
    terms: Sequence[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    offset: int = 0,
) -> str:
    """DuckDB oracle for exact-phrase BM25 (Lucene PhraseQuery contract:
    tf = phrase frequency, idf = sum of the phrase terms' idfs in phrase
    order — matching the engine's accumulation order exactly)."""
    n = len(terms)
    toks_expr = (
        f"list_filter(string_split_regex(lower({text_col}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )
    dfs = ", ".join(
        f"count(*) FILTER (WHERE list_contains(t, '{t}')) AS df{i}"
        for i, t in enumerate(terms)
    )
    match = " AND ".join(f"t[i+{i}] = '{t}'" for i, t in enumerate(terms))
    idf_sum = " + ".join(
        f"ln(1.0 + (stats.n_docs - dfs.df{i} + 0.5) / (dfs.df{i} + 0.5))"
        for i in range(n)
    )
    return f"""
WITH toks AS (SELECT {id_col} AS doc_id, {toks_expr} AS t FROM {table}),
stats AS (SELECT count(*) AS n_docs, avg(len(t)) AS avgdl FROM toks),
dfs AS (SELECT {dfs} FROM toks),
pf AS (
  SELECT doc_id, len(t) AS dl,
         len(list_filter(range(1, len(t) - {n - 1} + 1), i -> {match})) AS ptf
  FROM toks
),
scored AS (
  SELECT doc_id,
         ({idf_sum})
           * pf.ptf / (pf.ptf + {k1} * (1.0 - {b} + {b} * pf.dl / stats.avgdl))
           AS _score
  FROM pf CROSS JOIN stats CROSS JOIN dfs
  WHERE pf.ptf > 0
)
SELECT doc_id, round(_score, {ROUND}) AS score
FROM scored ORDER BY _score DESC, doc_id ASC
LIMIT {k} OFFSET {offset}
"""


def bm25_oracle_sql(
    terms: Sequence[str],
    k: int = 10,
    mode: str = "or",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    offset: int = 0,
    boosts: Optional[dict] = None,
    exclude: Sequence[str] = (),
    min_should_match: int = 1,
    filter_sql: Sequence[str] = (),
    raw_score: bool = False,
) -> str:
    """DuckDB SQL computing the identical top-k (driver oracle).

    ``boosts`` mirrors the engine's BoostQuery contract (idf multiplier per
    term); ``exclude`` mirrors MUST_NOT (docs containing ANY excluded term
    are dropped, scores of survivors unchanged); ``min_should_match``
    mirrors Solr mm (≥ m distinct matched terms required); ``filter_sql``
    mirrors fq — each entry a boolean SQL predicate over ``tf.doc_id``
    (e.g. ``tf.doc_id IN (SELECT doc_id FROM documents WHERE lang='en')``)
    that gates qualification without touching scores."""
    uniq = sorted(set(terms))
    terms_sql = ", ".join(f"'{t}'" for t in uniq)
    if mode == "and":
        having = f"HAVING count(*) = {len(uniq)}"
    elif min_should_match > 1:
        having = f"HAVING count(*) >= {min_should_match}"
    else:
        having = ""
    boosts = boosts or {}
    boost_sql = "1.0"
    if boosts:
        cases = " ".join(
            f"WHEN term = '{t}' THEN {float(w)!r}" for t, w in boosts.items()
        )
        boost_sql = f"(CASE {cases} ELSE 1.0 END)"
    where_parts = list(filter_sql)
    if exclude:
        excl_sql = ", ".join(f"'{t}'" for t in sorted(set(exclude)))
        where_parts.insert(0, (
            "tf.doc_id NOT IN "
            f"(SELECT DISTINCT doc_id FROM tok WHERE term IN ({excl_sql}))"
        ))
    not_filter = f"WHERE {' AND '.join(where_parts)}" if where_parts else ""
    # raw_score: emit the unrounded accumulator — callers composing a
    # SECOND ordering stage (e.g. a cross-member alias merge) must
    # order on full precision like the engine does; the 6-dp rounding
    # is only for the driver's final value hash
    score_out = "_score" if raw_score else f"round(_score, {ROUND})"
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(string_split_regex(lower({text_col}), '{TOKEN_SPLIT_PATTERN}'), t -> t <> '')) AS term
  FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT d.{id_col} AS doc_id, coalesce(dl.dl, 0) AS dl
        FROM {table} d LEFT JOIN dl ON d.{id_col} = dl.doc_id)
),
dft AS (SELECT term, {boost_sql} AS boost, count(*) AS df
        FROM tf WHERE term IN ({terms_sql}) GROUP BY 1, 2),
scored AS (
  SELECT tf.doc_id,
         sum( dft.boost * ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl)) ) AS _score
  FROM tf
  JOIN dft ON tf.term = dft.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  {not_filter}
  GROUP BY tf.doc_id
  {having}
)
SELECT doc_id, {score_out} AS score
FROM scored
ORDER BY _score DESC, doc_id ASC
LIMIT {k} OFFSET {offset}
"""


def dismax_oracle_sql(
    terms: Sequence[str],
    field_text_cols: "dict[str, str]",
    tie: float = 0.0,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    offset: int = 0,
) -> str:
    """DuckDB twin of ``QueryEngine.dismax_search``: per term, a
    DisjunctionMax across fields (each field scored under its OWN corpus
    stats — the engine's per-field norms), terms summed as a boolean OR.
    ``field_text_cols`` maps each field to the SQL expression producing its
    text in ``table`` (e.g. ``{"content": "text", "lang": "lang"}``)."""
    uniq = sorted(set(terms))
    terms_sql = ", ".join(f"'{t}'" for t in uniq)
    ctes, unions = [], []
    for i, (_field, expr) in enumerate(field_text_cols.items()):
        ctes.append(f"""
tok_{i} AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_PATTERN}'), t -> t <> '')) AS term
  FROM {table}
),
tf_{i} AS (SELECT doc_id, term, count(*) AS tf FROM tok_{i} GROUP BY 1, 2),
dl_{i} AS (SELECT doc_id, count(*) AS dl FROM tok_{i} GROUP BY 1),
stats_{i} AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT d.{id_col} AS doc_id, coalesce(dl.dl, 0) AS dl
        FROM {table} d LEFT JOIN dl_{i} dl ON d.{id_col} = dl.doc_id)
),
dft_{i} AS (SELECT term, count(*) AS df FROM tf_{i}
            WHERE term IN ({terms_sql}) GROUP BY 1),
c_{i} AS (
  SELECT tf.doc_id, tf.term AS bare,
         ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * tf.tf / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) AS contrib
  FROM tf_{i} tf
  JOIN dft_{i} dft ON tf.term = dft.term
  JOIN dl_{i} dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats_{i} s
)""")
        unions.append(f"SELECT * FROM c_{i}")
    return f"""
WITH {', '.join(ctes)},
allc AS ({' UNION ALL '.join(unions)}),
pt AS (
  SELECT doc_id, bare, max(contrib) AS mx, sum(contrib) AS sm
  FROM allc GROUP BY 1, 2
),
sc AS (
  SELECT doc_id, sum(mx + {float(tie)!r} * (sm - mx)) AS _score
  FROM pt GROUP BY 1
)
SELECT doc_id, round(_score, {ROUND}) AS score
FROM sc ORDER BY _score DESC, doc_id ASC
LIMIT {k} OFFSET {offset}
"""


def bm25_boolean_oracle_sql(
    clauses: Sequence[Sequence[str]],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    offset: int = 0,
    boosts: Optional[dict] = None,
    exclude: Sequence[str] = (),
    filter_sql: Sequence[str] = (),
) -> str:
    """DuckDB twin of ``QueryEngine.boolean_search``: AND of clauses, each
    an OR over its terms.  A doc qualifies when every clause has ≥1 matched
    term (bool_or per clause in HAVING); a term in m clauses contributes m
    times (the engine's m× idf multiplier).  ``filter_sql`` mirrors fq —
    boolean predicates over ``tf.doc_id`` gating qualification without
    touching scores."""
    mult: dict = {}
    for cl in clauses:
        for t in sorted(set(cl)):
            mult[t] = mult.get(t, 0) + 1
    uniq = sorted(mult)
    terms_sql = ", ".join(f"'{t}'" for t in uniq)
    boosts = boosts or {}
    weight_cases = " ".join(
        f"WHEN term = '{t}' THEN {float(mult[t] * boosts.get(t, 1.0))!r}"
        for t in uniq
    )
    weight_sql = f"(CASE {weight_cases} ELSE 1.0 END)"
    cover = " AND ".join(
        "bool_or(tf.term IN (%s))" % ", ".join(
            f"'{t}'" for t in sorted(set(cl))
        )
        for cl in clauses
    )
    where_parts = list(filter_sql)
    if exclude:
        excl_sql = ", ".join(f"'{t}'" for t in sorted(set(exclude)))
        where_parts.insert(0, (
            "tf.doc_id NOT IN "
            f"(SELECT DISTINCT doc_id FROM tok WHERE term IN ({excl_sql}))"
        ))
    not_filter = f"WHERE {' AND '.join(where_parts)}" if where_parts else ""
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(string_split_regex(lower({text_col}), '{TOKEN_SPLIT_PATTERN}'), t -> t <> '')) AS term
  FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT d.{id_col} AS doc_id, coalesce(dl.dl, 0) AS dl
        FROM {table} d LEFT JOIN dl ON d.{id_col} = dl.doc_id)
),
dft AS (SELECT term, {weight_sql} AS weight, count(*) AS df
        FROM tf WHERE term IN ({terms_sql}) GROUP BY 1, 2),
scored AS (
  SELECT tf.doc_id,
         sum( dft.weight * ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl)) ) AS _score
  FROM tf
  JOIN dft ON tf.term = dft.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  {not_filter}
  GROUP BY tf.doc_id
  HAVING {cover}
)
SELECT doc_id, round(_score, {ROUND}) AS score
FROM scored
ORDER BY _score DESC, doc_id ASC
LIMIT {k} OFFSET {offset}
"""


def bm25_prefix_oracle_sql(
    prefix: str,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    offset: int = 0,
) -> str:
    """DuckDB twin of ``QueryEngine.prefix_search``: the PrefixQuery
    scoring-boolean rewrite — every corpus term starting with ``prefix``
    scores as an OR clause with its own idf.  The LIKE predicate replaces
    the engine's lexicon expansion; both enumerate the identical term set
    because the lexicon is built from the same tokenization."""
    esc = prefix.replace("'", "''").replace("%", r"\%").replace("_", r"\_")
    like = f"LIKE '{esc}%' ESCAPE '\\'"
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(string_split_regex(lower({text_col}), '{TOKEN_SPLIT_PATTERN}'), t -> t <> '')) AS term
  FROM {table}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT d.{id_col} AS doc_id, coalesce(dl.dl, 0) AS dl
        FROM {table} d LEFT JOIN dl ON d.{id_col} = dl.doc_id)
),
dft AS (SELECT term, count(*) AS df FROM tf WHERE term {like} GROUP BY 1),
scored AS (
  SELECT doc_id,
         sum(contrib ORDER BY term) AS _score
  FROM (
    SELECT tf.doc_id, tf.term,
           ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
             * tf.tf / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl)) AS contrib
    FROM tf
    JOIN dft ON tf.term = dft.term
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
  )
  GROUP BY doc_id
)
SELECT doc_id, round(_score, {ROUND}) AS score
FROM scored
ORDER BY _score DESC, doc_id ASC
LIMIT {k} OFFSET {offset}
"""
