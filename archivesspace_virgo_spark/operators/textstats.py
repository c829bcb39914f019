"""Text-analysis operators for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting — all expressed with built-in pyspark.sql.functions
(JVM-side, codegen) and each with a co-maintained DuckDB oracle fragment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from archivesspace_virgo_spark.tokenizer import TOKEN_SPLIT_PATTERN, tokens_column

# deterministic stopword table for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "et", "les", "de"],
    "de": ["der", "und", "die", "das", "ist"],
    "es": ["el", "y", "los", "que", "en"],
}


def token_count(text_col: Column | str) -> Column:
    return F.size(tokens_column(text_col))


def token_count_sql(expr: str) -> str:
    return (
        f"len(list_filter(string_split_regex(lower({expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> ''))"
    )


def token_count_ws(text_col: Column | str) -> Column:
    """Whitespace token count (the cheap pipeline estimator)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), "\\s+"))
    )


def token_count_ws_sql(expr: str) -> str:
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0 "
        f"ELSE len(string_split_regex(trim({expr}), '\\s+')) END"
    )


#: BPE-ish pre-tokenizer pattern (GPT-2 shape, lookahead-free so Java regex
#: and RE2 agree): contraction suffixes, space-prefixed letter runs, digit
#: runs, punctuation runs
BPE_PATTERN = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"


def token_count_bpe(text_col: Column | str) -> Column:
    """BPE-ish token-count estimate: counts pre-tokenizer segments of the
    lowercased text (a closer proxy for LLM token cost than whitespace)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(F.lower(c), F.lit(BPE_PATTERN))


def token_count_bpe_sql(expr: str) -> str:
    # DuckDB has no regexp_count; count the extracted match list.  The
    # pattern contains a literal quote -> double it for the SQL literal.
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all(lower({expr}), '{pat}'))"


def lang_id(text_col: Column | str) -> Column:
    """Pick the language whose stopword hit-count is highest (ties: first in
    sorted language order; 'und' when nothing matches)."""
    toks = tokens_column(text_col)

    def _hits_for(words):
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = []
    for lang in sorted(LANG_STOPWORDS):
        scores.append((lang, _hits_for(LANG_STOPWORDS[lang])))
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, hits in reversed(scores):  # earlier langs win ties → apply last
        cond = hits > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, hits).otherwise(best_score)
    return best


def lang_id_sql(expr: str) -> str:
    toks = (
        f"list_filter(string_split_regex(lower({expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )
    # same greedy argmax with first-in-sorted-order tie-break
    sql = "'und'"
    score_sql = "0"
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        hits = f"len(list_filter({toks}, t -> t IN ({words})))"
        sql = f"CASE WHEN {hits} > ({score_sql}) THEN '{lang}' ELSE ({sql}) END"
        score_sql = f"CASE WHEN {hits} > ({score_sql}) THEN {hits} ELSE ({score_sql}) END"
    return sql


def quality_score(text_col: Column | str) -> Column:
    """Deterministic [0,1] quality composite: length saturation × alnum ratio.

    quality = least(1, n_tokens/50) * (alnum+space chars / total chars);
    empty text scores 0.  (The shape follows public pretraining-pipeline
    heuristics: prefer longer documents with low symbol noise.)
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_tok = token_count(c).cast("double")
    total = F.length(c).cast("double")
    clean = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")).cast("double")
    ratio = F.when(total > 0, clean / total).otherwise(F.lit(0.0))
    return F.round(F.least(F.lit(1.0), n_tok / 50.0) * ratio, 6)


def quality_score_sql(expr: str) -> str:
    n_tok = token_count_sql(expr)
    return (
        f"round(least(1.0, ({n_tok})/50.0) * "
        f"(CASE WHEN length({expr}) > 0 THEN "
        f"length(regexp_replace(lower({expr}), '[^a-z0-9 ]', '', 'g'))::DOUBLE "
        f"/ length({expr}) ELSE 0.0 END), 6)"
    )


def _ngram_array(toks: Column, n: int) -> Column:
    """array<string> of space-joined word n-grams (empty when < n tokens)."""
    idx = F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n, F.transform(idx, gram)
    ).otherwise(F.array().cast("array<string>"))


def _ngram_run_stats(grams: Column, n: int) -> Column:
    """struct(dup long, cov long) via a single fold over the SORTED grams:
    run-length encoding in one pass — ``dup`` = Σ count over grams occurring
    ≥2× (instances in duplicated n-grams), ``cov`` = max over grams of
    count × token-chars(gram).  Zero shuffle, whole-stage codegen: the
    100-TB path is a per-row expression, unlike the explode→groupBy(doc,
    gram) formulation whose shuffle carries every n-gram instance."""
    sep = n - 1  # separator chars inside a space-joined gram

    def _final_dup(acc):
        return acc["dup"] + F.when(
            acc["run"] >= 2, acc["run"]
        ).otherwise(F.lit(0).cast("long"))

    def _final_cov(acc):
        return F.greatest(
            acc["cov"],
            acc["run"] * (F.length(acc["prev"]) - F.lit(sep)).cast("long"),
        )

    def merge(acc, g):
        return F.when(
            g == acc["prev"],
            F.struct(
                g.alias("prev"),
                (acc["run"] + F.lit(1).cast("long")).alias("run"),
                acc["dup"].alias("dup"),
                acc["cov"].alias("cov"),
            ),
        ).otherwise(
            F.struct(
                g.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                _final_dup(acc).alias("dup"),
                _final_cov(acc).alias("cov"),
            )
        )

    def finish(acc):
        return F.struct(
            _final_dup(acc).alias("dup"), _final_cov(acc).alias("cov")
        )

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("cov"),
    )
    return F.aggregate(F.array_sort(grams), init, merge, finish)


def top_ngram_char_frac(text_col: Column | str, n: int) -> Column:
    """Gopher-style repetition signal (Rae et al. 2021 §A1.1): fraction of
    token characters covered by the most repeated word n-gram —
    max_g(count_g × chars_g) / Σ token chars.  The numerator maximizes the
    count×chars product directly (deterministic under count ties, unlike
    "chars of the argmax-count gram").  0.0 when the doc has < n tokens."""
    toks = tokens_column(text_col)
    grams = _ngram_array(toks, n)
    st = _ngram_run_stats(grams, n)
    charsum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t).cast("long")
    )
    return F.when(
        (F.size(grams) > 0) & (charsum > 0),
        st["cov"].cast("double") / charsum.cast("double"),
    ).otherwise(F.lit(0.0))


def dup_ngram_frac(text_col: Column | str, n: int) -> Column:
    """Fraction of n-gram instances whose gram occurs ≥2× in the document
    (Gopher's duplicate-n-gram filter family).  0.0 when < n tokens."""
    toks = tokens_column(text_col)
    grams = _ngram_array(toks, n)
    st = _ngram_run_stats(grams, n)
    return F.when(
        F.size(grams) > 0, st["dup"].cast("double") / F.size(grams).cast("double")
    ).otherwise(F.lit(0.0))


def _ngram_array_sql(toks: str, n: int) -> str:
    """DuckDB twin of ``_ngram_array`` (1-based list indexing)."""
    parts = " || ' ' || ".join(f"({toks})[i + {j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> {parts})"
    )


def top_ngram_char_frac_sql(expr: str, n: int) -> str:
    """DuckDB twin — relational shape differs (per-distinct-gram count via
    list_filter instead of the fold) but the arithmetic is identical:
    max(count×chars)::DOUBLE / Σ token chars."""
    toks = (
        f"list_filter(string_split_regex(lower({expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )
    grams = _ngram_array_sql(toks, n)
    cov = (
        f"coalesce(list_max(list_transform(list_distinct({grams}), "
        f"g -> len(list_filter({grams}, x -> x = g)) * (length(g) - {n - 1}))), 0)"
    )
    charsum = f"list_sum(list_transform({toks}, t -> length(t)))"
    return (
        f"CASE WHEN len({grams}) > 0 AND ({charsum}) > 0 "
        f"THEN ({cov})::DOUBLE / ({charsum})::DOUBLE ELSE 0.0 END"
    )


def dup_ngram_frac_sql(expr: str, n: int) -> str:
    toks = (
        f"list_filter(string_split_regex(lower({expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )
    grams = _ngram_array_sql(toks, n)
    dup = (
        f"coalesce(list_sum(list_transform(list_distinct({grams}), "
        f"g -> CASE WHEN len(list_filter({grams}, x -> x = g)) >= 2 "
        f"THEN len(list_filter({grams}, x -> x = g)) ELSE 0 END)), 0)"
    )
    return (
        f"CASE WHEN len({grams}) > 0 "
        f"THEN ({dup})::DOUBLE / len({grams})::DOUBLE ELSE 0.0 END"
    )


def fingerprint(text_col: Column | str) -> Column:
    """Normalization fingerprint: md5 over the canonical token stream —
    robust to whitespace/punctuation/case changes (the md5 change-detection
    analog of IndexRecordsForV4.java:157)."""
    return F.md5(F.array_join(tokens_column(text_col), " "))


def fingerprint_sql(expr: str) -> str:
    toks = (
        f"list_filter(string_split_regex(lower({expr}), "
        f"'{TOKEN_SPLIT_PATTERN}'), t -> t <> '')"
    )
    return f"md5(array_to_string({toks}, ' '))"
