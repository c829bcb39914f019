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
