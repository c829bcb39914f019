"""The single shared analysis chain (SURVEY.md §2.8-T1).

The reference emits the same value into a keyword field (``*_facet``) and an
analyzed field (``*_text``) — e.g. ASpaceObject.java:278-279 — delegating
tokenization to Solr.  Here tokenization IS the contract, so there is exactly
one definition, used by:

- the Spark engine (JVM-side ``F.split`` expression — stays in whole-stage
  codegen, no Python in the hot path),
- the numpy oracle (``tokenize_text``),
- the DuckDB ``oracle_sql`` strings (``string_split_regex`` on the same
  pattern).

Semantics (``ascii_alnum_lower_v1``): lowercase, split on runs of anything
outside ``[a-z0-9]``, drop empties.  This is code-aware in the sense the
survey requires: ``snake_case_name`` → ``snake case name``, ``Foo.bar()`` →
``foo bar`` — identifiers decompose into searchable subtokens.  The pattern is
deliberately ASCII-RE2-Java-Python agnostic so all four regex engines agree.
"""

from __future__ import annotations

import re
from typing import List

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: the one token-delimiter pattern. Identical meaning in Python re, Java
#: (Spark), and RE2 (DuckDB): any run of chars outside [a-z0-9].
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"

_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)


def tokenize_text(text: str) -> List[str]:
    """Pure-Python tokenizer — the oracle-side definition."""
    if not text:
        return []
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized pandas form (for pandas-UDF callers / the oracle)."""
    return s.fillna("").map(tokenize_text)


def tokens_column(col: Column | str) -> Column:
    """JVM-side tokenizer expression — the engine-side definition.

    Built-in ``lower``/``split``/``filter`` keep the whole analysis chain in
    Tungsten codegen (no Python worker round-trip), which is why this is the
    default over a pandas UDF at 100 TB scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), TOKEN_SPLIT_PATTERN)
    return F.filter(toks, lambda t: t != "")


def duckdb_tokens_sql(text_expr: str) -> str:
    """DuckDB fragment producing the same token list (for oracle_sql)."""
    return (
        "list_filter(string_split_regex(lower({e}), '{p}'), t -> t <> '')"
    ).format(e=text_expr, p=TOKEN_SPLIT_PATTERN)
