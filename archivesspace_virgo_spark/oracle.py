"""Pure-Python/numpy brute-force BM25 oracle (SURVEY.md §5.2-1).

This is the stand-in for the Solr/Lucene golden reference the original repo
delegates to (pom.xml:56-60): a from-first-principles scorer sharing the
engine's literal tokenizer function, against which the Spark engine must be
rank-identical with scores equal within 1e-6.

Formula (Lucene >= 8 BM25, per BASELINE.json north_star; k1=1.2, b=0.75):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))

Intentional divergence from Lucene documented per SURVEY.md §2.8-T5: exact
doc lengths, no SmallFloat norm quantization — this oracle *defines* the
contract for the new engine.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from archivesspace_virgo_spark.tokenizer import tokenize_text


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


@dataclass
class OracleIndex:
    doc_ids: List[int]
    doc_tfs: List[Dict[str, int]]
    doc_lens: List[int]
    df: Dict[str, int]
    n_docs: int
    avgdl: float


def build_oracle_index(docs: Sequence[Tuple[int, str]]) -> OracleIndex:
    """docs: sequence of (doc_id, content)."""
    doc_ids, doc_tfs, doc_lens = [], [], []
    df: Dict[str, int] = {}
    for doc_id, content in docs:
        toks = tokenize_text(content)
        tf = Counter(toks)
        doc_ids.append(doc_id)
        doc_tfs.append(dict(tf))
        doc_lens.append(len(toks))
        for t in tf:
            df[t] = df.get(t, 0) + 1
    n = len(doc_ids)
    avgdl = (sum(doc_lens) / n) if n else 0.0
    return OracleIndex(doc_ids, doc_tfs, doc_lens, df, n, avgdl)


def oracle_search(
    index: OracleIndex,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "or",
) -> List[Tuple[int, float]]:
    """Brute-force BM25 top-k. mode='and' requires all terms present.

    Ties broken by ascending doc_id; summation over terms in sorted-term
    order with float64 (the engine fixes the same accumulation order).
    """
    uniq_terms = sorted(set(terms))
    idfs = {t: idf(index.n_docs, index.df.get(t, 0)) for t in uniq_terms}
    scored: List[Tuple[int, float]] = []
    for doc_id, tfs, dl in zip(index.doc_ids, index.doc_tfs, index.doc_lens):
        present = [t for t in uniq_terms if t in tfs]
        if not present:
            continue
        if mode == "and" and len(present) != len(uniq_terms):
            continue
        norm = index.avgdl and (1.0 - b + b * dl / index.avgdl)
        score = 0.0
        for t in present:
            tf = tfs[t]
            score += idfs[t] * tf / (tf + k1 * norm)
        scored.append((doc_id, score))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]
