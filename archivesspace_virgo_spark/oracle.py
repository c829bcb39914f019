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


def build_oracle_index_fields(
    docs: Sequence[Tuple[int, Dict[str, str]]], fields: Sequence[str]
) -> Dict[str, OracleIndex]:
    """Multi-field oracle: one independent OracleIndex per field (per-field
    df/dl/avgdl — the per-field norms of SURVEY §2.8-T10)."""
    return {
        f: build_oracle_index([(doc_id, vals.get(f, "")) for doc_id, vals in docs])
        for f in fields
    }


def oracle_search_fields(
    indexes: Dict[str, OracleIndex],
    default_field: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "or",
) -> List[Tuple[int, float]]:
    """Field-scoped brute-force BM25: 'path:foo' scores against the 'path'
    index, bare terms against the default field; per-doc sum across fields
    in sorted stored-term order (matching the engine's accumulation)."""
    parsed = {}
    for t in set(terms):
        field = default_field
        if ":" in t:
            prefix = t.split(":", 1)[0]
            if prefix in indexes and prefix != default_field:
                field = prefix
        parsed[t] = (field, t.split(":", 1)[1] if field != default_field else t)
    stored_sorted = sorted(parsed)
    by_doc: Dict[int, Dict[str, float]] = {}
    for stored in stored_sorted:
        field, tok = parsed[stored]
        idx = indexes[field]
        t_idf = idf(idx.n_docs, idx.df.get(tok, 0))
        for doc_id, tfs, dl in zip(idx.doc_ids, idx.doc_tfs, idx.doc_lens):
            if tok not in tfs:
                continue
            norm = idx.avgdl and (1.0 - b + b * dl / idx.avgdl)
            contrib = t_idf * tfs[tok] / (tfs[tok] + k1 * norm)
            by_doc.setdefault(doc_id, {})[stored] = contrib
    scored = []
    for doc_id, contribs in by_doc.items():
        if mode == "and" and len(contribs) != len(parsed):
            continue
        scored.append(
            (doc_id, sum(contribs[t] for t in stored_sorted if t in contribs))
        )
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def oracle_phrase_search(
    docs: Sequence[Tuple[int, str]],
    phrase_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> List[Tuple[int, float]]:
    """Brute-force exact-phrase BM25 (Lucene PhraseQuery contract):
    tf = phrase frequency (consecutive occurrences), idf = sum of the
    phrase terms' idfs (duplicates counted), standard BM25 norm."""
    terms = list(phrase_terms)
    n = len(terms)
    index = build_oracle_index(docs)
    if any(index.df.get(t, 0) == 0 for t in terms):
        return []
    idf_sum = sum(idf(index.n_docs, index.df[t]) for t in terms)
    scored: List[Tuple[int, float]] = []
    for doc_id, content in docs:
        toks = tokenize_text(content)
        dl = len(toks)
        ptf = sum(
            1 for i in range(dl - n + 1) if toks[i:i + n] == terms
        )
        if ptf == 0:
            continue
        norm = index.avgdl and (1.0 - b + b * dl / index.avgdl)
        scored.append((doc_id, idf_sum * ptf / (ptf + k1 * norm)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def oracle_search(
    index: OracleIndex,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "or",
    exclude: Sequence[str] = (),
    boosts=None,
) -> List[Tuple[int, float]]:
    """Brute-force BM25 top-k. mode='and' requires all terms present.

    Ties broken by ascending doc_id; summation over terms in sorted-term
    order with float64 (the engine fixes the same accumulation order).
    ``exclude``: MUST_NOT terms — a doc containing any of them is dropped;
    surviving scores are unchanged (MUST_NOT never contributes to scoring).
    ``boosts``: {term: weight} BoostQuery multiplier on that clause's
    contribution (applied to idf, same as the engine).
    """
    uniq_terms = sorted(set(terms))
    neg = set(exclude)
    boosts = boosts or {}
    idfs = {
        t: idf(index.n_docs, index.df.get(t, 0)) * float(boosts.get(t, 1.0))
        for t in uniq_terms
    }
    scored: List[Tuple[int, float]] = []
    for doc_id, tfs, dl in zip(index.doc_ids, index.doc_tfs, index.doc_lens):
        if neg and any(t in tfs for t in neg):
            continue
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
