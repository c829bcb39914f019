"""Lucene sloppy-phrase matching (PhraseQuery slop semantics).

Solr's ``"a b"~N`` is Lucene *PhraseQuery* slop: terms may match OUT OF
ORDER as long as the total edit budget allows it (transposing two adjacent
terms costs 2 — the classic Lucene doc example), unlike the stricter
ordered SpanNearQuery contract (``QueryEngine.span_near_search``).

``lucene_sloppy_freq`` is the per-document greedy min-heap algorithm of
Lucene's SloppyPhraseScorer/SloppyPhraseMatcher for phrases WITHOUT
repeating terms, over "adjusted" positions (token position minus the
term's offset in the phrase, so a perfectly-ordered match has all adjusted
positions equal):

    pop the smallest adjusted position pp; matchLength = end - pp
    repeatedly advance pp; while it has not passed the next-smallest
    position the current match keeps minimizing (matchLength shrinks);
    once it passes, count the match if matchLength <= slop with weight
    1/(1+matchLength) (Lucene's computeSlopFactor), re-insert pp and pop
    the new minimum; when any term's positions are exhausted, count the
    final candidate and stop.  ``end`` is the running max adjusted
    position ever seen.

The sloppy frequency replaces tf in the phrase BM25 form
(idf_sum · sf / (sf + k1 · norm)), exactly like span_near_search's sloppy
weight.  Reference behavior evidence: the select handler the reference
programs against accepts this syntax (SolrHelper.java:39-66).
"""

from __future__ import annotations

import heapq
from typing import Sequence


def lucene_sloppy_freq(adjusted: Sequence[Sequence[int]], slop: int) -> float:
    """Sloppy phrase frequency of ONE document.

    ``adjusted[i]`` is the sorted list of adjusted positions
    (position − i) of phrase term i in the document; every list must be
    non-empty (docs missing a term never match — filter first).  Returns
    the sum of 1/(1+matchLength) over the matches Lucene's greedy matcher
    finds with matchLength ≤ slop (0.0 when none qualify)."""
    n = len(adjusted)
    if n == 0 or any(len(a) == 0 for a in adjusted):
        return 0.0
    if n == 1:
        # single-term phrase = TermQuery: every occurrence is an exact
        # match of length 0
        return float(len(adjusted[0]))
    idx = [0] * n
    # heap entries are (adjusted position, phrase offset) — Lucene's
    # PhraseQueue breaks position ties on offset
    heap = [(adjusted[i][0], i) for i in range(n)]
    heapq.heapify(heap)
    end = max(a[0] for a in adjusted)
    freq = 0.0
    ppv, ppi = heapq.heappop(heap)
    match_len = end - ppv
    nextv = heap[0][0]
    while True:
        # advancePP
        idx[ppi] += 1
        if idx[ppi] >= len(adjusted[ppi]):
            break  # pp exhausted — fall through to count the candidate
        ppv = adjusted[ppi][idx[ppi]]
        if ppv > end:
            end = ppv
        if ppv > nextv:
            # done minimizing the current match-length
            if match_len <= slop:
                freq += 1.0 / (1.0 + match_len)
            heapq.heappush(heap, (ppv, ppi))
            ppv, ppi = heapq.heappop(heap)
            nextv = heap[0][0]
            match_len = end - ppv
        else:
            match_len = min(match_len, end - ppv)
    if match_len <= slop:
        freq += 1.0 / (1.0 + match_len)
    return freq
