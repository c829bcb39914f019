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


def lucene_sloppy_freq_batch(flat, starts, slop: int):
    """Vectorized lockstep batch of ``lucene_sloppy_freq`` over MANY docs.

    ``flat[i]`` — one int64 numpy array per phrase term i holding the
    adjusted positions (token position − i) for ALL candidate docs,
    concatenated in candidate order, each doc's run sorted ascending;
    ``starts[i]`` — int64 run boundaries into ``flat[i]``, shape
    (n_docs + 1,); every run must be non-empty (docs missing a term never
    match — intersect first).  Returns the per-doc sloppy frequency as a
    float64 array of length n_docs.

    This is EXACTLY the greedy SloppyPhraseMatcher recurrence of
    ``lucene_sloppy_freq`` (property-pinned equal in
    tests/test_sloppy_phrase.py), advanced one step per iteration for
    every still-active doc ("lane"), with finished lanes compacted away.
    Total work is O(Σ occurrence counts × n_terms) numpy element-ops —
    the same asymptotic cost the scalar loop pays, but ~100× less
    per-element overhead, which is what makes a sloppy phrase of two HOT
    terms (candidate set ≈ docs_per_shard) survive at cluster scale.
    """
    import numpy as np

    n = len(flat)
    n_docs = int(len(starts[0]) - 1)
    out = np.zeros(n_docs, dtype=np.float64)
    if n_docs == 0 or n == 0:
        return out
    if n == 1:
        # single-term phrase = TermQuery: every occurrence matches exactly
        return (starts[0][1:] - starts[0][:-1]).astype(np.float64)
    sentinel = np.iinfo(np.int64).max
    lane_doc = np.arange(n_docs, dtype=np.int64)
    ptr = np.stack([starts[i][:-1].astype(np.int64) for i in range(n)], axis=1)
    lim = np.stack([starts[i][1:].astype(np.int64) for i in range(n)], axis=1)
    rows = np.arange(n_docs)
    cur = np.stack([flat[i][ptr[:, i]] for i in range(n)], axis=1)
    end = cur.max(axis=1)
    # pop the min (value, phrase-offset) — argmin ties break on the first
    # (= smallest offset), matching Lucene's PhraseQueue order
    ppi = cur.argmin(axis=1)
    ml = end - cur[rows, ppi]
    tmp = cur.copy()
    tmp[rows, ppi] = sentinel
    nextv = tmp.min(axis=1)
    while cur.shape[0]:
        rows = np.arange(cur.shape[0])
        # advancePP: bump the popped term's pointer
        p = ptr[rows, ppi] + 1
        ptr[rows, ppi] = p
        dead = p >= lim[rows, ppi]
        if dead.any():
            # exhausted lanes count their final candidate and retire
            fin = dead & (ml <= slop)
            out[lane_doc[fin]] += 1.0 / (1.0 + ml[fin])  # lanes are distinct docs
            keep = ~dead
            lane_doc, ptr, lim, cur, end, ml, ppi, nextv = (
                lane_doc[keep], ptr[keep], lim[keep], cur[keep],
                end[keep], ml[keep], ppi[keep], nextv[keep],
            )
            if cur.shape[0] == 0:
                break
            rows = np.arange(cur.shape[0])
        # gather each lane's new position (ppi varies per lane, so one
        # bounded gather per term)
        v = np.empty(cur.shape[0], dtype=np.int64)
        for i in range(n):
            m = ppi == i
            if m.any():
                v[m] = flat[i][ptr[m, i]]
        cur[rows, ppi] = v
        end = np.maximum(end, v)
        cond = v > nextv
        hit = cond & (ml <= slop)
        if hit.any():
            out[lane_doc[hit]] += 1.0 / (1.0 + ml[hit])
        if cond.any():
            # done minimizing: re-queue pp, pop the new min, recompute
            # next-smallest and the fresh match length
            c = rows[cond]
            sub = cur[c]
            sr = np.arange(sub.shape[0])
            npp = sub.argmin(axis=1)
            ppi[c] = npp
            ml[c] = end[c] - sub[sr, npp]
            tmp = sub.copy()
            tmp[sr, npp] = sentinel
            nextv[c] = tmp.min(axis=1)
        nc = ~cond
        if nc.any():
            ml[nc] = np.minimum(ml[nc], end[nc] - v[nc])
    return out


def lucene_sloppy_freq_repeats(adjusted, terms, slop: int) -> float:
    """Sloppy phrase frequency of ONE document for phrases WITH repeating
    terms — Lucene's SloppyPhraseMatcher repeats machinery for the
    single-term-per-position case (repeat groups keyed by equal terms;
    phrases here never put multiple terms at one position, so the
    multi-term-repeats branch does not apply).

    ``adjusted[i]`` is the sorted adjusted-position list (token position −
    i) of the term at phrase offset i (repeated terms contribute the SAME
    underlying positions, each shifted by its own offset); ``terms[i]``
    identifies repetition — equal terms form a repeat group, ordered by
    phrase offset (rptInd = rank within the group).

    The algorithm, faithful to Lucene:

    - init: place every phrase position at its first occurrence, then
      resolve collisions — two positions of one repeat group may never
      point at the same document token (tpPos = position + offset); on
      collision the LESSER (by position, then offset) advances; if any
      advance exhausts, the doc has no match;
    - matching: the no-repeats greedy loop, except after every advance the
      moved position re-resolves collisions within its group, and every
      group member moved while sitting in the queue is re-queued at its
      fresh position (Lucene's rptStack dance: pop until all marked
      members seen, push all back);
    - every match of length ≤ slop weighs 1/(1+matchLength); the final
      candidate at exhaustion counts too.
    """
    import heapq as _hq

    n = len(adjusted)
    if n == 0 or any(len(a) == 0 for a in adjusted):
        return 0.0
    if n == 1:
        return float(len(adjusted[0]))
    # repeat groups: equal terms, members ordered by phrase offset
    by_term: dict = {}
    for i, t in enumerate(terms):
        by_term.setdefault(t, []).append(i)
    groups = [offs for offs in by_term.values() if len(offs) > 1]
    rpt_group = [-1] * n
    rpt_ind = [0] * n
    for g, offs in enumerate(groups):
        for r, i in enumerate(offs):
            rpt_group[i] = g
            rpt_ind[i] = r
    if not groups:
        return lucene_sloppy_freq(adjusted, slop)

    ptr = [0] * n
    pos = [adjusted[i][0] for i in range(n)]
    state = {"end": max(pos)}

    def advance_pp(i: int) -> bool:
        ptr[i] += 1
        if ptr[i] >= len(adjusted[i]):
            return False
        pos[i] = adjusted[i][ptr[i]]
        if pos[i] > state["end"]:
            state["end"] = pos[i]
        return True

    def collide(i: int):
        tp = pos[i] + i
        for j in groups[rpt_group[i]]:
            if j != i and pos[j] + j == tp:
                return j
        return None

    def lesser(i: int, j: int) -> int:
        if pos[i] < pos[j] or (pos[i] == pos[j] and i < j):
            return i
        return j

    # --- init: advanceRepeats (placeFirstPositions already done above) ---
    for i0 in range(n):
        if rpt_group[i0] < 0:
            continue
        i = i0
        while True:
            j = collide(i)
            if j is None:
                break
            a = lesser(i, j)
            if not advance_pp(a):
                return 0.0
            if rpt_ind[a] < rpt_ind[i]:
                i = a
    # fillQueue
    state["end"] = max(pos)
    heap = [(pos[i], i) for i in range(n)]
    _hq.heapify(heap)

    def advance_rpts(i0: int) -> bool:
        if rpt_group[i0] < 0:
            return True
        k0 = rpt_ind[i0]
        bits = set()
        i = i0
        while True:
            j = collide(i)
            if j is None:
                break
            a = lesser(i, j)
            if not advance_pp(a):
                return False
            if rpt_ind[j] != k0:
                bits.add(rpt_ind[j])
            i = a
        if bits:
            # re-queue members moved while in the queue (rptStack dance);
            # Lucene clears a bit on ANY popped repeater with a matching
            # rptInd — replicated exactly
            stack = []
            while bits:
                _, j2 = _hq.heappop(heap)
                stack.append(j2)
                if rpt_group[j2] >= 0 and rpt_ind[j2] in bits:
                    bits.discard(rpt_ind[j2])
            for j2 in reversed(stack):
                _hq.heappush(heap, (pos[j2], j2))
        return True

    freq = 0.0
    ppv, pp = _hq.heappop(heap)
    ml = state["end"] - ppv
    nextv = heap[0][0]
    while True:
        if not advance_pp(pp):
            break
        if not advance_rpts(pp):
            break
        if pos[pp] > nextv:
            if ml <= slop:
                freq += 1.0 / (1.0 + ml)
            _hq.heappush(heap, (pos[pp], pp))
            ppv, pp = _hq.heappop(heap)
            nextv = heap[0][0]
            ml = state["end"] - ppv
        else:
            ml = min(ml, state["end"] - pos[pp])
    if ml <= slop:
        freq += 1.0 / (1.0 + ml)
    return freq
