"""Solr/Lucene query-string parser (the ``q=`` syntax the reference sends
to its select handler: ``user_mtime:[NOW-24HOUR TO NOW] AND
types:repository`` IndexRecords.java:124-132,174, field scoping and boolean
AND included; plus the standard-parser clause forms that handler accepts —
quoted phrases, ``-``/``+`` occurs, ``term^2`` boosts, ``pre*``/``te?t``
wildcards, ``term~N`` fuzzy, ``/re/`` regexp, ``[a TO b]`` ranges).

``parse_query`` is a PURE function string → ParsedQuery; dispatching the
parsed clauses to the engine (``QueryEngine.query``) lives next to the
other query operators.  The grammar is the pragmatic subset the reference
exercises, one clause family per query:

    clause   := [occur] [field ':'] body [boost]
    occur    := '+' | '-'                      (MUST / MUST_NOT)
    body     := '"' words '"'                  (phrase)
              | '[' lo TO hi ']' | '{' lo TO hi '}'   (term range)
              | '/' regex '/'                  (regexp)
              | word                           (term; may carry * ? ~N)
    boost    := '^' number
    connective 'AND' between clauses → every positive clause required
    (q.op=AND); default is OR.  'OR' is accepted and is the default.
    '+term' (MUST) requires that term while leaving bare terms optional
    (Lucene BooleanClause.Occur.MUST next to SHOULD clauses); '+' on a
    multi-term clause (prefix/wildcard/fuzzy/regexp/range) raises.

Unsupported combinations raise ValueError rather than silently mis-scoring
(Lucene parity: a phrase cannot carry a wildcard; we additionally refuse
mixing a phrase clause with term clauses because the engine scores the two
families in different kernels).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

_TOKEN_RX = re.compile(
    r"""
    \s*(?:
        (?P<and>AND\b) |
        (?P<or>OR\b) |
        (?P<occur>[+-]) |
        (?P<phrase>(?P<fldp>[A-Za-z_][\w]*:)?"(?P<phrase_body>[^"]*)"
                   (?:~(?P<slop>\d+))?) |
        (?P<range>(?P<fldr>[A-Za-z_][\w]*:)?
                  (?P<lob>[\[{])(?P<lo>[^\s\]}]+|\*)\s+TO\s+
                  (?P<hi>[^\s\]}]+|\*)(?P<hib>[\]}])) |
        (?P<regex>(?P<fldx>[A-Za-z_][\w]*:)?/(?P<regex_body>[^/]*)/) |
        (?P<word>[^\s^]+)
    )(?:\^(?P<boost>\d+(?:\.\d+)?))?
    """,
    re.VERBOSE,
)


@dataclass
class ParsedQuery:
    """One clause family, engine-dispatchable."""
    terms: List[str] = field(default_factory=list)       # literal terms
    must: List[str] = field(default_factory=list)        # '+term' MUST terms
    exclude: List[str] = field(default_factory=list)     # MUST_NOT terms
    boosts: Dict[str, float] = field(default_factory=dict)
    mode: str = "or"                                     # 'or' | 'and'
    phrase: Optional[str] = None                         # '"w1 w2"' body
    phrase_field: Optional[str] = None
    phrase_slop: int = 0                                 # '"w1 w2"~N'
    # lexicon-expansion clauses, resolved by the engine before scoring:
    prefixes: List[str] = field(default_factory=list)    # 'pre*'
    wildcards: List[str] = field(default_factory=list)   # 'te?t', '*x*'
    fuzzies: List[Tuple[str, int]] = field(default_factory=list)  # (t, edits)
    regexps: List[str] = field(default_factory=list)
    ranges: List[Tuple[Optional[str], Optional[str], bool, bool,
                       Optional[str]]] = field(default_factory=list)
    # ranges: (lo, hi, include_lo, include_hi, field)


def parse_query(q: str) -> ParsedQuery:
    out = ParsedQuery()
    pos = 0
    pending_occur = None
    saw_and = False
    saw_positive_connected = 0
    q = q.strip()
    while pos < len(q):
        m = _TOKEN_RX.match(q, pos)
        if not m or m.end() == pos:
            raise ValueError(f"unparseable query at: {q[pos:pos + 20]!r}")
        pos = m.end()
        boost = float(m.group("boost")) if m.group("boost") else None
        if m.group("and"):
            saw_and = True
            continue
        if m.group("or"):
            continue
        if m.group("occur"):
            pending_occur = m.group("occur")
            continue
        occur, pending_occur = pending_occur, None

        if m.group("phrase") is not None:
            body = m.group("phrase_body").strip()
            if occur == "-":
                raise ValueError("negated phrase clauses are not supported")
            # '+phrase' is accepted: a lone phrase clause is implicitly
            # required (MUST and SHOULD are indistinguishable for a
            # single-clause query, and mixing phrase + terms is rejected)
            if out.phrase is not None:
                raise ValueError("only one phrase clause per query")
            if boost is not None:
                raise ValueError("phrase boosts are not supported")
            out.phrase = body
            out.phrase_field = (m.group("fldp") or "").rstrip(":") or None
            out.phrase_slop = int(m.group("slop") or 0)
            continue

        if m.group("range") is not None:
            fld = (m.group("fldr") or "").rstrip(":") or None
            lo = None if m.group("lo") == "*" else m.group("lo")
            hi = None if m.group("hi") == "*" else m.group("hi")
            if occur is not None or boost is not None:
                raise ValueError(
                    "range clauses support neither occurs nor boosts here")
            out.ranges.append(
                (lo, hi, m.group("lob") == "[", m.group("hib") == "]", fld)
            )
            continue

        if m.group("regex") is not None:
            fld = (m.group("fldx") or "").rstrip(":")
            body = m.group("regex_body")
            if occur is not None or boost is not None:
                raise ValueError(
                    "regexp clauses support neither occurs nor boosts here")
            out.regexps.append(f"{fld}:{body}" if fld else body)
            continue

        word = m.group("word")
        fuzzy = re.fullmatch(r"(.+)~(\d*)", word)
        if fuzzy:
            base, edits = fuzzy.group(1), int(fuzzy.group(2) or 2)
            if occur is not None or boost is not None:
                raise ValueError(
                    "fuzzy clauses support neither occurs nor boosts here")
            out.fuzzies.append((base, edits))
            continue
        if "*" in word or "?" in word:
            if occur is not None or boost is not None:
                raise ValueError(
                    "wildcard clauses support neither occurs nor boosts here")
            if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
                out.prefixes.append(word)
            else:
                out.wildcards.append(word)
            continue
        if occur == "-":
            out.exclude.append(word)
            continue
        if occur == "+":
            # Lucene BooleanClause.Occur.MUST: the doc must match this
            # term; remaining bare terms stay optional (SHOULD) and still
            # contribute to the score (boolean_search optional_terms)
            out.must.append(word)
        else:
            out.terms.append(word)
        if boost is not None:
            out.boosts[word] = boost
        saw_positive_connected += 1

    if pending_occur:
        raise ValueError(f"dangling occur operator {pending_occur!r}")
    if out.phrase is not None and (
        out.terms or out.must or out.prefixes or out.wildcards
        or out.fuzzies or out.regexps or out.ranges
    ):
        raise ValueError(
            "mixing a phrase clause with term clauses is not supported "
            "(the engine scores the two families in different kernels)"
        )
    if saw_and:
        out.mode = "and"
    return out
