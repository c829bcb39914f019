"""Property tests for the Solr q= parser: structured inputs round-trip into
the expected clause sets, and arbitrary junk either parses or raises
ValueError — never a different exception (the CLI surfaces parse errors
as messages, so any other exception type is a crash).
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from archivesspace_virgo_spark.index.query_parser import parse_query

WORD = st.from_regex(re.compile(r"[a-z][a-z0-9]{0,8}"), fullmatch=True).filter(
    lambda w: w not in ("and", "or")
)


@settings(max_examples=200, deadline=None)
@given(st.lists(WORD, min_size=1, max_size=8))
def test_plain_terms_round_trip(words):
    pq = parse_query(" ".join(words))
    assert pq.terms == words
    assert pq.mode == "or" and not pq.exclude and pq.phrase is None


@settings(max_examples=200, deadline=None)
@given(st.lists(WORD, min_size=2, max_size=6), st.data())
def test_occurs_and_boosts_partition_terms(words, data):
    # distinct words so membership assertions are unambiguous
    words = list(dict.fromkeys(words))
    marks = [data.draw(st.sampled_from(["", "-", "^"])) for _ in words]
    parts, want_terms, want_excl, want_boosts = [], [], [], {}
    for w, m in zip(words, marks):
        if m == "-":
            parts.append(f"-{w}")
            want_excl.append(w)
        elif m == "^":
            parts.append(f"{w}^2.5")
            want_terms.append(w)
            want_boosts[w] = 2.5
        else:
            parts.append(w)
            want_terms.append(w)
    pq = parse_query(" ".join(parts))
    assert pq.terms == want_terms
    assert pq.exclude == want_excl
    assert pq.boosts == want_boosts


@settings(max_examples=200, deadline=None)
@given(st.lists(WORD, min_size=1, max_size=5),
       st.integers(min_value=0, max_value=9))
def test_phrase_with_slop_round_trips(words, slop):
    q = '"' + " ".join(words) + '"' + (f"~{slop}" if slop else "")
    pq = parse_query(q)
    assert pq.phrase == " ".join(words)
    assert pq.phrase_slop == slop


@settings(max_examples=200, deadline=None)
@given(st.lists(WORD, min_size=2, max_size=5))
def test_and_connective(words):
    words = list(dict.fromkeys(words))
    if len(words) < 2:
        return
    pq = parse_query(" AND ".join(words))
    assert pq.mode == "and" and pq.terms == words


@settings(max_examples=500, deadline=None)
@given(st.text(min_size=1, max_size=40))
def test_junk_never_raises_anything_but_valueerror(q):
    try:
        parse_query(q)
    except ValueError:
        pass  # the contract: unparseable input raises ValueError


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_multiterm_clause_classification(prefix, base):
    pq = parse_query(f"{prefix}* {base}~1 /{base}./ [{prefix} TO {base}]")
    assert pq.prefixes == [f"{prefix}*"]
    assert pq.fuzzies == [(base, 1)]
    assert pq.regexps == [f"{base}."]
    assert pq.ranges == [(prefix, base, True, True, None)]
