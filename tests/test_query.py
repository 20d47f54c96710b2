"""Query language + regex engine tests, differential against Python `re`."""

import re

import numpy as np
import pytest

import femto_tpu as ft
from femto_tpu.query import parse_query, compile_nfa
from femto_tpu.query.ast import QTerm, QAnd, QOr, QNot, QThen, QWithin, as_literal
from femto_tpu.query.engine import count_query, docs_query, find_strings
from femto_tpu.query.regexp import run_regexp, match_rows
from tests.oracle import naive_count, naive_docs


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    docs = [
        b"the quick brown fox jumps over the lazy dog",
        b"pack my box with five dozen liquor jugs",
        b"sheep black sheep baa baa black",
        b"abcabcabcabc",
        b"banana bandana bananas",
        bytes(rng.integers(97, 103, size=400).astype(np.uint8)),  # a..f soup
    ]
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=8)
    return docs, index


def regex_count(docs, pattern: str) -> int:
    """Distinct match-start positions across docs (overlapping starts)."""
    pat = re.compile(pattern.encode(), re.DOTALL)
    total = 0
    for d in docs:
        for i in range(len(d)):
            if pat.match(d, i):
                total += 1
    return total


def regex_docs(docs, pattern: str):
    pat = re.compile(pattern.encode(), re.DOTALL)
    return sorted(
        di for di, d in enumerate(docs)
        if any(pat.match(d, i) for i in range(len(d)))
    )


# ---------- parser ----------

def test_parse_literal_concat():
    node = parse_query("black sheep")
    assert isinstance(node, QTerm)
    assert as_literal(node.regexp) == b"blacksheep"


def test_parse_quoting():
    assert as_literal(parse_query(r"black\ sheep").regexp) == b"black sheep"
    assert as_literal(parse_query('"black sheep"').regexp) == b"black sheep"
    assert as_literal(parse_query("'bl\\ack'").regexp) == b"bl\\ack"
    assert as_literal(parse_query(r"\x41\x42").regexp) == b"AB"
    assert as_literal(parse_query("{x 41 42 }").regexp) == b"AB"
    assert as_literal(parse_query("{x4142}").regexp) == b"AB"
    assert as_literal(parse_query(r"\n\t").regexp) == b"\n\t"


def test_parse_boolean():
    node = parse_query("black AND sheep")
    assert isinstance(node, QAnd)
    node = parse_query("black THEN 20 sheep")
    assert isinstance(node, QThen) and node.distance == 20
    node = parse_query("(black AND sheep) OR dog")
    assert isinstance(node, QOr) and isinstance(node.left, QAnd)
    node = parse_query("a AND b OR c")  # left-assoc
    assert isinstance(node, QOr) and isinstance(node.left, QAnd)


def test_parse_approx():
    node = parse_query("APPROX 2 blacksheep")
    assert isinstance(node, QTerm) and node.approx.cost_bound == 3
    node = parse_query("APPROX 1:2:1:2 blacksheep")
    assert node.approx.subst_cost == 2 and node.approx.insert_cost == 2
    node = parse_query("APPROX blacksheep")
    assert node.approx.cost_bound == 2


# ---------- exact regexp over index ----------

@pytest.mark.parametrize("q,py", [
    ("quick", "quick"),
    ("ban(ana|dana)", "ban(ana|dana)"),
    ("ba+", "ba+"),
    ("b.x", "b.x"),
    ("[bl]a", "[bl]a"),
    ("ab[cd]ab", "ab[cd]ab"),
    ("shee?p", "shee?p"),
    ("a{2,3}", "a{2,3}"),
    ("(abc){2}", "(abc){2}"),
    ("[^a-z]", "[^a-z]"),
])
def test_regexp_count_parity(corpus, q, py):
    docs, index = corpus
    assert count_query(index, q) == regex_count(docs, py), q


def test_regexp_docs_parity(corpus):
    docs, index = corpus
    for q, py in [("ban(ana|dana)", "ban(ana|dana)"), ("b.x", "b.x")]:
        got = [d for d, _, _ in docs_query(index, q)]
        assert got == regex_docs(docs, py), q


def test_find_strings(corpus):
    docs, index = corpus
    ms = find_strings(index, "ban(ana|dana)a?")
    strings = sorted(m.match for m in ms)
    assert b"banana" in strings and b"bandana" in strings


# ---------- boolean ----------

def test_boolean_queries(corpus):
    docs, index = corpus
    got = [d for d, _, _ in docs_query(index, "black AND sheep")]
    assert got == sorted(set(naive_docs(docs, b"black")) & set(naive_docs(docs, b"sheep")))
    got = [d for d, _, _ in docs_query(index, "black OR quick")]
    assert got == sorted(set(naive_docs(docs, b"black")) | set(naive_docs(docs, b"quick")))
    got = [d for d, _, _ in docs_query(index, "ba NOT sheep")]
    assert got == sorted(set(naive_docs(docs, b"ba")) - set(naive_docs(docs, b"sheep")))


def test_then_within(corpus):
    docs, index = corpus
    # "black THEN 6 sheep": sheep starts within 6 chars after black's start
    got = [d for d, _, _ in docs_query(index, "black THEN 6 sheep")]
    assert got == [2]
    # sheep comes before black in doc2 within 6: WITHIN should also match
    got = [d for d, _, _ in docs_query(index, "sheep WITHIN 6 black")]
    assert got == [2]
    got = [d for d, _, _ in docs_query(index, "sheep THEN 2 black")]
    assert got == []


# ---------- approximate ----------

def test_approx_basic(corpus):
    docs, index = corpus
    # exact matches are always returned
    assert count_query(index, "APPROX 1 quick") >= 1
    # one substitution: "quack" ~ "quick"
    ms = find_strings(index, "APPROX 1 quack")
    assert any(m.match == b"quick" for m in ms)
    # deletion: pattern "quicck" matches text "quick" (char missing in data)
    ms = find_strings(index, "APPROX 1 quicck")
    assert any(m.match == b"quick" for m in ms)
    # insertion: pattern "quck" matches text "quick" (extra char in data)
    ms = find_strings(index, "APPROX 1 quck")
    assert any(m.match == b"quick" for m in ms)
    # cost 0 for exact even with approx on
    ms = find_strings(index, "APPROX 1 quick")
    exact = [m for m in ms if m.match == b"quick"]
    assert exact and exact[0].cost == 0


def test_approx_costs(corpus):
    docs, index = corpus
    # deletions only (subst and insert cost 2 > bound 1)
    ms = find_strings(index, "APPROX 1:2:1:2 quicck")
    assert any(m.match == b"quick" for m in ms)
    ms = find_strings(index, "APPROX 1:2:1:2 quack")  # needs subst: no match
    assert not any(m.match == b"quick" for m in ms)


def test_query_planning(corpus):
    docs, index = corpus
    from femto_tpu.query.planning import matches_empty, streamline
    from femto_tpu.query.parser import parse_query

    # unanchored wildcards are hoisted: .*abc.* == abc
    assert count_query(index, ".*quick.*") == regex_count(docs, "quick")
    assert count_query(index, "quick.*") == regex_count(docs, "quick")
    # empty-matching regexp matches every row
    assert count_query(index, "a*") == index.meta.n
    node = parse_query("x?")
    assert matches_empty(node.regexp)


def test_icase(corpus):
    docs, index = corpus
    from femto_tpu.query.engine import count_query as cq

    assert cq(index, "QUICK", icase=True) == regex_count(docs, "quick")
    assert cq(index, "QUICK") == 0
    assert cq(index, "Shee?P", icase=True) == regex_count(docs, "shee?p")


def test_then_within_docs_only(corpus):
    """THEN/WITHIN must work when the caller only wants documents
    (need_offsets=False): operands are forced to carry offsets (advisor
    round-1 medium finding)."""
    docs, index = corpus
    got = [d for d, _, _ in docs_query(index, "black THEN 6 sheep",
                                       with_offsets=False)]
    assert got == [2]


def test_then_within_vectorized_parity():
    """The searchsorted window join must agree with a brute-force oracle on
    randomized (doc, offset) sets."""
    from femto_tpu.query.results import Results, then_within

    rng = np.random.default_rng(11)
    for trial in range(20):
        na, nb = rng.integers(1, 120, size=2)
        a = Results.from_doc_offsets(
            rng.integers(0, 8, size=na), rng.integers(0, 400, size=na))
        b = Results.from_doc_offsets(
            rng.integers(0, 8, size=nb), rng.integers(0, 400, size=nb))
        for ordered in (True, False):
            dist = int(rng.integers(0, 60))
            got = then_within(a, b, dist, ordered=ordered)
            keep = []
            for doc, off in zip(a.docs, a.offsets):
                delta = b.offsets[b.docs == doc] - off
                ok = ((delta >= 0) & (delta <= dist) if ordered
                      else np.abs(delta) <= dist)
                if ok.any():
                    keep.append((doc, off))
            want = sorted(keep)
            assert sorted(zip(got.docs, got.offsets)) == want


def test_subsumption_prune(corpus):
    """Nested result ranges (a longer string's rows inside a shorter
    string's range) are pruned like the reference's regexp_result_list_sort
    (server.c:1476-1563): 'a|ab' reports only the containing 'a' range."""
    from femto_tpu.query.regexp import RegexpMatch, dedupe_matches

    docs, index = corpus
    ms = find_strings(index, "ban(a|an)")
    ranges = [(m.first, m.last) for m in ms]
    for i, (f1, l1) in enumerate(ranges):
        for j, (f2, l2) in enumerate(ranges):
            if i != j:
                assert not (f2 >= f1 and l2 <= l1), (ranges, i, j)
    # direct unit: widest kept, nested dropped, duplicate keeps min cost
    out = dedupe_matches([
        RegexpMatch(10, 20, 1, b"a"),
        RegexpMatch(12, 18, 0, b"ab"),
        RegexpMatch(10, 20, 0, b"a"),
        RegexpMatch(25, 30, 2, b"c"),
    ])
    assert [(m.first, m.last, m.cost) for m in out] == \
        [(10, 20, 0), (25, 30, 2)]


def test_boolean_truncation_flagged(corpus, monkeypatch):
    """Default Boolean evaluation is FULL (exact, streamed, uncapped —
    reference semantics, results.h:115-121); only a caller who opts out
    (full_eval=False) gets capped terms, and THAT truncation is flagged
    (Results.truncated + TruncationWarning), never silent."""
    import warnings

    from femto_tpu.query import engine

    docs, index = corpus
    # every doc contains 'a'; the opt-out cap sits below the 'a' rows
    total_a = count_query(index, "a")
    assert total_a > 4
    monkeypatch.setattr(engine, "BOOLEAN_TERM_CAP", 4)
    node = parse_query("a AND b")
    # default: full evaluation — exact, no truncation, no warning,
    # regardless of the cap value
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        res = engine.execute(index, node)
        assert not res.truncated
        full_rows = engine.docs_query(index, "a AND b")
        engine.count_query(index, "a AND b")
    # opting out of full evaluation caps each operand and flags it
    res = engine.execute(index, node, term_cap=engine.BOOLEAN_TERM_CAP)
    assert res.truncated
    with pytest.warns(engine.TruncationWarning):
        capped_rows = engine.docs_query(index, "a AND b", full_eval=False)
    rows, truncated = engine.docs_query_ex(index, "a AND b",
                                           full_eval=False)
    assert truncated
    # the capped doc set is a subset of the exact one
    assert {d for d, _, _ in capped_rows} <= {d for d, _, _ in full_rows}
    # an uncapped opt-out Boolean stays clean
    monkeypatch.setattr(engine, "BOOLEAN_TERM_CAP", 1_000_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        engine.docs_query(index, "black AND sheep", full_eval=False)
    # a top-level term limited by the CALLER's max_matches is requested
    # truncation, not an incomplete Boolean: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows, truncated = engine.docs_query_ex(index, "a", max_matches=2)
    assert not truncated


def test_boolean_and_over_million_row_term_exact():
    """VERDICT r4 #6 'done' criterion: an AND whose operand matches more
    than 1M rows (beyond one LOCATE_WINDOW) returns the EXACT doc set with
    no TruncationWarning.  The direct-locate tier keeps the >1M-row
    streaming locate fast on the CPU backend."""
    import warnings

    import femto_tpu as ft
    from femto_tpu.query import engine

    doc_len = 65536
    ndocs = 20
    b_docs = {3, 11, 17}
    docs = []
    for d in range(ndocs):
        body = bytearray(b"a" * doc_len)
        if d in b_docs:
            body[100:101] = b"b"
        docs.append(bytes(body))
    prep = ft.prepare_documents(docs)
    index = ft.build_index(prep, seg=256, mark_period=32, tier="packed",
                           locate="direct")
    total_a = engine.count_query(index, "a")
    assert total_a > 1_000_000  # the term really exceeds one window
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = {d for d, _, _ in engine.docs_query(index, "a AND b")}
    assert got == b_docs


def test_boolean_windowed_streaming_exact(corpus, monkeypatch):
    """Full evaluation streams offset-bearing terms in LOCATE_WINDOW-row
    windows; shrinking the window must not change any answer (exactness
    across window boundaries)."""
    from femto_tpu.query import engine

    docs, index = corpus
    want = {d for d, _, _ in engine.docs_query(index, "a AND b")}
    monkeypatch.setattr(engine, "LOCATE_WINDOW", 8)
    got = {d for d, _, _ in engine.docs_query(index, "a AND b")}
    assert got == want
    # THEN needs offsets from both operands: exercise the windowed path
    want_t = [d for d, _, _ in engine.docs_query(index, "black THEN 6 sheep")]
    monkeypatch.setattr(engine, "LOCATE_WINDOW", 4)
    got_t = [d for d, _, _ in engine.docs_query(index, "black THEN 6 sheep")]
    assert got_t == want_t
