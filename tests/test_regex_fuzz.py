"""Randomized differential fuzz of the regex engine against Python `re`.

Generates random small regexes over a small alphabet and random corpora;
compares distinct-match-start counts and matching doc sets.
"""

import re

import numpy as np
import pytest

import femto_tpu as ft
from femto_tpu.query.engine import count_query, docs_query


def gen_regex(rng, depth=0):
    """Random regex as (femto_syntax, python_syntax) — subset common to
    both: literals, ., [..], alternation, grouping, * + ? {m,n}."""
    r = rng.random()
    if depth >= 3 or r < 0.35:
        s = "".join(rng.choice(list("abcd")) for _ in range(rng.integers(1, 4)))
        return s, s
    if r < 0.5:
        chars = sorted(set(rng.choice(list("abcd"), size=rng.integers(1, 4))))
        s = "[" + "".join(chars) + "]"
        return s, s
    if r < 0.6:
        return ".", "(?s:.)"
    if r < 0.75:
        a_f, a_p = gen_regex(rng, depth + 1)
        b_f, b_p = gen_regex(rng, depth + 1)
        return f"({a_f}|{b_f})", f"(?:{a_p}|{b_p})"
    # repetition over a subexpression
    a_f, a_p = gen_regex(rng, depth + 1)
    op = rng.choice(["*", "+", "?", "{1,2}", "{2}"])
    return f"({a_f}){op}", f"(?:{a_p}){op}"


def py_count(docs, py_pattern):
    pat = re.compile(py_pattern.encode())
    total = 0
    for d in docs:
        for i in range(len(d)):
            m = pat.match(d, i)
            if m:
                total += 1
    return total


def py_docs(docs, py_pattern):
    pat = re.compile(py_pattern.encode())
    return sorted(
        di for di, d in enumerate(docs)
        if any(pat.match(d, i) for i in range(len(d)))
    )


@pytest.mark.parametrize("seed", range(6))
def test_regex_fuzz(seed):
    rng = np.random.default_rng(1000 + seed)
    docs = [
        bytes(rng.choice(list(b"abcd"), size=int(rng.integers(5, 120)))
              .astype(np.uint8))
        for _ in range(6)
    ]
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=8)
    for _ in range(12):
        fq, pq = gen_regex(rng)
        empty_ok = re.compile(pq.encode()).match(b"") is not None
        want = py_count(docs, pq)
        if empty_ok:
            # empty-matching regexes match every index row, including the
            # per-doc terminator rows (same convention as the empty pattern:
            # count(b"") == n)
            want += len(docs)
        got = count_query(index, fq)
        assert got == want, (fq, pq, got, want)
        wantd = (list(range(len(docs))) if empty_ok else py_docs(docs, pq))
        gotd = [d for d, _, _ in docs_query(index, fq, with_offsets=False)]
        assert gotd == wantd, (fq, pq)
