"""Device-frontier regex engine must match the host engine exactly."""

import numpy as np
import pytest

import femto_tpu as ft
from femto_tpu.query.ast import ApproxSettings
from femto_tpu.query.nfa import compile_nfa
from femto_tpu.query.parser import parse_query
from femto_tpu.query.regexp import run_regexp
from femto_tpu.query.regexp_device import run_regexp_device


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    docs = [
        b"the quick brown fox jumps over the lazy dog",
        b"banana bandana bananas",
        b"abcabcabcabc",
        bytes(rng.integers(97, 101, size=300).astype(np.uint8)),
    ]
    prepared = ft.prepare_documents(docs)
    return docs, ft.build_index(prepared, seg=64, mark_period=8)


def ranges(ms):
    return sorted((m.first, m.last, m.cost) for m in ms)


@pytest.mark.parametrize("q", [
    "quick", "ban(ana|dana)", "ab[cd]", "b.n", "a+b", "(abc){2}",
    "shee?p|fox", "[ab]{3}",
])
def test_device_matches_host_exact(corpus, q):
    docs, index = corpus
    node = parse_query(q)
    nfa = compile_nfa(node.regexp)
    host = run_regexp(index, nfa)
    dev = run_regexp_device(index, nfa)
    assert ranges(dev) == ranges(host), q


@pytest.mark.parametrize("q,settings", [
    ("quick", ApproxSettings.edit_distance(1)),
    ("quack", ApproxSettings.edit_distance(1)),
    ("bananna", ApproxSettings.edit_distance(1)),
    ("abcabc", ApproxSettings(cost_bound=2, subst_cost=2,
                              delete_cost=1, insert_cost=2)),
])
def test_device_matches_host_approx(corpus, q, settings):
    docs, index = corpus
    node = parse_query(q)
    nfa = compile_nfa(node.regexp)
    host = run_regexp(index, nfa, settings)
    dev = run_regexp_device(index, nfa, settings)
    assert ranges(dev) == ranges(host), q


def test_device_strings(corpus):
    docs, index = corpus
    node = parse_query("ban(ana|dana)")
    nfa = compile_nfa(node.regexp)
    dev = run_regexp_device(index, nfa, with_strings=True)
    host = run_regexp(index, nfa)
    assert sorted(m.match for m in dev) == sorted(m.match for m in host)
    assert b"banana" in {m.match for m in dev}


def test_device_long_match_capacity_retry(corpus):
    """Matches longer than the initial max_len=64 must not be silently
    dropped: the device engine retries with larger capacities (advisor
    round-1 high finding)."""
    docs = [b"x" * 70 + b"L", b"filler doc"]
    index = ft.build_index(ft.prepare_documents(docs), seg=64, mark_period=8)
    node = parse_query("x{70}L")
    nfa = compile_nfa(node.regexp)
    host = run_regexp(index, nfa)
    dev = run_regexp_device(index, nfa)
    assert ranges(dev) == ranges(host)
    assert len(dev) == 1


def test_device_no_subst_on_last_char(corpus):
    """Substitutions are never applied at the pattern's last character
    (QUERY_FORMAT.txt; advisor round-1 medium finding): device and host
    engines must return identical APPROX match sets."""
    docs, index = corpus
    node = parse_query("APPROX 1 hello")
    nfa = compile_nfa(node.regexp)
    settings = node.approx
    host = run_regexp(index, nfa, settings)
    dev = run_regexp_device(index, nfa, settings)
    assert ranges(dev) == ranges(host)
