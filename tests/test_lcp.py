"""LCP family tests: Kasai vs naive, FindUnique, kmers, similarity."""

import numpy as np
import pytest

import femto_tpu as ft
from femto_tpu.lcp import (
    _kasai_np,
    extract_unique_kmers,
    lcp_array,
    sparse_plcp,
    suffix_similarity,
    unique_lengths,
)
from femto_tpu.suffix import suffix_array_np


def naive_lcp(text, sa):
    n = len(text)
    out = np.zeros(n, dtype=np.int32)
    for r in range(1, n):
        i, j = int(sa[r - 1]), int(sa[r])
        h = 0
        while i + h < n and j + h < n and text[i + h] == text[j + h]:
            h += 1
        out[r] = h
    return out


def test_lcp_matches_naive(rng):
    for _ in range(5):
        n = int(rng.integers(2, 300))
        text = rng.integers(1, 5, size=n).astype(np.uint16)
        sa = suffix_array_np(text)
        want = naive_lcp(text, sa)
        np.testing.assert_array_equal(lcp_array(text, sa), want)
        np.testing.assert_array_equal(_kasai_np(text, sa), want)


def test_sparse_plcp(rng):
    n = 200
    text = rng.integers(1, 5, size=n).astype(np.uint16)
    sa = suffix_array_np(text)
    lcp = naive_lcp(text, sa)
    plcp_full = np.zeros(n, np.int32)
    plcp_full[sa] = lcp
    sp = sparse_plcp(text, sa, q=16)
    np.testing.assert_array_equal(sp, plcp_full[::16])


def naive_unique_lengths(docs, prepared):
    """Brute force: shortest unique-within-corpus substring at each pos."""
    from tests.oracle import naive_count

    out = np.zeros(prepared.n, dtype=np.int32)
    for di, d in enumerate(docs):
        base = int(prepared.doc_starts[di])
        for i in range(len(d)):
            got = 0
            for L in range(1, len(d) - i + 1):
                if naive_count(docs, d[i : i + L]) == 1:
                    got = L
                    break
            out[base + i] = got
    return out


def test_unique_lengths():
    docs = [b"abcabcx", b"banana"]
    prepared = ft.prepare_documents(docs)
    sa = suffix_array_np(prepared.text.astype(np.int64))
    got = unique_lengths(prepared, sa)
    want = naive_unique_lengths(docs, prepared)
    np.testing.assert_array_equal(got, want)


def test_extract_unique_kmers():
    docs = [b"abcabcx", b"banana"]
    prepared = ft.prepare_documents(docs)
    sa = suffix_array_np(prepared.text.astype(np.int64))
    km = extract_unique_kmers(prepared, sa, k=3)
    want = naive_unique_lengths(docs, prepared)
    expect = []
    for di in range(len(docs)):
        base = int(prepared.doc_starts[di])
        for i in range(len(docs[di])):
            if 0 < want[base + i] <= 3:
                expect.append((di, i))
    assert km == expect


def test_suffix_similarity():
    docs = [b"the quick brown fox", b"the quick red fox", b"zzzzzz"]
    prepared = ft.prepare_documents(docs)
    sa = suffix_array_np(prepared.text.astype(np.int64))
    sim = suffix_similarity(prepared, sa, min_lcp=4)
    assert (0, 1) in sim and sim[(0, 1)] > 0
    assert (0, 2) not in sim and (1, 2) not in sim


def test_device_lcp_parity(rng):
    """The parallel windowed-compare LCP must equal host Kasai, including
    long-run corpora that force several window-doubling rounds."""
    from femto_tpu.lcp import _kasai_np, lcp_array

    for docs in [
        [bytes(rng.integers(97, 101, size=3000).astype(np.uint8))],
        [b"a" * 500 + b"b" + b"a" * 300],            # LCPs in the hundreds
        [bytes(rng.integers(0, 256, size=2000).astype(np.uint8)),
         b"banana banana banana"],
    ]:
        prepared = ft.prepare_documents(docs)
        sa = np.asarray(ft.suffix_array(
            np.asarray(prepared.text, dtype=np.int32)))
        want = _kasai_np(prepared.text.astype(np.uint16),
                         sa.astype(np.int32))
        got = lcp_array(prepared.text, sa, device=True)
        np.testing.assert_array_equal(got, want)


def test_sparse_plcp_no_full_pass(rng):
    """sparse_plcp computes only sampled values; parity vs the full-array
    reconstruction."""
    from femto_tpu.lcp import _kasai_np, sparse_plcp

    docs = [bytes(rng.integers(97, 103, size=5000).astype(np.uint8))]
    prepared = ft.prepare_documents(docs)
    sa = np.asarray(ft.suffix_array(
        np.asarray(prepared.text, dtype=np.int32)))
    lcp = _kasai_np(prepared.text.astype(np.uint16), sa.astype(np.int32))
    n = prepared.n
    plcp_full = np.zeros(n, np.int32)
    plcp_full[sa] = lcp
    for q in (16, 64):
        got = sparse_plcp(prepared.text, sa, q=q)
        np.testing.assert_array_equal(got, plcp_full[::q])
