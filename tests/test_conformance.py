"""End-to-end randomized differential conformance harness.

Port of the reference's src/test/test.pl (SURVEY.md §4.2): a fixed corpus of
adversarial documents (empty, \\x00\\x01\\x00, all 256 bytes) plus random
documents; ~50 random byte-string queries plus prefix/substring probes of
every document; doc ids and offsets compared against ground truth computed
by scanning the raw docs (the Perl-regex checkresults oracle, test.pl:173-230).
"""

import numpy as np
import pytest

import femto_tpu as ft
from tests.oracle import naive_count, naive_locate

MARK_PERIOD = 20  # test.pl:25-28 uses MARK_PERIOD=20, CHUNK_SIZE=64


def build_corpus(rng):
    docs = [
        b"",
        b"\x00\x01\x00",
        bytes(range(256)),
        b"a",
        b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    ]
    for _ in range(20):
        L = int(rng.integers(0, 500))
        alphabet = rng.choice([2, 4, 256])
        docs.append(bytes(rng.integers(0, alphabet, size=L).astype(np.uint8)))
    return docs


@pytest.fixture(scope="module")
def conformance_index():
    rng = np.random.default_rng(0xC0FFEE)
    docs = build_corpus(rng)
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=MARK_PERIOD)
    return docs, index, rng


def gen_queries(docs, rng):
    queries = []
    # ~50 random byte strings (test.pl:252-270)
    for _ in range(50):
        L = int(rng.integers(1, 8))
        alphabet = rng.choice([2, 4, 256])
        queries.append(bytes(rng.integers(0, alphabet, size=L).astype(np.uint8)))
    # prefix and substring probes of every doc
    for d in docs:
        if len(d) >= 1:
            queries.append(d[: min(4, len(d))])
        if len(d) >= 6:
            mid = len(d) // 2
            queries.append(d[mid : mid + 5])
        if len(d) >= 1:
            queries.append(d[-3:])
    return queries


def test_count_conformance(conformance_index):
    docs, index, rng = conformance_index
    queries = gen_queries(docs, rng)
    counts = ft.count(index, queries)
    for q, c in zip(queries, counts):
        want = naive_count(docs, q)
        assert c == want, (q, int(c), want)


def test_locate_conformance(conformance_index):
    docs, index, rng = conformance_index
    queries = gen_queries(docs, rng)
    # offsets checked on EVERY query (test.pl:173-230 checks all)
    for q in queries:
        got = ft.locate(index, q, max_matches=None)
        want = naive_locate(docs, q)
        assert got == want, (q, got[:10], want[:10])


def test_extract_all_docs(conformance_index):
    docs, index, rng = conformance_index
    for di, d in enumerate(docs):
        assert ft.extract_document(index, di) == d, di
