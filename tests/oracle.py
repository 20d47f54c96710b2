"""Naive host-side oracles for differential testing.

The analog of the reference's ground-truth comparisons: index_test.c builds
tiny indexes and checks requests against naive scans, and test.pl compares
query results to Perl-regex scans of the raw documents (SURVEY.md §4).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def naive_count(docs: Sequence[bytes], pattern: bytes) -> int:
    """Occurrences of pattern across docs (overlapping, per byte offset)."""
    if len(pattern) == 0:
        # matches every row of the index: total prepared length
        return sum(len(d) + 1 for d in docs)
    total = 0
    for d in docs:
        start = 0
        while True:
            i = d.find(pattern, start)
            if i < 0:
                break
            total += 1
            start = i + 1
    return total


def naive_locate(docs: Sequence[bytes], pattern: bytes) -> List[Tuple[int, int]]:
    """Sorted (doc_id, offset) of all matches."""
    out = []
    for di, d in enumerate(docs):
        start = 0
        while True:
            i = d.find(pattern, start)
            if i < 0:
                break
            out.append((di, i))
            start = i + 1
    return sorted(out)


def naive_docs(docs: Sequence[bytes], pattern: bytes) -> List[int]:
    """Sorted doc ids containing pattern."""
    return sorted({di for di, _ in naive_locate(docs, pattern)})
