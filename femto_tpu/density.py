"""Combinatorial number system codec (n-choose-k offset encoding).

Counterpart of /root/reference/src/main/density.{h,c}: encode a k-subset of
{0..n-1} as its rank among all C(n,k) subsets, and decode back — used by the
reference for dense bitvector representations.  Vectorized table-based
implementation.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence

import numpy as np


@lru_cache(maxsize=None)
def _binom_table(n: int) -> np.ndarray:
    """C[i, j] for i, j in [0, n] as object ints (exact)."""
    C = np.zeros((n + 1, n + 1), dtype=object)
    for i in range(n + 1):
        C[i, 0] = 1
        for j in range(1, i + 1):
            C[i, j] = C[i - 1, j - 1] + C[i - 1, j]
    return C


def encode_subset(n: int, positions: Sequence[int]) -> int:
    """Rank of the sorted k-subset `positions` of {0..n-1} in colex order."""
    C = _binom_table(n)
    rank = 0
    for j, p in enumerate(sorted(positions), start=1):
        rank += int(C[p, j])
    return rank


def decode_subset(n: int, k: int, rank: int) -> List[int]:
    """Inverse of encode_subset."""
    C = _binom_table(n)
    out: List[int] = []
    r = rank
    for j in range(k, 0, -1):
        # largest p with C(p, j) <= r
        p = j - 1
        while p + 1 <= n - 1 and int(C[p + 1, j]) <= r:
            p += 1
        out.append(p)
        r -= int(C[p, j])
    return sorted(out)


def encode_bits(bits: np.ndarray) -> int:
    """Encode a fixed-popcount bit block as its combinatorial rank."""
    return encode_subset(len(bits), np.nonzero(bits)[0].tolist())


def decode_bits(n: int, k: int, rank: int) -> np.ndarray:
    out = np.zeros(n, dtype=bool)
    out[decode_subset(n, k, rank)] = True
    return out
