"""LCP arrays and the suffix-analysis application family.

Counterparts of the reference's Chapel application layer
(/root/reference/src/ssort_chpl/): computeSuffixArrayAndLCP + sparse PLCP
(SuffixSort.chpl:125-160), FindUnique (minimal unique substrings per
position, FindUnique.chpl), ExtractUniqueKmers, and SuffixSimilarity
(block-LCP common-substring scoring, SuffixSimilarity.chpl).

LCP itself is Kasai's O(n) pass — inherently sequential, so it runs in the
native C++ library (ft_kasai) with a numpy fallback; everything downstream
(unique lengths, kmer extraction, similarity scoring) is vectorized.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import numpy as np

from .alphabet import PreparedText


def lcp_array(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """lcp[r] = LCP of suffixes SA[r-1], SA[r]; lcp[0] = 0."""
    n = len(text)
    text = np.ascontiguousarray(text, dtype=np.uint16)
    sa32 = np.ascontiguousarray(sa, dtype=np.int32)
    out = np.zeros(n, dtype=np.int32)
    from .io import native as nat

    if n and nat.ensure_built():
        nat._lib.ft_kasai.restype = ctypes.c_int
        rc = nat._lib.ft_kasai(
            text.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            sa32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
    return _kasai_np(text, sa32)


def _kasai_np(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    n = len(text)
    lcp = np.zeros(n, dtype=np.int32)
    if n == 0:
        return lcp
    rank = np.zeros(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = int(sa[r - 1])
            while i + h < n and j + h < n and text[i + h] == text[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def sparse_plcp(text: np.ndarray, sa: np.ndarray, q: int = 64) -> np.ndarray:
    """Sampled PLCP (Kärkkäinen): plcp values at positions 0, q, 2q, ...
    The full PLCP can be reconstructed within q of a sample
    (computeSparsePLCP, SuffixSort.chpl:143)."""
    lcp = lcp_array(text, sa)
    n = len(text)
    plcp = np.zeros(n, dtype=np.int32)
    plcp[np.asarray(sa, dtype=np.int64)] = lcp
    return plcp[::q].copy()


def unique_lengths(prepared: PreparedText, sa: np.ndarray,
                   lcp: Optional[np.ndarray] = None) -> np.ndarray:
    """FindUnique: for each text position i, the length of the shortest
    substring starting at i that occurs nowhere else (0 if none exists
    within the document).  minUnique[i] = 1 + max(lcp with SA neighbors);
    capped at the document boundary (FindUnique.chpl semantics: output is a
    per-position length array)."""
    text = prepared.text
    n = len(text)
    if lcp is None:
        lcp = lcp_array(text, sa)
    rank = np.zeros(n, dtype=np.int64)
    rank[np.asarray(sa, dtype=np.int64)] = np.arange(n)
    lcp_next = np.concatenate([lcp[1:], np.zeros(1, np.int32)])
    need = 1 + np.maximum(lcp[rank], lcp_next[rank]).astype(np.int64)
    # distance to end of document (excluding the SEOF terminator)
    pos = np.arange(n, dtype=np.int64)
    doc_of = np.searchsorted(prepared.doc_starts, pos, side="right") - 1
    doc_content_end = prepared.doc_starts[doc_of + 1] - 1
    room = doc_content_end - pos
    out = np.where(need <= room, need, 0).astype(np.int32)
    # positions at/after a doc's content end (the SEOF itself) are 0
    out[room <= 0] = 0
    return out


def extract_unique_kmers(prepared: PreparedText, sa: np.ndarray, k: int,
                         lcp: Optional[np.ndarray] = None
                         ) -> List[Tuple[int, int]]:
    """ExtractUniqueKmers: (doc, offset) of every position whose minimal
    unique substring is at most k long (i.e. its k-mer is unique)."""
    ul = unique_lengths(prepared, sa, lcp)
    pos = np.nonzero((ul > 0) & (ul <= k))[0]
    doc_of = np.searchsorted(prepared.doc_starts, pos, side="right") - 1
    off = pos - prepared.doc_starts[doc_of]
    return list(zip(doc_of.tolist(), off.tolist()))


def suffix_similarity(prepared: PreparedText, sa: np.ndarray,
                      lcp: Optional[np.ndarray] = None,
                      min_lcp: int = 4) -> Dict[Tuple[int, int], float]:
    """SuffixSimilarity: score document pairs by shared substrings.

    Adjacent SA rows belonging to different documents with LCP >= min_lcp
    contribute their LCP to the pair's score; scores are normalized by the
    geometric mean of the two documents' lengths (the spirit of
    SuffixSimilarity.chpl's block-LCP scoring)."""
    text = prepared.text
    n = len(text)
    if lcp is None:
        lcp = lcp_array(text, sa)
    sa = np.asarray(sa, dtype=np.int64)
    doc_of = np.searchsorted(prepared.doc_starts, sa, side="right") - 1
    d_prev = doc_of[:-1]
    d_cur = doc_of[1:]
    l = lcp[1:]
    sel = (d_prev != d_cur) & (l >= min_lcp)
    pairs: Dict[Tuple[int, int], float] = {}
    a = np.minimum(d_prev[sel], d_cur[sel])
    b = np.maximum(d_prev[sel], d_cur[sel])
    for x, y, v in zip(a.tolist(), b.tolist(), l[sel].tolist()):
        pairs[(x, y)] = pairs.get((x, y), 0.0) + float(v)
    lens = np.maximum(np.diff(prepared.doc_starts) - 1, 1)
    return {
        (x, y): v / float(np.sqrt(lens[x] * lens[y]))
        for (x, y), v in pairs.items()
    }
