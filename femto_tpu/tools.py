"""Index-native analysis tools: common substrings, similarity, sequential
scan.

Counterparts of the reference's femto_extract/femto_common (BFS over index
ranges, /root/reference/src/main_cc/extract_tool.cc, main/common_tool.c),
femto_similar (main/similar_tool.c), and femto_scan (dcx_cc/scan_tool.cc:
sequential search with the same query language via RE2 — here the AST is
compiled to a Python regex).
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .alphabet import CHARACTER_OFFSET
from .fmindex import FMIndex
from .query.ast import (
    RAlt,
    RChar,
    RNode,
    RRep,
    RSeq,
    RStr,
    UNBOUNDED,
    QTerm,
)
from .query.parser import parse_query
from .query.regexp import _backward_step


def common_substrings(
    index: FMIndex, length: int, min_count: int = 2, top_k: int = 20,
    max_frontier: Optional[int] = None,
) -> List[Tuple[bytes, int]]:
    """Most common substrings of the given length — breadth-first expansion
    of index row ranges, one batched device layer per character (the BFS of
    extract_tool.cc).

    EXACT by default: an extension's count never exceeds its parent's, so
    pruning ranges below min_count cannot drop a true top-k result.  Pass
    max_frontier to cap memory on huge corpora — if the cap truncates, a
    warning reports that results may be incomplete (the round-1 silent-beam
    truncation is gone)."""
    import warnings

    n = index.meta.n
    # frontier entries: (first, last, suffix-bytes-so-far)
    frontier: List[Tuple[int, int, bytes]] = [(0, n, b"")]
    for _ in range(length):
        cs, fs, ls, owners = [], [], [], []
        for ei, (f, l, s) in enumerate(frontier):
            for b in range(256):
                cs.append(b + CHARACTER_OFFSET)
                fs.append(f)
                ls.append(l)
                owners.append(ei)
        nf, nl = _backward_step(index, cs, fs, ls)
        nxt = []
        for c, ei, f2, l2 in zip(cs, owners, nf, nl):
            if l2 - f2 >= min_count:
                # prepend: backward search extends left, so build string
                # reversed; we want common substrings read forward
                nxt.append((int(f2), int(l2),
                            bytes([c - CHARACTER_OFFSET]) + frontier[ei][2]))
        if max_frontier is not None and len(nxt) > max_frontier:
            nxt.sort(key=lambda e: e[1] - e[0], reverse=True)
            warnings.warn(
                f"common_substrings frontier truncated to {max_frontier} of "
                f"{len(nxt)} candidates; results may be incomplete "
                "(raise max_frontier or min_count)",
                stacklevel=2,
            )
            nxt = nxt[:max_frontier]
        frontier = nxt
        if not frontier:
            return []
    frontier.sort(key=lambda e: e[1] - e[0], reverse=True)
    return [(s, l - f) for f, l, s in frontier[:top_k]]


def similarity(index: FMIndex, data: bytes, k: int = 8,
               sample: int = 512) -> float:
    """Fraction of sampled k-grams of `data` that occur in the index —
    the spirit of femto_similar's shared-substring scoring."""
    from .search import count

    if len(data) < k:
        return 0.0
    rng = np.random.default_rng(0)
    m = min(sample, len(data) - k + 1)
    starts = rng.choice(len(data) - k + 1, size=m, replace=False)
    grams = [data[s : s + k] for s in starts]
    counts = count(index, grams)
    return float((counts > 0).mean())


# ---------- sequential scan (femto_scan) ----------


def ast_to_python_regex(node: RNode) -> bytes:
    """Compile the regexp AST to a Python `re` byte pattern (the analog of
    seq_compile_regexp_from_ast -> RE2, sequential_search.h:30-42)."""
    if isinstance(node, RStr):
        return re.escape(node.data)
    if isinstance(node, RChar):
        idx = np.nonzero(node.mask)[0]
        bs = [int(i) - CHARACTER_OFFSET for i in idx if i >= CHARACTER_OFFSET]
        if len(bs) == 256:
            return b"(?s:.)"
        parts = []
        i = 0
        while i < len(bs):
            j = i
            while j + 1 < len(bs) and bs[j + 1] == bs[j] + 1:
                j += 1
            if j > i + 1:
                parts.append(re.escape(bytes([bs[i]])) + b"-"
                             + re.escape(bytes([bs[j]])))
            else:
                for t in range(i, j + 1):
                    parts.append(re.escape(bytes([bs[t]])))
            i = j + 1
        return b"[" + b"".join(parts) + b"]"
    if isinstance(node, RSeq):
        return b"".join(b"(?:" + ast_to_python_regex(c) + b")"
                        for c in node.children)
    if isinstance(node, RAlt):
        return b"(?:" + b"|".join(ast_to_python_regex(c)
                                  for c in node.children) + b")"
    if isinstance(node, RRep):
        inner = b"(?:" + ast_to_python_regex(node.child) + b")"
        if node.hi == UNBOUNDED:
            if node.lo == 0:
                return inner + b"*"
            if node.lo == 1:
                return inner + b"+"
            return inner + (b"{%d,}" % node.lo)
        if node.lo == 0 and node.hi == 1:
            return inner + b"?"
        return inner + (b"{%d,%d}" % (node.lo, node.hi))
    raise TypeError(node)


def scan_files(query: str, paths: Sequence[str],
               max_matches: Optional[int] = None):
    """Sequential (unindexed) search of raw files with the query language —
    femto_scan.  Returns [(path, offset, matched bytes)]."""
    from .io.corpus import iter_files

    node = parse_query(query)
    if not isinstance(node, QTerm):
        raise ValueError("scan supports a single term (no boolean)")
    # overlapping matches, like index search: one per start position
    pat = re.compile(b"(?=(" + ast_to_python_regex(node.regexp) + b"))",
                     re.DOTALL)
    out = []
    for fp in iter_files(paths):
        with open(fp, "rb") as f:
            data = f.read()
        for m in pat.finditer(data):
            out.append((fp, m.start(), m.group(1)))
            if max_matches is not None and len(out) >= max_matches:
                return out
    return out
