"""Regexp and approximate search stepped over index row ranges.

The reference's do_regexp_query (/root/reference/src/main/server.c:1656,
pseudocode at 1711-1790): a queue_map of ([first,last], matched-string) ->
per-NFA-state error counts; each popped entry computes its reachable
characters, batch-requests Occ for every candidate character, forks new
ranges, and merges state vectors on range collision; final states emit
match ranges.

TPU version: the frontier is expanded one *character layer* at a time — all
(entry, char) forks of the whole frontier become ONE batched backward-step
on device (the parts[ALPHA_SIZE] batching of server.h:563, vectorized for
real).  Host keeps the small NFA state vectors and the dedup map.

Approximate search: state = uint8 cost per NFA state (cost_bound == not
present), with substitution/insertion applied on character steps and
deletion applied as a transitive relaxation — the reference's nfa_errcnt_t
semantics (nfa.h:74-120).  Substitutions are never applied on the first
backward step (the pattern's last character), matching QUERY_FORMAT.txt's
documented speedup.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import ALPHA_SIZE
from ..fmindex import FMIndex
from .ast import ApproxSettings
from .nfa import NFA


@dataclasses.dataclass
class RegexpMatch:
    first: int
    last: int
    cost: int
    match: bytes  # matched string, in alphabet order (forward text order)


@functools.partial(jax.jit, static_argnames=())
def _backward_step_jit(arrays, c, first, last):
    from ..ops.rank import occ2

    o1, o2 = occ2(arrays, c, first, last)
    base = arrays.C[jnp.where(c >= 0, c, 0)]
    return base + o1, base + o2


def _bucket(x: int, minimum: int = 64) -> int:
    b = minimum
    while b < x:
        b *= 2
    return b


def _backward_step(index: FMIndex, cs, firsts, lasts):
    B = len(cs)
    Bp = _bucket(B)
    c = np.full(Bp, -1, dtype=np.int32)
    f = np.zeros(Bp, dtype=np.int32)
    l = np.zeros(Bp, dtype=np.int32)
    c[:B], f[:B], l[:B] = cs, firsts, lasts
    nf, nl = _backward_step_jit(
        index.arrays, jnp.asarray(c), jnp.asarray(f), jnp.asarray(l)
    )
    return np.asarray(nf)[:B], np.asarray(nl)[:B]


NO_COST = 0xFF


def _start_costs(nfa: NFA, settings: ApproxSettings) -> np.ndarray:
    """Initial cost vector: start state at 0, plus deletion relaxation."""
    costs = np.full(nfa.num_states, NO_COST, dtype=np.int32)
    costs[0] = 0
    return _relax_deletions(nfa, costs, settings)


def _relax_deletions(nfa: NFA, costs: np.ndarray,
                     settings: ApproxSettings) -> np.ndarray:
    """Deletion = pattern character missing from the data: advance the NFA
    without consuming a text character, paying delete_cost."""
    if settings.cost_bound <= 1:
        return costs
    changed = True
    while changed:
        changed = False
        for s in range(nfa.num_states):
            if costs[s] >= settings.cost_bound:
                continue
            nc = costs[s] + settings.delete_cost
            if nc >= settings.cost_bound:
                continue
            for mask, t in nfa.trans[s]:
                if nc < costs[t]:
                    costs[t] = nc
                    changed = True
    return costs


def _step_costs(nfa: NFA, costs: np.ndarray, c: int,
                settings: ApproxSettings, allow_subst: bool) -> np.ndarray:
    """Advance cost vector by consuming text character c (backward step)."""
    out = np.full(nfa.num_states, NO_COST, dtype=np.int32)
    for s in range(nfa.num_states):
        cost = costs[s]
        if cost >= settings.cost_bound:
            continue
        for mask, t in nfa.trans[s]:
            if mask[c]:
                if cost < out[t]:
                    out[t] = cost
            elif allow_subst:
                nc = cost + settings.subst_cost
                if nc < settings.cost_bound and nc < out[t]:
                    out[t] = nc
        # insertion: extra character in the data; stay in state s
        nc = cost + settings.insert_cost
        if nc < settings.cost_bound and nc < out[s]:
            out[s] = nc
    return _relax_deletions(nfa, out, settings)


def _reachable_chars(nfa: NFA, costs: np.ndarray,
                     settings: ApproxSettings) -> np.ndarray:
    """Candidate characters: exact transitions from live states; under
    approximate settings, any character may extend (subst/insert)."""
    live = costs < settings.cost_bound
    if not live.any():
        return np.zeros(ALPHA_SIZE, dtype=bool)
    approx = settings.cost_bound > 1 and (
        (costs[live].min() + min(settings.subst_cost, settings.insert_cost))
        < settings.cost_bound
    )
    if approx:
        m = np.ones(ALPHA_SIZE, dtype=bool)
        m[:5] = False
        return m
    m = np.zeros(ALPHA_SIZE, dtype=bool)
    for s in np.nonzero(live)[0]:
        m |= nfa.char_union[s]
    return m


def _final_cost(nfa: NFA, costs: np.ndarray,
                settings: ApproxSettings) -> Optional[int]:
    c = costs[nfa.accept].min() if nfa.accept.any() else NO_COST
    return int(c) if c < settings.cost_bound else None


def run_regexp(
    index: FMIndex,
    nfa: NFA,
    settings: ApproxSettings = ApproxSettings.exact(),
    max_results: int = 10000,
    max_frontier: int = 65536,
    max_len: int = 256,
) -> List[RegexpMatch]:
    """Find all matching strings as (row range, cost, string)."""
    n = index.meta.n
    results: List[RegexpMatch] = []

    costs0 = _start_costs(nfa, settings)
    # Frontier entries: (first, last, costs, matched-bytes-reversed)
    frontier: List[Tuple[int, int, np.ndarray, bytes]] = [
        (0, n, costs0, b"")
    ]
    fc0 = _final_cost(nfa, costs0, settings)
    if fc0 is not None:
        results.append(RegexpMatch(0, n, fc0, b""))

    depth = 0
    while frontier and depth < max_len and len(results) < max_results:
        depth += 1
        # fork every entry by its reachable characters; one batched device
        # call for the whole layer
        cs: List[int] = []
        fs: List[int] = []
        ls: List[int] = []
        owners: List[int] = []
        for ei, (f, l, costs, _s) in enumerate(frontier):
            for c in np.nonzero(_reachable_chars(nfa, costs, settings))[0]:
                cs.append(int(c))
                fs.append(f)
                ls.append(l)
                owners.append(ei)
        if not cs:
            break
        nf, nl = _backward_step(index, cs, fs, ls)

        # merge forks into the next frontier (add_mapping semantics:
        # range collision -> min-merge cost vectors, server.c:1571-1653)
        nxt: Dict[Tuple[int, int], Tuple[np.ndarray, bytes]] = {}
        allow_subst = depth > 1  # no substitution at the pattern's last char
        for c, ei, f2, l2 in zip(cs, owners, nf, nl):
            if l2 <= f2:
                continue
            f0, l0, costs, s0 = frontier[ei]
            nc = _step_costs(nfa, costs, c, settings, allow_subst)
            if (nc >= settings.cost_bound).all():
                continue
            key = (int(f2), int(l2))
            s1 = bytes([c]) + b"" if False else None
            new_s = bytes([c - 5]) + s0 if c >= 5 else s0
            if key in nxt:
                old_c, old_s = nxt[key]
                nxt[key] = (np.minimum(old_c, nc), old_s)
            else:
                nxt[key] = (nc, new_s)
        frontier = []
        for (f2, l2), (nc, s) in nxt.items():
            fc = _final_cost(nfa, nc, settings)
            if fc is not None:
                results.append(RegexpMatch(f2, l2, fc, s))
            # keep extending while any state is live
            if (nc < settings.cost_bound).any():
                frontier.append((f2, l2, nc, s))
            if len(frontier) >= max_frontier:
                break

    return dedupe_matches(results)


def dedupe_matches(matches: List[RegexpMatch]) -> List[RegexpMatch]:
    """Sort and drop duplicate ranges, keeping min cost (the reference's
    sort + subsumption prune, server.c:1528-1563)."""
    best: Dict[Tuple[int, int], RegexpMatch] = {}
    for m in matches:
        key = (m.first, m.last)
        if key not in best or m.cost < best[key].cost:
            best[key] = m
    return sorted(best.values(), key=lambda m: (m.first, m.last, m.cost))


def match_rows(matches: List[RegexpMatch]) -> List[Tuple[int, int]]:
    """Union of match row ranges as disjoint intervals (for counting
    distinct matching positions)."""
    iv = sorted((m.first, m.last) for m in matches)
    out: List[Tuple[int, int]] = []
    for f, l in iv:
        if out and f <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], l))
        else:
            out.append((f, l))
    return out
