"""Suffix-array construction as XLA sort/scan passes.

The reference builds suffix arrays with external-memory difference-cover
(DCX) sorting over MPI bins (/root/reference/src/dcx_cc/dcx.hh:4038) or
in-memory two-stage sorters (dcx_inmem.cc, two_stage.cc).  Those designs are
disk/NIC-bound and branch-heavy; on TPU the right primitive is the global
sort XLA emits for `lax.sort`, so we use prefix doubling (Manber-Myers)
with **segment filtering** (Larsson-Sadakane style): after the initial
6-symbol pack sort, each round re-sorts ONLY the slots whose rank groups
are still unresolved.  Unresolved counts collapse geometrically on real
text, so total work is a couple of full sorts instead of O(log n) of them —
the work-complexity match for the reference's sample-based designs
(ssort_chpl/SuffixSortImpl.chpl:2784), reached by filtering instead of
difference covers because a filtered global sort is the shape XLA/TPU runs
at full throughput.

Ranks use the "group base slot" convention (the first SA slot of the
group), so refined subgroup ranks are computed with a cummax over the slot
positions — no second pass.  Rounds are host-driven: the unresolved count
m is pulled back per round (a scalar), and the working arrays are bucketed
to powers of two so only a handful of shapes ever compile.

The distributed variant (sample-sort over a device mesh) lives in
femto_tpu/parallel/dist_build.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MIN_BUCKET = 1 << 16


def _bucket_anchored(m: int, n: int) -> int:
    """Smallest n/4^j >= m (floored at _MIN_BUCKET): at most ~log4(n) work
    shapes ever compile per corpus size, vs ~log2(n) for pow2 buckets —
    remote compiles dominate cold builds, so fewer shapes wins."""
    M = 1 << max((n - 1).bit_length(), _MIN_BUCKET.bit_length() - 1)
    while M // 4 >= m and M // 4 >= _MIN_BUCKET:
        M //= 4
    return M


def _m0_for(n: int) -> int:
    """Static capacity of the fused slot compaction: the n/16 anchor."""
    n_pow2 = 1 << max((n - 1).bit_length(), _MIN_BUCKET.bit_length() - 1)
    return max(n_pow2 // 16, _MIN_BUCKET)


@functools.partial(jax.jit, static_argnames=("n",))
def _initial_sort(text, *, n):
    """9-symbol pack sort (three 27-bit keys).  Returns (sa, rank,
    unresolved, slots0, m) where rank is by text position and holds the
    group's base slot, unresolved[slot] marks slots in groups of size > 1,
    and slots0 is those slots pre-compacted to the static n/16 bucket
    (saving a separate O(n) compaction pass when — as on real text after a
    9-symbol sort — few slots stay unresolved)."""
    t = text.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    # Pack 3 symbols (9 bits each, values < 512) per 27-bit key; sorting by
    # three packed keys orders 9-symbol prefixes, so doubling starts at k=9
    # — on real text most groups are already singletons after this sort.
    def pack3(shift):
        a = jnp.where(idx < n - shift, jnp.roll(t, -shift), 0)
        b = jnp.where(idx < n - shift - 1, jnp.roll(t, -shift - 1), 0)
        c = jnp.where(idx < n - shift - 2, jnp.roll(t, -shift - 2), 0)
        return (a << 18) | (b << 9) | c

    s1, s2, s3, perm = jax.lax.sort(
        (pack3(0), pack3(3), pack3(6), idx), num_keys=3
    )
    st = jnp.ones((n,), bool).at[1:].set(
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]) | (s3[1:] != s3[:-1])
    )
    base = jax.lax.cummax(jnp.where(st, idx, 0))
    rank = jnp.zeros((n,), jnp.int32).at[perm].set(base)
    nxt_st = jnp.concatenate([st[1:], jnp.ones((1,), bool)])
    unresolved = ~(st & nxt_st)
    M0 = _m0_for(n)
    pos = jnp.cumsum(unresolved.astype(jnp.int32)) - 1
    tgt = jnp.where(unresolved, jnp.minimum(pos, M0 - 1), M0)
    slots0 = (
        jnp.full((M0 + 1,), n, jnp.int32).at[tgt].set(idx, mode="drop")[:M0]
    )
    return (perm, rank, unresolved, slots0,
            jnp.sum(unresolved.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("n",))
def _full_round(rank, k, *, n):
    """One unfiltered doubling round over all n slots (cheaper than the
    filtered round while most groups are unresolved: rank_k comes from a
    roll instead of per-slot gathers).  Same group-base rank convention."""
    idx = jnp.arange(n, dtype=jnp.int32)
    rank_k = jnp.where(idx < n - k, jnp.roll(rank, -k), -1)
    s1, s2, perm = jax.lax.sort((rank, rank_k, idx), num_keys=2)
    st = jnp.ones((n,), bool).at[1:].set(
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    )
    base = jax.lax.cummax(jnp.where(st, idx, 0))
    new_rank = jnp.zeros((n,), jnp.int32).at[perm].set(base)
    nxt_st = jnp.concatenate([st[1:], jnp.ones((1,), bool)])
    unresolved = ~(st & nxt_st)
    return perm, new_rank, unresolved, jnp.sum(unresolved.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n", "M"))
def _compact_slots(unresolved, *, n, M):
    """Slot indices of unresolved slots, ascending, padded with n."""
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.cumsum(unresolved.astype(jnp.int32)) - 1
    tgt = jnp.where(unresolved, jnp.minimum(pos, M - 1), M)
    return (
        jnp.full((M + 1,), n, jnp.int32).at[tgt].set(idx, mode="drop")[:M]
    )


@functools.partial(jax.jit, static_argnames=("M",))
def _filtered_round(sa, rank, slots, k, *, M):
    """One filtered doubling round over the active slots.

    slots: int32[M] ascending unresolved SA slots (n-padded).  Sorts the
    active suffixes by (rank, rank at +k), writes them back into their
    (fixed) group slot span, refines ranks, and returns the still-
    unresolved slots compacted to the front.
    """
    n = sa.shape[0]
    valid = slots < n
    pos = sa[jnp.where(valid, slots, 0)]
    r1 = jnp.where(valid, rank[pos], jnp.int32(0x7FFFFFFF))
    pk = pos + k
    r2 = jnp.where(pk < n, rank[jnp.minimum(pk, n - 1)], -1)
    r2 = jnp.where(valid, r2, jnp.int32(0x7FFFFFFF))

    s1, s2, sp = jax.lax.sort((r1, r2, pos), num_keys=2)
    # element t now belongs at slot slots[t] (groups are slot-contiguous
    # and slots are ascending, so sorted order == slot order)
    st = jnp.ones((M,), bool).at[1:].set(
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    )
    new_rank = jax.lax.cummax(jnp.where(st, slots, 0))

    sa = sa.at[jnp.where(valid, slots, n)].set(sp, mode="drop")
    rank = rank.at[jnp.where(valid, sp, n)].set(new_rank, mode="drop")

    nxt_st = jnp.concatenate([st[1:], jnp.ones((1,), bool)])
    keep = valid & ~(st & nxt_st)  # still in a subgroup of size > 1
    ppos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep, jnp.minimum(ppos, M - 1), M)
    slots_next = (
        jnp.full((M + 1,), n, jnp.int32).at[tgt].set(slots, mode="drop")[:M]
    )
    return sa, rank, slots_next, jnp.sum(keep.astype(jnp.int32))


def suffix_array(text: jax.Array) -> jax.Array:
    """Suffix array of `text` (int array of alphabet codes), as int32[n].

    Equivalent in contract to the reference's suffix_sort entry points
    (dcx.hh:6040, ssort_chpl/SuffixSort.chpl:66): SA[r] is the start offset
    of the rank-r suffix.  Requires every symbol in [1, 512) and n < 2**31.
    """
    text = jnp.asarray(text)
    n = int(text.shape[0])
    if n == 1:
        return jnp.zeros((1,), jnp.int32)

    import os
    import sys
    import time as _time

    dbg = os.environ.get("FEMTO_TPU_SA_DEBUG", "") != ""
    t0 = _time.perf_counter()
    sa, rank, unresolved, slots0, m_dev = _initial_sort(text, n=n)
    m = int(m_dev)
    if dbg:
        print(f"  sa: initial sort {_time.perf_counter()-t0:.2f}s "
              f"unresolved={m}/{n}", file=sys.stderr, flush=True)
    k = 9
    slots = None
    M = 0
    if 0 < m <= _m0_for(n):
        # the fused compaction already holds the slots (ascending prefix)
        M = min(_bucket_anchored(m, n), _m0_for(n))
        slots = slots0[:M]
    while m > 0 and k < 2 * n:
        t1 = _time.perf_counter()
        if slots is None and m > n // 4:
            # mostly-unresolved: the roll-based full round beats the slot
            # gather/scatter machinery
            sa, rank, unresolved, m_dev = _full_round(rank, jnp.int32(k), n=n)
            m = int(m_dev)
            kind = f"full n={n}"
        else:
            if slots is None:
                M = _bucket_anchored(m, n)
                slots = _compact_slots(unresolved, n=n, M=M)
            sa, rank, slots_next, m_dev = _filtered_round(
                sa, rank, slots, jnp.int32(k), M=M
            )
            m = int(m_dev)
            kind = f"filtered M={M}"
            if m > 0:
                M_next = _bucket_anchored(m, n)
                slots = slots_next[:M_next] if M_next < M else slots_next
                M = M_next
        if dbg:
            print(f"  sa: round k={k} ({kind}) -> m={m} "
                  f"({_time.perf_counter()-t1:.2f}s)",
                  file=sys.stderr, flush=True)
        k *= 2
    return sa


def suffix_array_np(text: np.ndarray) -> np.ndarray:
    """Naive host oracle: O(n log^2 n) prefix doubling in numpy (tests)."""
    n = len(text)
    rank = np.asarray(text, dtype=np.int64).copy()
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        rank_k = np.full(n, -1, dtype=np.int64)
        if k < n:
            rank_k[: n - k] = rank[k:]
        order = np.lexsort((idx, rank_k, rank))
        s1, s2 = rank[order], rank_k[order]
        new_rank_sorted = np.zeros(n, dtype=np.int64)
        if n > 1:
            diff = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
            new_rank_sorted[1:] = np.cumsum(diff)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank_sorted
        if new_rank_sorted[-1] == n - 1:
            return order.astype(np.int64)
        k *= 2


def bwt_from_sa(text: jax.Array, sa: jax.Array) -> jax.Array:
    """BWT: L[r] = T[(SA[r]-1) mod n] — one gather (cf. do_bwt dcx.hh:6094)."""
    n = text.shape[0]
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    return jnp.take(text, prev, axis=0)
