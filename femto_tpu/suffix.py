"""Suffix-array construction as XLA sort/scan passes.

The reference builds suffix arrays with external-memory difference-cover
(DCX) sorting over MPI bins (/root/reference/src/dcx_cc/dcx.hh:4038) or
in-memory two-stage sorters (dcx_inmem.cc, two_stage.cc).  Those designs are
disk/NIC-bound and branch-heavy; on TPU the right primitive is the global
bitonic sort XLA emits for `lax.sort`, so we use prefix doubling
(Manber-Myers): O(log n) rounds, each one multi-key sort + adjacent-compare
+ cumsum + scatter — all dense, static-shape, MXU/VPU-friendly ops.

The first round packs three 9-bit symbols into one int32 key, so round k
already orders by 3-symbol prefixes; subsequent rounds double the ordered
prefix length.  Out-of-range positions use rank -1 (shorter suffix sorts
first), matching the convention needed for text whose symbols are all >= 1
(ESCAPE=0 never occurs in prepared text, alphabet.py).

The distributed variant (sample-sort over a device mesh) lives in
femto_tpu/parallel/dist_build.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np



def _doubling_round(rank: jax.Array, k: jax.Array, idx: jax.Array):
    """One prefix-doubling round: returns (new_rank, num_unique, perm)."""
    n = rank.shape[0]
    # rank of the suffix k positions later; -1 past the end.
    rank_k = jnp.where(idx < n - k, jnp.roll(rank, -k), -1)
    s1, s2, perm = jax.lax.sort((rank, rank_k, idx), num_keys=2)
    head = jnp.zeros((1,), dtype=jnp.int32)
    diff = ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32)
    new_rank_sorted = jnp.concatenate([head, jnp.cumsum(diff)])
    num_unique = new_rank_sorted[-1] + 1
    new_rank = jnp.zeros_like(rank).at[perm].set(new_rank_sorted)
    return new_rank, num_unique, perm


@functools.partial(jax.jit, static_argnames=())
def suffix_array(text: jax.Array) -> jax.Array:
    """Suffix array of `text` (int array of alphabet codes), as int32[n].

    Equivalent in contract to the reference's suffix_sort entry points
    (dcx.hh:6040, ssort_chpl/SuffixSort.chpl:66): SA[r] is the start offset
    of the rank-r suffix.  Requires every symbol >= 1 and n < 2**31.
    """
    n = text.shape[0]
    t = text.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    if n == 1:
        return idx

    # Initial rank: pack 3 symbols (9 bits each, values < 512) -> 27-bit key.
    # Initial densify sorts by TWO packed 3-symbol keys, so round one
    # already orders 6-symbol prefixes and k starts at 6 (one fewer
    # doubling round than a single 3-symbol pack).
    def pack3(shift):
        a = jnp.where(idx < n - shift, jnp.roll(t, -shift), 0)
        b = jnp.where(idx < n - shift - 1, jnp.roll(t, -shift - 1), 0)
        c = jnp.where(idx < n - shift - 2, jnp.roll(t, -shift - 2), 0)
        return (a << 18) | (b << 9) | c

    s1, s2, perm = jax.lax.sort((pack3(0), pack3(3), idx), num_keys=2)
    head = jnp.zeros((1,), dtype=jnp.int32)
    diff = ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32)
    new_rank_sorted = jnp.concatenate([head, jnp.cumsum(diff)])
    nuniq = new_rank_sorted[-1] + 1
    rank = jnp.zeros_like(t).at[perm].set(new_rank_sorted)

    def cond(state):
        rank, k, nuniq, perm = state
        return (nuniq < n) & (k < n)

    def body(state):
        rank, k, nuniq, perm = state
        new_rank, new_nuniq, perm = _doubling_round(rank, k, idx)
        return new_rank, k * 2, new_nuniq, perm

    rank, _, _, perm = jax.lax.while_loop(
        cond, body, (rank, jnp.int32(6), nuniq, perm)
    )
    # perm from the final round is the suffix array (ranks all unique).
    return perm


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
