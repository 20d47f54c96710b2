"""Batched rank (Occ) queries over the segment-checkpointed BWT.

This is the hot primitive of the whole framework — the TPU replacement for
the reference's wavelet-tree walk + RLE-gamma bitvector scan
(/root/reference/src/main/wtree.c:635 bseq_rank, index.c:2037-2090).  One
rank(c, r) is: a scalar checkpoint gather + a SEG-wide vectorized
compare-and-count of the row's segment.  Batched over thousands of queries it
is two gathers and one VPU reduction — no per-query control flow.

Design note: this gather-bound loop is intentionally NOT a Pallas kernel —
XLA's native gather lowering pipelines concurrent gather streams better
than per-query manual DMA could (measured; see PERF.md "Rank kernel design
space").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..alphabet import ALPHA_SIZE
from ..fmindex import FMArrays, L1_GROUP


def ckpt_base(arrays: FMArrays, s: jax.Array, c: jax.Array) -> jax.Array:
    """Absolute occurrence count before segment s for char c, under either
    checkpoint tier (dispatch is static: on occ_ckpt.dtype)."""
    if arrays.occ_ckpt.dtype == jnp.uint16:
        rel = arrays.occ_ckpt[s, c].astype(jnp.int32)
        return arrays.occ_l1[s // L1_GROUP, c] + rel
    return arrays.occ_ckpt[s, c]


def occ(arrays: FMArrays, c: jax.Array, r: jax.Array) -> jax.Array:
    """occ[i] = #occurrences of c[i] in BWT[0 : r[i]).  c,r: int32[B].

    c entries outside [0, ALPHA_SIZE) are treated as "count nothing"
    (returns 0) so padded lanes are harmless.
    """
    seg = arrays.bwt.shape[1]
    c = c.astype(jnp.int32)
    r = r.astype(jnp.int32)
    valid = (c >= 0) & (c < ALPHA_SIZE)
    cc = jnp.where(valid, c, 0)
    s = r // seg
    off = r - s * seg
    base = ckpt_base(arrays, s, cc)                  # [B] gather(s)
    segdata = jnp.take(arrays.bwt, s, axis=0).astype(jnp.int32)  # [B, SEG]
    iota = jax.lax.broadcasted_iota(jnp.int32, segdata.shape, 1)
    within = jnp.sum(
        (segdata == cc[:, None]) & (iota < off[:, None]), axis=1
    ).astype(jnp.int32)
    return jnp.where(valid, base + within, 0)


def occ2(arrays: FMArrays, c: jax.Array, r1: jax.Array, r2: jax.Array):
    """Fused pair rank for backward search: (occ(c,r1), occ(c,r2)).

    r1/r2 are usually nearby (the [first,last) range bounds), so we gather
    each segment once when they coincide is left to XLA's CSE; the win here
    is one batched call instead of two.
    """
    seg = arrays.bwt.shape[1]
    c = c.astype(jnp.int32)
    valid = (c >= 0) & (c < ALPHA_SIZE)
    cc = jnp.where(valid, c, 0)

    def one(r):
        s = r // seg
        off = r - s * seg
        base = ckpt_base(arrays, s, cc)
        segdata = jnp.take(arrays.bwt, s, axis=0).astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, segdata.shape, 1)
        within = jnp.sum(
            (segdata == cc[:, None]) & (iota < off[:, None]), axis=1
        ).astype(jnp.int32)
        return base + within

    o1 = one(r1.astype(jnp.int32))
    o2 = one(r2.astype(jnp.int32))
    z = jnp.zeros_like(o1)
    return jnp.where(valid, o1, z), jnp.where(valid, o2, z)


def bwt_at(arrays: FMArrays, r: jax.Array) -> jax.Array:
    """BWT symbol at each row (int32[B])."""
    seg = arrays.bwt.shape[1]
    s = r // seg
    return arrays.bwt[s, r - s * seg].astype(jnp.int32)


def lf_step(arrays: FMArrays, r: jax.Array) -> jax.Array:
    """LF mapping: row of the suffix starting one position earlier.

    LF(r) = C[BWT[r]] + occ(BWT[r], r) — the reference's back_query
    (server.c:2228) as one batched op.
    """
    c = bwt_at(arrays, r)
    return arrays.C[c] + occ(arrays, c, r)


def marked(arrays: FMArrays, r: jax.Array) -> jax.Array:
    """bool[B]: is row r mark-sampled?"""
    seg = arrays.bwt.shape[1]
    words_per_seg = seg // 32
    w = r // 32
    word = arrays.mark_bits[w // words_per_seg, w % words_per_seg]
    return ((word >> (r % 32).astype(jnp.uint32)) & jnp.uint32(1)) != 0


def mark_rank(arrays: FMArrays, r: jax.Array) -> jax.Array:
    """#marked rows before row r (index into mark_vals)."""
    seg = arrays.bwt.shape[1]
    words_per_seg = seg // 32
    s = r // seg
    base = arrays.mark_ckpt[s]
    words = jnp.take(arrays.mark_bits, s, axis=0)  # [B, words_per_seg]
    widx = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
    local_word = (r % seg) // 32
    full = jnp.where(widx < local_word[:, None], words, jnp.uint32(0))
    cnt_full = jnp.sum(jax.lax.population_count(full), axis=1).astype(jnp.int32)
    word = words[jnp.arange(words.shape[0]), local_word]
    mask = (jnp.uint32(1) << (r % 32).astype(jnp.uint32)) - jnp.uint32(1)
    cnt_part = jax.lax.population_count(word & mask).astype(jnp.int32)
    return base + cnt_full + cnt_part


def mark_value(arrays: FMArrays, r: jax.Array) -> jax.Array:
    """Sampled text offset stored for marked row r (undefined if unmarked)."""
    return arrays.mark_vals[mark_rank(arrays, r)]


def lf_mark_step(arrays: FMArrays, r: jax.Array):
    """Fused locate step: one segment gather serves both the BWT symbol
    read and the in-segment occurrence count, alongside the mark bitmap
    lookups.  Returns (lf_row, is_marked, mark_val) — 4 gather rows per
    step instead of 6 (see PERF.md: gather rows are the locate budget)."""
    seg = arrays.bwt.shape[1]
    words_per_seg = seg // 32
    s = r // seg
    off = r - s * seg

    segdata = jnp.take(arrays.bwt, s, axis=0)               # [B, SEG]
    c = segdata[jnp.arange(r.shape[0]), off].astype(jnp.int32)
    base = ckpt_base(arrays, s, c)                           # [B]
    iota = jax.lax.broadcasted_iota(jnp.int32, segdata.shape, 1)
    within = jnp.sum(
        (segdata == c[:, None].astype(jnp.uint16)) & (iota < off[:, None]),
        axis=1,
    ).astype(jnp.int32)
    lf = arrays.C[c] + base + within

    words = jnp.take(arrays.mark_bits, s, axis=0)            # [B, W]
    w_local = off // 32
    word = words[jnp.arange(r.shape[0]), w_local]
    bit = ((word >> (r % 32).astype(jnp.uint32)) & jnp.uint32(1)) != 0
    widx = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
    full = jnp.where(widx < w_local[:, None], words, jnp.uint32(0))
    cnt = jnp.sum(jax.lax.population_count(full), axis=1).astype(jnp.int32)
    pmask = (jnp.uint32(1) << (r % 32).astype(jnp.uint32)) - jnp.uint32(1)
    part = jax.lax.population_count(word & pmask).astype(jnp.int32)
    grank = arrays.mark_ckpt[s] + cnt + part
    mv = arrays.mark_vals[grank]
    return lf, bit, mv
