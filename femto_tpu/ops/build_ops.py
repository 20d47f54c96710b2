"""On-device index assembly: BWT, occ checkpoints, mark sampling.

The reference's constructor (/root/reference/src/main/construct.c:41-160,
index.c:309-740 compress_bucket) serializes buckets CPU-side; here the whole
packaging is a handful of scatter/cumsum/gather passes that run on the
accelerator right after the suffix sort, so "build" stays on-device from raw
text to queryable index.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import ALPHA_SIZE, INVALID_ALPHA
from ..fmindex import FMArrays, FMMeta


def mark_cap(n: int, ndocs: int, mark_period: int, seg: int) -> int:
    """Static upper bound on the number of marked rows."""
    if mark_period == 0:
        base = 1
    else:
        base = n // mark_period + 2 * ndocs + 2
    return -(-base // 128) * 128


@functools.partial(
    jax.jit,
    static_argnames=("n", "seg", "mark_period", "ndocs", "seg_multiple"),
)
def build_fm_arrays_device(
    text: jax.Array,      # int32[n] alphabet codes
    sa: jax.Array,        # int32[n]
    doc_starts: jax.Array,  # int32[ndocs+1]
    *,
    n: int,
    seg: int,
    mark_period: int,
    ndocs: int,
    seg_multiple: int = 1,
) -> Tuple[FMArrays, jax.Array]:
    """Assemble FMArrays on device.  Returns (arrays, n_marks scalar)."""
    n_seg = n // seg + 1
    n_seg = -(-n_seg // seg_multiple) * seg_multiple
    n_pad = n_seg * seg

    idx = jnp.arange(n, dtype=jnp.int32)

    # BWT
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    bwt_chars = jnp.take(text, prev, axis=0).astype(jnp.int32)
    bwt = jnp.full((n_pad,), INVALID_ALPHA, jnp.uint16)
    bwt = bwt.at[idx].set(bwt_chars.astype(jnp.uint16))
    bwt2d = bwt.reshape(n_seg, seg)

    # C array
    counts = jnp.zeros((ALPHA_SIZE,), jnp.int32).at[text].add(1)
    C = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )

    # occ checkpoints: per-seg histogram -> exclusive cumsum
    flat = (idx // seg) * ALPHA_SIZE + bwt_chars
    per_seg = (
        jnp.zeros((n_seg * ALPHA_SIZE,), jnp.int32)
        .at[flat]
        .add(1)
        .reshape(n_seg, ALPHA_SIZE)
    )
    occ_ckpt = jnp.concatenate(
        [
            jnp.zeros((1, ALPHA_SIZE), jnp.int32),
            jnp.cumsum(per_seg[:-1], axis=0).astype(jnp.int32),
        ]
    )

    # mark sampling: should_mark over text positions, permuted to row order
    if mark_period == 0:
        marked_pos = jnp.zeros((n,), dtype=bool)
    else:
        doc_of = (
            jnp.searchsorted(doc_starts, idx, side="right").astype(jnp.int32)
            - 1
        )
        doc_start = doc_starts[doc_of]
        doc_end = doc_starts[doc_of + 1]
        doc_off = idx - doc_start
        marked_pos = (
            (doc_off == 0)
            | (idx == doc_end - 1)
            | (doc_off % mark_period == 0)
        )
    marked_row = jnp.zeros((n_pad,), dtype=bool).at[idx].set(marked_pos[sa])

    # packed bitmap
    bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    mark_bits = jnp.sum(bits * weights, axis=1, dtype=jnp.uint32).reshape(
        n_seg, seg // 32
    )

    per_seg_marks = marked_row.reshape(n_seg, seg).sum(axis=1).astype(jnp.int32)
    mark_ckpt = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(per_seg_marks[:-1])]
    ).astype(jnp.int32)

    # mark values, compacted by mark rank (static capacity)
    cap = mark_cap(n, ndocs, mark_period, seg)
    mrow = marked_row[:n]
    mrank = jnp.cumsum(mrow.astype(jnp.int32)) - mrow.astype(jnp.int32)
    slot = jnp.where(mrow, jnp.minimum(mrank, cap - 1), cap)
    mark_vals = (
        jnp.full((cap + 1,), -1, jnp.int32)
        .at[slot]
        .set(sa.astype(jnp.int32), mode="drop")[:cap]
    )
    n_marks = jnp.sum(mrow.astype(jnp.int32))

    # doc SEOF rows via inverse SA
    isa = jnp.zeros((n,), jnp.int32).at[sa].set(idx)
    seof_pos = doc_starts[1:] - 1
    doc_seof_rows = isa[seof_pos]

    arrays = FMArrays(
        bwt=bwt2d,
        occ_ckpt=occ_ckpt,
        C=C,
        mark_bits=mark_bits,
        mark_ckpt=mark_ckpt,
        mark_vals=mark_vals,
        doc_starts=doc_starts,
        doc_seof_rows=doc_seof_rows,
    )
    return arrays, n_marks
