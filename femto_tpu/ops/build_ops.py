"""On-device index assembly: BWT, occ checkpoints, mark sampling.

The reference's constructor (/root/reference/src/main/construct.c:41-160,
index.c:309-740 compress_bucket) serializes buckets CPU-side; here the whole
packaging is a handful of scatter/cumsum/gather passes that run on the
accelerator right after the suffix sort, so "build" stays on-device from raw
text to queryable index.

The assembly is split into several small jitted stages (BWT, occ, marks,
ISA) instead of one fused graph: the deployment environment compiles
remotely and very large fused graphs have pathological compile times, while
the stages compile in seconds and the intermediate arrays stay on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import ALPHA_SIZE, INVALID_ALPHA
from ..fmindex import FMArrays


def mark_cap(n: int, ndocs: int, mark_period: int, seg: int) -> int:
    """Static upper bound on the number of marked rows."""
    if mark_period == 0:
        base = 1
    else:
        base = n // mark_period + 2 * ndocs + 2
    return -(-base // 128) * 128


@functools.partial(jax.jit, static_argnames=("n", "n_pad"))
def _bwt_stage(text, sa, *, n, n_pad):
    prev = jnp.where(sa == 0, n - 1, sa - 1)
    bwt_chars = jnp.take(text, prev, axis=0).astype(jnp.int32)
    pad = jnp.full((n_pad - n,), INVALID_ALPHA, jnp.uint16)
    bwt = jnp.concatenate([bwt_chars.astype(jnp.uint16), pad])
    return bwt, bwt_chars


@functools.partial(
    jax.jit, static_argnames=("n", "n_seg", "seg", "compact")
)
def _occ_stage(bwt_chars, *, n, n_seg, seg, compact=False):
    # Per-segment histogram as a chunked compare-reduce (scatter-add lowers
    # ~12x slower on TPU for this shape; measured in PERF.md).
    CH = 512
    nchunks = -(-n_seg // CH)
    b2 = jnp.full((nchunks * CH * seg,), -1, jnp.int32)
    b2 = jax.lax.dynamic_update_slice(b2, bwt_chars, (0,))
    b3 = b2.reshape(nchunks, CH, seg)

    def chunk(bc):
        return jnp.sum(
            bc[:, :, None] == jnp.arange(ALPHA_SIZE)[None, None, :], axis=1
        ).astype(jnp.int32)

    per_seg = jax.lax.map(chunk, b3).reshape(-1, ALPHA_SIZE)[:n_seg]
    counts = per_seg.sum(axis=0)
    C = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    occ_ckpt = jnp.concatenate(
        [
            jnp.zeros((1, ALPHA_SIZE), jnp.int32),
            jnp.cumsum(per_seg[:-1], axis=0).astype(jnp.int32),
        ]
    )
    if not compact:
        return C, occ_ckpt, jnp.zeros((1, ALPHA_SIZE), jnp.int32)
    from ..fmindex import L1_GROUP

    n_grp = n_seg // L1_GROUP
    occ_l1 = occ_ckpt[:: L1_GROUP][:n_grp]
    rel = occ_ckpt - jnp.repeat(occ_l1, L1_GROUP, axis=0)[:n_seg]
    return C, rel.astype(jnp.uint16), occ_l1


@functools.partial(
    jax.jit, static_argnames=("n", "n_pad", "seg", "mark_period", "cap")
)
def _marks_stage(sa, doc_starts, *, n, n_pad, seg, mark_period, cap):
    n_seg = n_pad // seg
    idx = jnp.arange(n, dtype=jnp.int32)
    if mark_period == 0:
        marked_sa = jnp.zeros((n,), dtype=bool)
    else:
        # should_mark evaluated directly at position sa[r] (gathers only)
        pos = sa
        doc_of = (
            jnp.searchsorted(doc_starts, pos, side="right").astype(jnp.int32)
            - 1
        )
        doc_start = doc_starts[doc_of]
        doc_end = doc_starts[doc_of + 1]
        doc_off = pos - doc_start
        marked_sa = (
            (doc_off == 0) | (pos == doc_end - 1)
            | (doc_off % mark_period == 0)
        )
    marked_row = jnp.concatenate(
        [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)]
    )
    bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    mark_bits = jnp.sum(bits * weights, axis=1, dtype=jnp.uint32).reshape(
        n_seg, seg // 32
    )
    per_seg_marks = (
        marked_row.reshape(n_seg, seg).sum(axis=1).astype(jnp.int32)
    )
    mark_ckpt = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(per_seg_marks[:-1])]
    ).astype(jnp.int32)

    mrow = marked_sa
    mrank = jnp.cumsum(mrow.astype(jnp.int32)) - mrow.astype(jnp.int32)
    slot = jnp.where(mrow, jnp.minimum(mrank, cap - 1), cap)
    mark_vals = (
        jnp.full((cap + 1,), -1, jnp.int32)
        .at[slot]
        .set(sa.astype(jnp.int32), mode="drop")[:cap]
    )
    n_marks = jnp.sum(mrow.astype(jnp.int32))
    return mark_bits, mark_ckpt, mark_vals, n_marks


@functools.partial(jax.jit, static_argnames=("n",))
def _isa_stage(sa, doc_starts, *, n):
    idx = jnp.arange(n, dtype=jnp.int32)
    isa = jnp.zeros((n,), jnp.int32).at[sa].set(idx)
    seof_pos = doc_starts[1:] - 1
    return isa[seof_pos]


def build_fm_arrays_device(
    text: jax.Array,
    sa: jax.Array,
    doc_starts: jax.Array,
    *,
    n: int,
    seg: int,
    mark_period: int,
    ndocs: int,
    seg_multiple: int = 1,
    compact: bool = False,
) -> Tuple[FMArrays, jax.Array]:
    """Assemble FMArrays on device.  Returns (arrays, n_marks scalar).

    compact=True stores uint16 segment checkpoints relative to sparse int32
    L1 group rows (see FMArrays docstring) — 28% smaller index."""
    from ..fmindex import L1_GROUP

    n_seg = n // seg + 1
    n_seg = -(-n_seg // seg_multiple) * seg_multiple
    if compact:
        if seg * L1_GROUP > 0xFFFF:
            raise ValueError(
                "compact tier needs seg * L1_GROUP <= 65535 "
                "(uint16 relative checkpoints)"
            )
        n_seg = -(-n_seg // L1_GROUP) * L1_GROUP
    n_pad = n_seg * seg

    bwt, bwt_chars = _bwt_stage(text, sa, n=n, n_pad=n_pad)
    C, occ_ckpt, occ_l1 = _occ_stage(
        bwt_chars, n=n, n_seg=n_seg, seg=seg, compact=compact
    )
    cap = mark_cap(n, ndocs, mark_period, seg)
    mark_bits, mark_ckpt, mark_vals, n_marks = _marks_stage(
        sa, doc_starts, n=n, n_pad=n_pad, seg=seg,
        mark_period=mark_period, cap=cap,
    )
    doc_seof_rows = _isa_stage(sa, doc_starts, n=n)

    arrays = FMArrays(
        bwt=bwt.reshape(n_seg, seg),
        occ_ckpt=occ_ckpt,
        occ_l1=occ_l1,
        C=C,
        mark_bits=mark_bits,
        mark_ckpt=mark_ckpt,
        mark_vals=mark_vals,
        doc_starts=doc_starts,
        doc_seof_rows=doc_seof_rows,
    )
    return arrays, n_marks
