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
    jax.jit, static_argnames=("n", "n_seg", "seg", "compact", "alpha")
)
def _occ_stage(bwt_chars, *, n, n_seg, seg, compact=False, alpha=ALPHA_SIZE):
    # Per-segment histogram on the MXU: split the symbol c = hi*32 + lo
    # (hi < ceil(alpha/32), lo < 32) and contract the two narrow one-hot
    # planes per segment — per_seg[s, hi, lo] = sum_r (hi_r==hi)(lo_r==lo)
    # is one [seg,NHI]^T @ [seg,32] matmul per segment.  This replaces the
    # alpha-wide VPU compare-reduce (n*alpha lanes) with n*(NHI+32) one-hot
    # lanes + an MXU contraction; exact in f32 (0/1 inputs, counts <= seg).
    # Chunked via lax.map so the one-hot planes never materialize at O(n).
    CH = 2048
    nchunks = -(-n_seg // CH)
    NHI = -(-alpha // 32)
    b2 = jnp.full((nchunks * CH * seg,), -1, jnp.int32)
    b2 = jax.lax.dynamic_update_slice(b2, bwt_chars, (0,))
    b3 = b2.reshape(nchunks, CH, seg)

    def chunk(bc):
        hi = bc >> 5   # pad rows are -1: hi==-1 matches no plane lane
        lo = bc & 31
        A = (hi[:, :, None] == jnp.arange(NHI)[None, None, :]).astype(
            jnp.bfloat16)
        Bm = (lo[:, :, None] == jnp.arange(32)[None, None, :]).astype(
            jnp.bfloat16)
        ps = jnp.einsum(
            "sri,srj->sij", A, Bm, preferred_element_type=jnp.float32
        )
        return ps.reshape(CH, NHI * 32)[:, :alpha].astype(jnp.int32)

    per_seg = jax.lax.map(chunk, b3).reshape(-1, alpha)[:n_seg]
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
    jax.jit,
    static_argnames=("n", "n_pad", "seg", "mark_period", "cap", "ndocs"),
)
def _marks_stage(sa, doc_starts, *, n, n_pad, seg, mark_period, cap, ndocs):
    """Mark sampling + per-doc SEOF rows in one pass.

    should_mark (index_types.h:134-144) is evaluated over *positions* with
    an O(n) cummax (doc-start propagation) instead of a per-row binary
    search, packed into one aux word per position together with the SEOF
    doc tag, and permuted into row order by a single gather through sa —
    the only random-access pass.  The full-ISA scatter of the old
    _isa_stage is gone (its answer rides the same gather)."""
    n_seg = n_pad // seg
    idx = jnp.arange(n, dtype=jnp.int32)
    seof_pos = doc_starts[1:] - 1
    # aux word per position: bit0 = should_mark, bits1.. = doc id + 1 at
    # the doc's SEOF position (0 elsewhere).
    tag = jnp.zeros((n,), jnp.int32).at[seof_pos].set(
        jnp.arange(1, ndocs + 1, dtype=jnp.int32)
    )
    if mark_period == 0:
        marked_pos = jnp.zeros((n,), bool)
    else:
        is_start = jnp.zeros((n,), bool).at[doc_starts[:-1]].set(True)
        doc_start_of = jax.lax.cummax(jnp.where(is_start, idx, 0))
        doc_off = idx - doc_start_of
        marked_pos = is_start | (tag > 0) | (doc_off % mark_period == 0)
    aux = marked_pos.astype(jnp.int32) | (tag << 1)
    a_row = jnp.take(aux, sa, axis=0)               # the one random gather
    marked_sa = (a_row & 1) != 0
    row_tag = a_row >> 1
    doc_seof_rows = (
        jnp.zeros((ndocs + 1,), jnp.int32)
        .at[jnp.where(row_tag > 0, row_tag - 1, ndocs)]
        .set(idx, mode="drop")[:ndocs]
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
        .set(sa.astype(jnp.int32), mode="drop", indices_are_sorted=True)[:cap]
    )
    n_marks = jnp.sum(mrow.astype(jnp.int32))
    return mark_bits, mark_ckpt, mark_vals, n_marks, doc_seof_rows


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
    mark_bits, mark_ckpt, mark_vals, n_marks, doc_seof_rows = _marks_stage(
        sa, doc_starts, n=n, n_pad=n_pad, seg=seg,
        mark_period=mark_period, cap=cap, ndocs=ndocs,
    )

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
