"""Sharded query execution: index rows distributed over the mesh.

The reference shards its index into blocks and routes leaf queries to block
owners (SURVEY.md §5.7, index.h:195-197 HDR_BSEARCH_BLOCK_ROWS); the TPU
analog shards the segment dimension of every row-indexed array and answers
each batched rank query cooperatively: the shard owning a row computes its
contribution, everyone else contributes zero, and one psum per step
broadcasts the result — queries ride ICI instead of a scheduler.

All functions here run INSIDE shard_map; `sharded_backward_search` wraps the
jit + shard_map plumbing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..alphabet import ALPHA_SIZE
from ..fmindex import FMArrays, FMMeta
from . import bins
from .mesh import DEFAULT_AXIS


def _occ_local(arrays: FMArrays, nseg_local: int, axis: str,
               c: jax.Array, r: jax.Array) -> jax.Array:
    """Local contribution to occ(c, r); psum'd by the caller."""
    seg = arrays.bwt.shape[1]
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    n_rows_total = D * nseg_local * seg
    valid = (c >= 0) & (c < ALPHA_SIZE)
    cc = jnp.where(valid, c, 0)
    # r == n_rows_total (the initial `last` of a padded sharded build) has
    # no owning segment: occ(c, n_rows) = total occurrences of c in the
    # BWT = C[c+1] - C[c]; shard 0 contributes it so the psum stays exact.
    at_end = valid & (r >= n_rows_total)
    s = r // seg
    sl = s - me * nseg_local
    mine = valid & (~at_end) & (sl >= 0) & (sl < nseg_local)
    sl = jnp.where(mine, sl, 0)
    off = r - s * seg
    base = arrays.occ_ckpt[sl, cc]
    segdata = jnp.take(arrays.bwt, sl, axis=0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, segdata.shape, 1)
    within = jnp.sum(
        (segdata == cc[:, None]) & (iota < off[:, None]), axis=1
    ).astype(jnp.int32)
    total = arrays.C[cc + 1] - arrays.C[cc]
    return (jnp.where(mine, base + within, 0)
            + jnp.where(at_end & (me == 0), total, 0))


def occ_sharded(arrays: FMArrays, nseg_local: int, axis: str,
                c: jax.Array, r: jax.Array) -> jax.Array:
    return jax.lax.psum(_occ_local(arrays, nseg_local, axis, c, r), axis)


def bwt_at_sharded(arrays: FMArrays, nseg_local: int, axis: str,
                   r: jax.Array) -> jax.Array:
    seg = arrays.bwt.shape[1]
    me = jax.lax.axis_index(axis)
    s = r // seg
    sl = s - me * nseg_local
    mine = (sl >= 0) & (sl < nseg_local)
    sl = jnp.where(mine, sl, 0)
    v = arrays.bwt[sl, r - s * seg].astype(jnp.int32)
    return jax.lax.psum(jnp.where(mine, v, 0), axis)


def lf_step_sharded(arrays: FMArrays, nseg_local: int, axis: str,
                    r: jax.Array) -> jax.Array:
    c = bwt_at_sharded(arrays, nseg_local, axis, r)
    return arrays.C[c] + occ_sharded(arrays, nseg_local, axis, c, r)


def _backward_search_body(arrays: FMArrays, pats: jax.Array, *, n: int,
                          row0: int, nseg_local: int, axis: str):
    B, P = pats.shape
    first = jnp.full(B, row0, dtype=jnp.int32)
    last = jnp.full(B, n, dtype=jnp.int32)
    cols = jnp.flip(pats, axis=1).T

    def step(carry, col):
        first, last = carry
        active = col >= 0
        c = jnp.where(active, col, 0)
        o1 = occ_sharded(arrays, nseg_local, axis, c, first)
        o2 = occ_sharded(arrays, nseg_local, axis, c, last)
        base = arrays.C[c]
        first = jnp.where(active, base + o1, first)
        last = jnp.where(active, base + o2, last)
        return (first, last), None

    (first, last), _ = jax.lax.scan(step, (first, last), cols)
    return first, last


def _locate_body(arrays: FMArrays, rows: jax.Array, *, mark_period: int,
                 nseg_local: int, axis: str):
    """Sharded locate: LF-walk to marked rows with mark metadata sharded."""
    seg = arrays.bwt.shape[1]
    me = jax.lax.axis_index(axis)
    mv_local = arrays.mark_vals.shape[0]  # per-shard value store capacity

    def mark_info(r):
        s = r // seg
        sl = s - me * nseg_local
        mine = (sl >= 0) & (sl < nseg_local)
        sl = jnp.where(mine, sl, 0)
        words = jnp.take(arrays.mark_bits, sl, axis=0)
        w_local = (r % seg) // 32
        widx = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
        full = jnp.where(widx < w_local[:, None], words, jnp.uint32(0))
        cnt = jnp.sum(jax.lax.population_count(full), axis=1).astype(jnp.int32)
        word = words[jnp.arange(words.shape[0]), w_local]
        bit = ((word >> (r % 32).astype(jnp.uint32)) & jnp.uint32(1)) != 0
        pmask = (jnp.uint32(1) << (r % 32).astype(jnp.uint32)) - jnp.uint32(1)
        part = jax.lax.population_count(word & pmask).astype(jnp.int32)
        grank = arrays.mark_ckpt[sl] + cnt + part
        is_m = jax.lax.psum(jnp.where(mine, bit.astype(jnp.int32), 0), axis) > 0
        # mark_vals is a PER-SHARD compaction (build_index_sharded's
        # _package_shard): the row's owner also owns its value at
        # grank - (global marks before this shard) = grank - mark_ckpt[0].
        lrank = jnp.clip(grank - arrays.mark_ckpt[0], 0, mv_local - 1)
        v = arrays.mark_vals[lrank]
        mv = jax.lax.psum(jnp.where(mine, v, 0), axis)
        return is_m, mv

    B = rows.shape[0]

    def body(i, st):
        rows, offs, done = st
        is_m, mv = mark_info(rows)
        hit = is_m & (~done)
        offs = jnp.where(hit, mv + i, offs)
        done = done | hit
        nxt = lf_step_sharded(arrays, nseg_local, axis, rows)
        rows = jnp.where(done, rows, nxt)
        return rows, offs, done

    offs0 = jnp.full(B, -1, dtype=jnp.int32)
    done0 = jnp.zeros(B, dtype=bool)
    _, offs, _ = jax.lax.fori_loop(0, mark_period + 1, body,
                                   (rows, offs0, done0))
    return offs


def _occ_owner_compute(arrays: FMArrays, nseg_local: int, axis: str,
                       rows: jax.Array, cc: jax.Array) -> jax.Array:
    """occ(c, row) for requests routed to their owning shard (absolute
    checkpoints carry the global base, so no psum is needed)."""
    seg = arrays.bwt.shape[1]
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    n_rows_total = D * nseg_local * seg
    valid = (cc >= 0) & (cc < ALPHA_SIZE)
    c = jnp.where(valid, cc, 0)
    at_end = rows >= n_rows_total
    s = rows // seg
    sl = jnp.clip(s - me * nseg_local, 0, nseg_local - 1)
    off = rows - s * seg
    base = arrays.occ_ckpt[sl, c]
    segdata = jnp.take(arrays.bwt, sl, axis=0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, segdata.shape, 1)
    within = jnp.sum(
        (segdata == c[:, None]) & (iota < off[:, None]), axis=1
    ).astype(jnp.int32)
    total = arrays.C[c + 1] - arrays.C[c]
    return jnp.where(valid, jnp.where(at_end, total, base + within), 0)


def _backward_search_routed_body(arrays: FMArrays, pats_local: jax.Array,
                                 key: jax.Array, *, n: int, row0: int,
                                 nseg_local: int, cap: int, axis: str):
    """Owner-routed sharded count: each shard owns B/D query lanes and, per
    character step, routes its (row, char) rank requests to the shard
    owning the row (the shard lookup of index.h:195-197), which answers
    from local arrays — per-shard gather load drops ~D/3x vs the masked
    all-shard + psum scheme (every shard no longer computes every lane).
    Returns (first, last, overflow); hot-row skew can overflow the exchange
    capacity, reported for host-side retry with a larger cap."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    B_local, P = pats_local.shape
    R = 2 * B_local
    seg = arrays.bwt.shape[1]
    rows_per_shard = nseg_local * seg
    first0 = jnp.full(B_local, row0, dtype=jnp.int32)
    last0 = jnp.full(B_local, n, dtype=jnp.int32)
    cols = jnp.flip(pats_local, axis=1).T
    rid_local = me * R + jnp.arange(R, dtype=jnp.int32)

    def step(carry, xs):
        first, last, of = carry
        col, kkey = xs
        active = col >= 0
        rows = jnp.concatenate([first, last])
        cc = jnp.concatenate([col, col]).astype(jnp.int32)
        dest = jnp.minimum(rows // rows_per_shard, D - 1)
        recs, v, of1 = bins.valiant_exchange(
            dest, [rows, cc, rid_local], cap, axis, kkey
        )
        vals = _occ_owner_compute(
            arrays, nseg_local, axis,
            jnp.where(v, recs[0], 0), jnp.where(v, recs[1], -1),
        )
        back, v2, of2 = bins.valiant_exchange(
            recs[2] // R, [recs[2], vals], cap, axis,
            jax.random.fold_in(kkey, 1), valid=v,
        )
        slot = jnp.where(v2, back[0] - me * R, R)
        o = jnp.zeros((R,), jnp.int32).at[slot].set(back[1], mode="drop")
        o1, o2 = o[:B_local], o[B_local:]
        base = arrays.C[jnp.where(active, col, 0)]
        first = jnp.where(active, base + o1, first)
        last = jnp.where(active, base + o2, last)
        of = jnp.maximum(of, jnp.maximum(of1, of2))
        return (first, last, of), None

    keys = jax.random.split(key, P)
    init = jax.lax.pvary((first0, last0, jnp.int32(0)), (axis,))
    (first, last, of), _ = jax.lax.scan(step, init, (cols, keys))
    return first, last, jax.lax.pmax(of, axis)


def _locate_routed_body(arrays: FMArrays, rows_local: jax.Array,
                        key: jax.Array, *, mark_period: int,
                        nseg_local: int, cap: int, axis: str):
    """Owner-routed sharded locate: each shard owns B/D lanes; every LF
    step routes each lane's row to its owning shard, which answers with
    (lf_row, is_marked, mark_value) from purely local arrays (the shard
    that owns a row also owns its mark_vals entry).  Returns
    (offsets, overflow)."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    B_local = rows_local.shape[0]
    seg = arrays.bwt.shape[1]
    rows_per_shard = nseg_local * seg
    mv_local = arrays.mark_vals.shape[0]
    rid_local = me * B_local + jnp.arange(B_local, dtype=jnp.int32)

    def owner_answer(r):
        """(lf, marked, mark_val) for rows this shard owns."""
        s = jnp.clip(r // seg, me * nseg_local,
                     me * nseg_local + nseg_local - 1)
        sl = s - me * nseg_local
        off = r - s * seg
        segdata = jnp.take(arrays.bwt, sl, axis=0).astype(jnp.int32)
        c = segdata[jnp.arange(r.shape[0]), jnp.clip(off, 0, seg - 1)]
        base = arrays.occ_ckpt[sl, c]
        iota = jax.lax.broadcasted_iota(jnp.int32, segdata.shape, 1)
        within = jnp.sum(
            (segdata == c[:, None]) & (iota < off[:, None]), axis=1
        ).astype(jnp.int32)
        lf = arrays.C[c] + base + within
        words = jnp.take(arrays.mark_bits, sl, axis=0)
        w_local = jnp.clip(off, 0, seg - 1) // 32
        word = words[jnp.arange(r.shape[0]), w_local]
        bit = ((word >> (r % 32).astype(jnp.uint32)) & jnp.uint32(1)) != 0
        widx = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
        full = jnp.where(widx < w_local[:, None], words, jnp.uint32(0))
        cnt = jnp.sum(jax.lax.population_count(full), axis=1).astype(
            jnp.int32)
        pmask = ((jnp.uint32(1) << (r % 32).astype(jnp.uint32))
                 - jnp.uint32(1))
        part = jax.lax.population_count(word & pmask).astype(jnp.int32)
        grank = arrays.mark_ckpt[sl] + cnt + part
        mv = arrays.mark_vals[jnp.clip(grank - arrays.mark_ckpt[0],
                                       0, mv_local - 1)]
        return lf, bit, mv

    def body(i, st):
        rows, offs, done, of = st
        kkey = jax.random.fold_in(key, i)
        dest = jnp.minimum(rows // rows_per_shard, D - 1)
        recs, v, of1 = bins.valiant_exchange(
            dest, [rows, rid_local], cap, axis, kkey
        )
        lf, bit, mv = owner_answer(jnp.where(v, recs[0], me * rows_per_shard))
        ans = jnp.where(bit, mv, -1 - lf)   # >=0: offset; <0: next row
        back, v2, of2 = bins.valiant_exchange(
            recs[1] // B_local, [recs[1], ans], cap, axis,
            jax.random.fold_in(kkey, 1), valid=v,
        )
        slot = jnp.where(v2, back[0] - me * B_local, B_local)
        a = jnp.zeros((B_local,), jnp.int32).at[slot].set(
            back[1], mode="drop")
        hit = (a >= 0) & (~done)
        offs = jnp.where(hit, a + i, offs)
        done = done | hit
        rows = jnp.where(done, rows, -1 - a)
        of = jnp.maximum(of, jnp.maximum(of1, of2))
        return rows, offs, done, of

    offs0, done0, of0 = jax.lax.pvary(
        (jnp.full(B_local, -1, dtype=jnp.int32),
         jnp.zeros(B_local, dtype=bool), jnp.int32(0)), (axis,))
    _, offs, _, of = jax.lax.fori_loop(
        0, mark_period + 1, body, (rows_local, offs0, done0, of0))
    return offs, jax.lax.pmax(of, axis)


def _specs_for_arrays(axis: str):
    """PartitionSpecs matching build_index_sharded's placement."""
    return FMArrays(
        bwt=P(axis, None),
        occ_ckpt=P(axis, None),
        occ_l1=P(),
        C=P(),
        mark_bits=P(axis, None),
        mark_ckpt=P(axis),
        mark_vals=P(axis),
        doc_starts=P(),
        doc_seof_rows=P(),
        alpha_map=P(),
        alpha_rev=P(),
    )


def sharded_backward_search(index, mesh: Mesh, pats: np.ndarray,
                            axis: str = DEFAULT_AXIS,
                            routed: bool = True,
                            cap_factor: float = 6.0,
                            max_retries: int = 3,
                            seed: int = 0):
    """Count ranges with the index sharded across `mesh`.

    pats: int32[B, P] right-aligned (-1 padded).  Returns (first, last).

    routed=True (default) partitions the query lanes over the mesh and
    routes each rank request to the shard owning its row (two Valiant
    exchanges per step) — per-shard gather load scales with B/D instead of
    B.  Hot-row skew (every lane probing the same row) can overflow the
    exchange capacity; the wrapper retries with doubled capacity and falls
    back to the masked-psum scheme as a last resort.
    """
    meta: FMMeta = index.meta
    if index.arrays.occ_ckpt.dtype != jnp.int32:
        raise ValueError(
            "sharded queries need the absolute (int32) checkpoint tier; "
            "build with compact=False for mesh sharding"
        )
    D = mesh.devices.size
    nseg_local = meta.n_seg // D
    pats = np.asarray(pats)
    if routed:
        B = pats.shape[0]
        Bp = -(-B // D) * D
        pp = np.full((Bp, pats.shape[1]), -1, np.int32)
        pp[:B] = pats
        B_local = Bp // D
        cap = max(16, int(np.ceil(cap_factor * 2 * B_local / D)))
        cap_max = 2 * Bp
        for attempt in range(max_retries):
            fn = functools.partial(
                _backward_search_routed_body, n=meta.n_rows,
                row0=meta.row0, nseg_local=nseg_local,
                cap=min(cap, cap_max), axis=axis,
            )
            mapped = jax.shard_map(
                fn, mesh=mesh,
                in_specs=(_specs_for_arrays(axis), P(axis, None), P()),
                out_specs=(P(axis), P(axis), P()),
            )
            first, last, of = jax.jit(mapped)(
                index.arrays, jnp.asarray(pp),
                jax.random.PRNGKey(seed + attempt),
            )
            if int(jax.device_get(of)) <= 0:
                return first[:B], last[:B]
            cap *= 4
        # fall through to the masked-psum scheme (no capacity limits)
    fn = functools.partial(
        _backward_search_body, n=meta.n_rows, row0=meta.row0,
        nseg_local=nseg_local, axis=axis,
    )
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(_specs_for_arrays(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)(index.arrays, jnp.asarray(pats))


def sharded_locate(index, mesh: Mesh, rows: np.ndarray,
                   axis: str = DEFAULT_AXIS,
                   routed: bool = True,
                   cap_factor: float = 6.0,
                   max_retries: int = 3,
                   seed: int = 0):
    """Locate rows against a mesh-sharded index.  routed=True (default)
    partitions the lanes and routes every LF step's request to the row's
    owning shard (per-shard gather load ~B/D); retries with larger exchange
    capacity on hot-row skew and falls back to the masked-psum walk."""
    meta: FMMeta = index.meta
    if index.arrays.occ_ckpt.dtype != jnp.int32:
        raise ValueError(
            "sharded queries need the absolute (int32) checkpoint tier; "
            "build with compact=False for mesh sharding"
        )
    D = mesh.devices.size
    nseg_local = meta.n_seg // D
    rows = np.asarray(rows)
    if routed:
        B = rows.shape[0]
        Bp = -(-B // D) * D
        rr = np.zeros(Bp, np.int32)
        rr[:B] = rows
        B_local = Bp // D
        cap = max(16, int(np.ceil(cap_factor * B_local / D)))
        for attempt in range(max_retries):
            fn = functools.partial(
                _locate_routed_body, mark_period=meta.mark_period,
                nseg_local=nseg_local, cap=min(cap, Bp), axis=axis,
            )
            mapped = jax.shard_map(
                fn, mesh=mesh,
                in_specs=(_specs_for_arrays(axis), P(axis), P()),
                out_specs=(P(axis), P()),
            )
            offs, of = jax.jit(mapped)(
                index.arrays, jnp.asarray(rr),
                jax.random.PRNGKey(seed + attempt),
            )
            if int(jax.device_get(of)) <= 0:
                return offs[:B]
            cap *= 4
    fn = functools.partial(
        _locate_body, mark_period=meta.mark_period,
        nseg_local=nseg_local, axis=axis,
    )
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(_specs_for_arrays(axis), P()),
        out_specs=P(),
    )
    return jax.jit(mapped)(index.arrays, jnp.asarray(rows))