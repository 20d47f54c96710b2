"""Distributed suffix-array / BWT / index construction over a device mesh.

The TPU re-architecture of the reference's MPI DCX pipeline
(/root/reference/src/dcx_cc/dcx.hh:4038 suffix_sort_impl, 4786 form_bwt_node,
4930 write_index_files_node): text is sharded into equal per-device blocks
(the "bins"), and construction proceeds as prefix-doubling rounds where each
round is one distributed sample sort + one randomized owner-exchange —
all ICI collectives, no host round-trips.

Layout conventions:
  * global text is padded with trailing ESCAPE(0) symbols to n_pad = D*m,
    m a multiple of SEG.  Pad suffixes (all-zero strings) occupy the first
    `pad` rows of the padded suffix array and are harmless to queries: no
    pattern symbol is < 1, doc starts are always marked, and C/occ tables
    simply include the pad symbol at code 0.
  * every per-row/per-segment array (SA, BWT, occ_ckpt, mark bits) is
    sharded on its leading dimension; C, doc_starts, doc_seof_rows are
    replicated.

Overflow: exchanges report capacity overflow (see bins.py); build functions
return it so the host driver can retry with a larger capacity factor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alphabet import INVALID_ALPHA
from ..fmindex import DEFAULT_MARK_PERIOD, DEFAULT_SEG, FMArrays, FMMeta
from . import bins
from .dist_sort import dist_sort
from .mesh import DEFAULT_AXIS


def _shift_left_blocks(x: jax.Array, k: int, n_pad: int, fill, axis: str):
    """Global left-shift by static k of an equally-block-sharded array:
    out[i] = global_x[i+k], positions past the end get `fill`.
    Runs inside shard_map; two ppermutes (blocks d+q, d+q+1)."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    m = x.shape[0]
    q, r = divmod(k, m)
    # receive block me+q and me+q+1 (cyclic; out-of-range masked below)
    def fetch(shift):
        if shift % D == 0:
            return x
        perm = [(i, (i - shift) % D) for i in range(D)]
        return jax.lax.ppermute(x, axis, perm)

    a = fetch(q)
    b = fetch(q + 1)
    if r == 0:
        shifted = a
    else:
        shifted = jnp.concatenate([a[r:], b[:r]])
    gidx = me * m + jnp.arange(m, dtype=jnp.int32)
    return jnp.where(gidx < n_pad - k, shifted, fill)


def _exclusive_base(v: jax.Array, axis: str):
    """Exclusive prefix over devices of per-device scalar v."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    allv = jax.lax.all_gather(v, axis)
    return jnp.sum(jnp.where(jnp.arange(D) < me, allv, 0)).astype(v.dtype)


def _dist_sa_shardmap(text_block: jax.Array, key: jax.Array, *, n: int,
                      n_pad: int, cap: int, axis: str):
    """Per-device body: returns (sa_block, bwt_block, overflow)."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    m = text_block.shape[0]
    gidx = me * m + jnp.arange(m, dtype=jnp.int32)
    t = text_block.astype(jnp.int32)

    shifts = [_shift_left_blocks(t, j, n_pad, 0, axis) for j in range(1, 6)]
    rank = (t << 18) | (shifts[0] << 9) | shifts[1]
    rank_b = (shifts[2] << 18) | (shifts[3] << 9) | shifts[4]
    # Pad suffixes are 0^j strings that only differ by length; prefix
    # doubling cannot separate them (both fall out of range in the same
    # round), so seed them with distinct, correctly ordered negative ranks:
    # shorter pad suffix (larger position) sorts first.
    rank = jnp.where(gidx >= n, -1 - gidx, rank)
    overflow = jnp.int32(0)
    done = jnp.bool_(False)

    # densify (two 3-symbol keys -> 6-symbol prefixes) + doubling rounds
    ks = [0]
    k = 6
    while k < n_pad:
        ks.append(k)
        k *= 2

    for k in ks:
        def round_body(state):
            rank, overflow = state
            kkey = jax.random.fold_in(key, k)
            if k == 0:
                rank_k = rank_b
            else:
                rank_k = _shift_left_blocks(rank, k, n_pad, -1, axis)
            (s1, s2, sidx), _, of = dist_sort(
                (rank, rank_k, gidx), (), axis, cap,
                key=jax.random.fold_in(kkey, 1),
            )
            # adjacent-diff with previous device's last sorted key
            prev1 = jax.lax.ppermute(s1[-1], axis, [(i, (i + 1) % D) for i in range(D)])
            prev2 = jax.lax.ppermute(s2[-1], axis, [(i, (i + 1) % D) for i in range(D)])
            p1 = jnp.concatenate([prev1[None], s1[:-1]])
            p2 = jnp.concatenate([prev2[None], s2[:-1]])
            diff = ((s1 != p1) | (s2 != p2)).astype(jnp.int32)
            first_global = (me * m + jnp.arange(m, dtype=jnp.int32)) == 0
            diff = jnp.where(first_global, 0, diff)
            local_cum = jnp.cumsum(diff)
            base = _exclusive_base(local_cum[-1], axis)
            new_rank_sorted = base + local_cum
            nuniq = jax.lax.psum(jnp.sum(diff), axis) + 1
            # scatter new ranks back to position order (Valiant exchange)
            recs, rvalid, of2 = bins.valiant_exchange(
                sidx // m, [sidx, new_rank_sorted], cap, axis, kkey
            )
            lpos = jnp.where(rvalid, recs[0] - me * m, m)
            new_rank = jnp.zeros((m,), jnp.int32).at[lpos].set(
                recs[1], mode="drop"
            )
            overflow = jnp.maximum(overflow, jnp.maximum(of, of2))
            return new_rank, overflow, nuniq

        if k == 0:
            rank, overflow, nuniq = round_body((rank, overflow))
            done = nuniq >= n_pad
        else:
            rank, overflow, nuniq = jax.lax.cond(
                done,
                lambda st: (st[0], st[1], jnp.int32(n_pad)),
                round_body,
                (rank, overflow),
            )
            done = done | (nuniq >= n_pad)

    # SA: sort positions by final rank
    (sr, sidx), _, of = dist_sort(
        (rank, gidx), (), axis, cap, key=jax.random.fold_in(key, 1 << 29)
    )
    overflow = jnp.maximum(overflow, of)
    sa = sidx

    # BWT: bwt[r] = text[(sa[r]-1) mod n_pad] via request routing
    pos = jnp.where(sa == 0, n_pad - 1, sa - 1)
    kkey = jax.random.fold_in(key, 1 << 30)
    recs, rvalid, of1 = bins.valiant_exchange(
        pos // m, [pos, gidx], cap, axis, kkey
    )
    lp = jnp.where(rvalid, recs[0] - me * m, 0)
    chars = jnp.where(rvalid, text_block[lp].astype(jnp.int32), 0)
    # route answers back to the row owner
    kkey2 = jax.random.fold_in(key, (1 << 30) + 1)
    recs2, rvalid2, of2 = bins.valiant_exchange(
        recs[1] // m, [recs[1], chars], cap, axis, kkey2, valid=rvalid
    )
    lrow = jnp.where(rvalid2, recs2[0] - me * m, m)
    bwt = jnp.full((m,), INVALID_ALPHA, jnp.int32).at[lrow].set(
        recs2[1], mode="drop"
    )
    overflow = jnp.maximum(overflow, jnp.maximum(of1, of2))
    return sa, bwt, overflow


def dist_suffix_array(
    text: jax.Array,
    mesh: Mesh,
    axis: str = DEFAULT_AXIS,
    cap_factor: float = 4.0,
    seed: int = 0,
    n: Optional[int] = None,
):
    """Distributed SA+BWT of a padded, equally-sharded text.

    text: int32[n_pad] with n_pad % (D * SEG) == 0 (pad with 0 symbols);
    n: real (unpadded) length, defaults to n_pad.
    Returns (sa, bwt, overflow) sharded arrays; check overflow == 0 on host
    and retry with a larger cap_factor if not.
    """
    D = mesh.devices.size
    n_pad = int(text.shape[0])
    if n is None:
        n = n_pad
    m = n_pad // D
    cap = max(64, int(np.ceil(cap_factor * m / D)))
    key = jax.random.PRNGKey(seed)

    fn = functools.partial(
        _dist_sa_shardmap, n=n, n_pad=n_pad, cap=cap, axis=axis
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis), P()),
    )
    return jax.jit(mapped)(text, key)


def pad_text_for_mesh(text_np: np.ndarray, D: int, seg: int = DEFAULT_SEG):
    """Pad prepared text with trailing 0s to a multiple of D*seg."""
    n = int(text_np.shape[0])
    block = D * seg
    n_pad = -(-n // block) * block
    out = np.zeros(n_pad, dtype=np.int32)
    out[:n] = text_np.astype(np.int32)
    return out, n_pad


def _pad_to_multiple(arr, d: int):
    """Pad a 1-D array with -1 so its length divides the mesh size
    (mark_vals is sharded by global mark rank; pad lanes never resolve)."""
    import jax.numpy as jnp

    pad = (-arr.shape[0]) % d
    if pad == 0:
        return arr
    return jnp.concatenate([arr, jnp.full((pad,), -1, arr.dtype)])


def build_index_sharded(
    prepared,
    mesh: Mesh,
    axis: str = DEFAULT_AXIS,
    seg: int = DEFAULT_SEG,
    mark_period: int = DEFAULT_MARK_PERIOD,
    cap_factor: float = 4.0,
    max_retries: int = 3,
):
    """Distributed end-to-end build.  SA/BWT are computed fully sharded on
    the mesh; index packaging runs on host (like the single-chip path) and
    the resulting FMArrays can be device_put with a row sharding for
    sharded queries (dist_query.py).

    Returns an FMIndex whose arrays live sharded across `mesh`.
    """
    from ..fmindex import FMIndex, build_fm_arrays
    from .mesh import row_sharding, replicated

    D = mesh.devices.size
    text_pad, n_pad = pad_text_for_mesh(prepared.text, D, seg)
    sharding = NamedSharding(mesh, P(axis))
    text_dev = jax.device_put(jnp.asarray(text_pad), sharding)

    cf = cap_factor
    for attempt in range(max_retries):
        sa, bwt, overflow = dist_suffix_array(
            text_dev, mesh, axis, cap_factor=cf, seed=attempt, n=prepared.n
        )
        if int(jax.device_get(overflow)) <= 0:
            break
        cf *= 2.0
    else:
        # Deterministic last resort: cap = m (a single pair can never carry
        # more than one device's whole block), memory-heavy but cannot
        # overflow — the randomized-retry analog of MPI backpressure.
        sa, bwt, overflow = dist_suffix_array(
            text_dev, mesh, axis, cap_factor=float(D), seed=max_retries,
            n=prepared.n,
        )
        if int(jax.device_get(overflow)) > 0:
            raise RuntimeError(
                "distributed sort capacity overflow even at cap=m"
            )

    # Host packaging over the real (unpadded) rows: pad rows are the first
    # `pad` rows (all-zero suffixes sort before everything).
    n = prepared.n
    pad = n_pad - n
    sa_np = np.asarray(jax.device_get(sa))[pad:]
    arrays, meta = build_fm_arrays(
        prepared.text, sa_np.astype(np.int64), prepared.doc_starts,
        seg=seg, mark_period=mark_period, seg_multiple=D,
    )
    # re-place arrays sharded over the mesh
    row = row_sharding(mesh, axis)
    rep = replicated(mesh)

    def shardable(x):
        return x.shape[0] % D == 0

    arrays = FMArrays(
        bwt=jax.device_put(arrays.bwt, row if shardable(arrays.bwt) else rep),
        occ_ckpt=jax.device_put(
            arrays.occ_ckpt, row if shardable(arrays.occ_ckpt) else rep
        ),
        occ_l1=jax.device_put(arrays.occ_l1, rep),
        C=jax.device_put(arrays.C, rep),
        mark_bits=jax.device_put(
            arrays.mark_bits, row if shardable(arrays.mark_bits) else rep
        ),
        mark_ckpt=jax.device_put(
            arrays.mark_ckpt, row if shardable(arrays.mark_ckpt) else rep
        ),
        mark_vals=jax.device_put(_pad_to_multiple(arrays.mark_vals, D), row),
        doc_starts=jax.device_put(arrays.doc_starts, rep),
        doc_seof_rows=jax.device_put(arrays.doc_seof_rows, rep),
    )
    return FMIndex(
        arrays=arrays,
        meta=meta,
        doc_starts_np=prepared.doc_starts.astype(np.int64),
        infos=list(prepared.infos),
        header_lens_np=prepared.header_lens,
    )
