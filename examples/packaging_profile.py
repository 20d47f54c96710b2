"""Stage-by-stage packaging profile at flagship chunk size (VERDICT r4
item #3): where do the ~1.5 s/128 MiB of packed packaging go?

Times each device stage of build_fm_arrays_device separately (packed +
vseg tiers) on a zipf corpus, plus the suffix sort for reference.

Usage: python examples/packaging_profile.py [--mb 128] [--tier packed]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import femto_tpu as ft  # noqa: E402
from femto_tpu.alphabet import ALPHA_SIZE, CHARACTER_OFFSET, SEOF  # noqa: E402
from femto_tpu.ops import build_ops as B  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(name, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    log(f"  {name:>28}: {dt*1e3:8.1f} ms")
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=128.0)
    ap.add_argument("--seg", type=int, default=512)
    ap.add_argument("--mark", type=int, default=20)
    ap.add_argument("--tiers", default="packed,vseg,vrle")
    args = ap.parse_args()

    n = int(args.mb * (1 << 20))
    doc_size = 1 << 16
    ndocs = n // doc_size
    n = ndocs * doc_size
    seg, mp = args.seg, args.mark

    letters = jnp.asarray(
        np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n", np.uint8)
        .astype(np.int32) + CHARACTER_OFFSET)
    probs = 1.0 / np.arange(1, 31, dtype=np.float32)
    logits = jnp.log(jnp.asarray(probs / probs.sum()))

    @jax.jit
    def gen(key):
        ix = jax.random.categorical(key, logits, shape=(n,))
        text = letters[ix]
        pos = jnp.arange(n, dtype=jnp.int32)
        return jnp.where(pos % doc_size == doc_size - 1, SEOF, text)

    text = gen(jax.random.PRNGKey(7))
    jax.block_until_ready(text)
    alpha_np = np.unique(np.asarray(letters.astype(np.int32)))
    alpha_np = np.unique(np.concatenate([alpha_np, [SEOF]])).astype(np.int32)
    doc_starts = jnp.asarray(
        np.arange(ndocs + 1, dtype=np.int32) * doc_size)

    log(f"n = {n/2**20:.0f} MiB, seg={seg}, mark_period={mp}, "
        f"K={alpha_np.size}")

    payload = B.build_sa_payload(text, doc_starts, n=n, mark_period=mp,
                                 ndocs=ndocs)
    jax.block_until_ready(payload)
    t0 = time.perf_counter()
    sa, pull = ft.suffix_array(text, payload=payload, alpha=alpha_np)
    jax.block_until_ready((sa, pull))
    t_sa = time.perf_counter() - t0
    log(f"  {'suffix_array (1 rep)':>28}: {t_sa*1e3:8.1f} ms "
        f"({n/2**20/t_sa:.1f} MiB/s)")

    n_seg = n // seg + 1
    from femto_tpu.fmindex import L1_GROUP
    n_seg = -(-n_seg // L1_GROUP) * L1_GROUP
    n_pad = n_seg * seg

    timed("split_pull", B._split_pull, pull, n=n, n_pad=n_pad)
    bwt, bwt_chars, a_row = B._split_pull(pull, n=n, n_pad=n_pad)

    cap = B.mark_cap(n, ndocs, mp, seg)
    timed("marks_finish", B._marks_finish, sa, a_row, n=n, n_pad=n_pad,
          seg=seg, cap=cap, ndocs=ndocs, mark_period=mp)
    mark_bits, mark_ckpt, mark_vals, n_marks, dsr = B._marks_finish(
        sa, a_row, n=n, n_pad=n_pad, seg=seg, cap=cap, ndocs=ndocs,
        mark_period=mp)
    bits, exc_base, exc_cap, n_words = B.mark_pack_geom(n, mp, ndocs, cap)
    timed("pack_mark_vals", B._pack_mark_vals, mark_vals, cap=cap,
          bits=bits, exc_base=exc_base, exc_cap=exc_cap, period=mp,
          n_words=n_words)

    timed("hist_stage(512-wide)", B._hist_stage, bwt_chars, n_seg=n_seg,
          seg=seg, alpha=ALPHA_SIZE)
    per_seg = B._hist_stage(bwt_chars, n_seg=n_seg, seg=seg,
                            alpha=ALPHA_SIZE)
    used = jnp.asarray(np.unique(alpha_np))
    per_seg_used = jnp.take(per_seg, used, axis=1)
    K = int(used.shape[0])
    timed("take used cols", lambda: jnp.take(per_seg, used, axis=1))
    timed("ckpt_stage", B._ckpt_stage, per_seg_used, compact=True)

    tiers = args.tiers.split(",")
    if "packed" in tiers:
        per_word, bits_p = B._pack_widths(K)
        timed("pack_stage", B._pack_stage, bwt_chars, used, n=n,
              n_seg=n_seg, seg=seg, per_word=per_word, bits=bits_p)
    if "vseg" in tiers or "vrle" in tiers:
        timed("codes2d_stage", B._codes2d_stage, bwt_chars, used,
              n=n, n_seg=n_seg, seg=seg)
        codes2d = B._codes2d_stage(bwt_chars, used, n=n, n_seg=n_seg,
                                   seg=seg)
    if "vseg" in tiers:
        timed("stats_from_hist", B._stats_from_hist, per_seg_used,
              SMAX=B.VSEG_SMAX)
        syms, nsym = B._stats_from_hist(per_seg_used, SMAX=B.VSEG_SMAX)
        timed("vseg_pack_uniform(w=5)", B._vseg_pack_uniform, codes2d,
              syms, nsym, seg=seg, w=5, SMAX=B.VSEG_SMAX, side=False)
    if "vrle" in tiers:
        syms64, nsym64 = B._stats_from_hist(per_seg_used,
                                            SMAX=B.VRLE_SMAX)
        timed("vrle_slot_stats", B._vrle_slot_stats, codes2d, syms64,
              nsym64, seg=seg, SMAX=B.VRLE_SMAX)
        slots = B._vrle_slot_stats(codes2d, syms64, nsym64, seg=seg,
                                   SMAX=B.VRLE_SMAX)
        A = int(max(np.percentile(np.asarray(slots), 90) // 4, 32))
        timed(f"vrle_pack_slots(A={A})", B._vrle_pack_slots, codes2d,
              syms64, nsym64, seg=seg, SMAX=B.VRLE_SMAX, A_words=A)

    # end-to-end packaging per tier (second rep = warm, compiles cached)
    for tier in tiers:
        for rep in ("cold", "warm"):
            jax.block_until_ready(pull)
            t0 = time.perf_counter()
            arrays, nm, ku = B.build_fm_arrays_device(
                text, sa, doc_starts, n=n, seg=seg, mark_period=mp,
                ndocs=ndocs, tier=tier, pull=pull, alpha=alpha_np)
            jax.block_until_ready(arrays)
            dt = time.perf_counter() - t0
            log(f"  {'TOTAL ' + tier + ' ' + rep:>28}: {dt*1e3:8.1f} ms "
                f"(sa+packaging = {n/2**20/(t_sa+dt):.1f} MiB/s)")


if __name__ == "__main__":
    main()
