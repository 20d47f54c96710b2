"""Probe 2: per-seg reduce, MXU histogram chunking, rank_select internals."""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, reps=10):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    log(f"{name}: {dt*1e3:.2f} ms")
    return out, dt


def main():
    import jax
    import jax.numpy as jnp

    from femto_tpu.ops import build_ops as BO

    n = int(float(os.environ.get("BENCH_MB", "16")) * (1 << 20))
    seg = 256
    n_seg = n // seg + 1
    n_pad = n_seg * seg
    mark_period = 20
    ndocs = 256
    cap = BO.mark_cap(n, ndocs, mark_period, seg)
    log(f"device: {jax.devices()[0]}, n={n} cap={cap}")

    rng = np.random.default_rng(0)
    a_np = (rng.random(n) < 1.0 / mark_period).astype(np.int32)
    a_row = jnp.asarray(a_np)

    @jax.jit
    def pack_current(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)])
        bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
        return jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)

    (words,), _ = timeit("pack", lambda: (pack_current(a_row),))

    @jax.jit
    def perseg_bool(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)])
        return marked_row.reshape(n_pad // seg, seg).sum(axis=1).astype(jnp.int32)

    timeit("perseg bool-sum", lambda: (perseg_bool(a_row),))

    @jax.jit
    def perseg_pop(words):
        return jnp.sum(
            jax.lax.population_count(words.reshape(n_pad // seg, seg // 32)),
            axis=1, dtype=jnp.int32)

    (per_seg,), _ = timeit("perseg popcount(words)", lambda: (perseg_pop(words),))
    n_marks = jnp.sum(per_seg)

    # --- rank_select internals ---
    words2d = words.reshape(n_pad // seg, seg // 32)

    @jax.jit
    def rs_whole(words2d, n_marks):
        return BO._mark_rank_select(words2d, n_marks, cap, n)

    timeit("rank_select whole", lambda: rs_whole(words2d, n_marks), reps=5)

    @jax.jit
    def rs_ckpt(words2d):
        words_flat = words2d.reshape(-1)
        wpc = jax.lax.population_count(words_flat).astype(jnp.int32)
        return jnp.cumsum(wpc) - wpc

    (word_ckpt,), _ = timeit("  popcount+cumsum (n/32)", lambda: (rs_ckpt(words2d),))

    @jax.jit
    def rs_scatter(word_ckpt):
        nw = word_ckpt.shape[0]
        return (
            jnp.zeros((cap + 1,), jnp.int32)
            .at[jnp.minimum(word_ckpt, cap)]
            .max(jnp.arange(nw, dtype=jnp.int32), mode="drop")[:cap]
        )

    (w_at,), _ = timeit("  scatter-max (n/32 rows)", lambda: (rs_scatter(word_ckpt),))

    @jax.jit
    def rs_rest(w_at, word_ckpt, words2d, n_marks):
        words_flat = words2d.reshape(-1)
        w = jax.lax.cummax(w_at)
        g = jnp.arange(cap, dtype=jnp.int32)
        rem = g - word_ckpt[w]
        cur = words_flat[w]
        pos = jnp.zeros((cap,), jnp.int32)
        for half in (16, 8, 4, 2, 1):
            mask = jnp.uint32((1 << half) - 1)
            lowc = jax.lax.population_count(cur & mask).astype(jnp.int32)
            go_hi = rem >= lowc
            rem = jnp.where(go_hi, rem - lowc, rem)
            pos = pos + jnp.where(go_hi, half, 0)
            cur = jnp.where(go_hi, cur >> jnp.uint32(half), cur & mask)
        valid = g < n_marks
        row = w * 32 + pos
        rowc = jnp.minimum(jnp.where(valid, row, 0), n - 1)
        return valid, rowc

    timeit("  cummax+select (cap rows)", lambda: rs_rest(w_at, word_ckpt, words2d, n_marks))

    # alternative scatter: searchsorted over word_ckpt (log2(n/32) gathers
    # over cap lanes)
    @jax.jit
    def rs_searchsorted(word_ckpt, n_marks):
        g = jnp.arange(cap, dtype=jnp.int32)
        w = (
            jnp.searchsorted(word_ckpt, g, side="right").astype(jnp.int32) - 1
        )
        return w

    timeit("  alt: searchsorted (cap lanes)", lambda: (rs_searchsorted(word_ckpt, n_marks),))

    # --- MXU histogram chunk sizes ---
    from femto_tpu.ops.build_ops import _hist_core

    bwt_chars = jnp.asarray(rng.integers(0, 80, size=n).astype(np.int32))
    for CH in (512, 2048, 8192):
        nchunks = -(-n_seg // CH)

        @jax.jit
        def hist(bc, CH=CH, nchunks=nchunks):
            b2 = jnp.full((nchunks * CH * seg,), -1, jnp.int32)
            b2 = jax.lax.dynamic_update_slice(b2, bc, (0,))
            return _hist_core(b2.reshape(nchunks, CH, seg), 261)[:n_seg]

        timeit(f"hist CH={CH} ({nchunks} map steps)",
               lambda h=hist: (h(bwt_chars),), reps=5)


if __name__ == "__main__":
    main()
