"""Probe 3: packaging stages with TRUSTWORTHY timing.

block_until_ready does not reliably wait on the axon transport (bench.py
methodology note), so each timed loop chains a scalar through iterations
and ends with a host materialization; a no-op loop with the same chaining
is measured first and subtracted.
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    a_row0 = jnp.asarray(a_np)
    sa = jnp.asarray(rng.permutation(n).astype(np.int32))

    REPS = 10

    def timed(name, make_step, reps=REPS):
        """make_step returns f(acc) -> acc' (a scalar chain); time reps."""
        f = make_step()
        acc = f(jnp.int32(0))
        _ = int(acc)  # warm
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            acc = f(acc)
        _ = int(acc)
        dt = (time.perf_counter() - t0) / reps
        log(f"{name}: {dt*1e3:.2f} ms")
        return dt

    # no-op baseline (chain overhead)
    timed("noop chain", lambda: jax.jit(lambda acc: acc + 1))

    # one full n-read sum pass (consumption baseline)
    base0 = jnp.asarray(rng.integers(0, 100, size=n).astype(np.int32))

    def mk_sum():
        @jax.jit
        def f(acc):
            x = base0 + jnp.minimum(acc, 0)
            return acc + jnp.sum(x, dtype=jnp.int32)
        return f

    timed("sum-pass baseline (n reads)", mk_sum)

    # split_pull
    pull0 = jnp.asarray(
        (rng.integers(0, 512, size=n) | (a_np << 9)).astype(np.int32))

    def mk_split():
        @jax.jit
        def f(acc):
            pull = pull0 + jnp.minimum(acc, 0)  # depend on acc
            bwt, bwt_chars, a_row = BO._split_pull(pull, n=n, n_pad=n_pad)
            return acc + jnp.sum(a_row, dtype=jnp.int32) + jnp.sum(bwt_chars, dtype=jnp.int32) + jnp.sum(bwt.astype(jnp.int32), dtype=jnp.int32)
        return f

    timed("split_pull", mk_split)

    # occ stage (full tier)
    bwt_chars0 = jnp.asarray(rng.integers(0, 80, size=n).astype(np.int32))

    def mk_occ():
        @jax.jit
        def f(acc):
            bc = bwt_chars0 + jnp.minimum(acc, 0)
            C, occ_ckpt, occ_l1 = BO._occ_stage(
                bc, n=n, n_seg=n_seg, seg=seg)
            return acc + C[1] + jnp.sum(occ_ckpt, dtype=jnp.int32) + occ_l1[0, 0]
        return f

    timed("occ_stage", mk_occ)

    # hist alone at CH variants
    for CH in (2048, 8192):
        nchunks = -(-n_seg // CH)

        def mk_hist(CH=CH, nchunks=nchunks):
            @jax.jit
            def f(acc):
                bc = bwt_chars0 + jnp.minimum(acc, 0)
                b2 = jnp.full((nchunks * CH * seg,), -1, jnp.int32)
                b2 = jax.lax.dynamic_update_slice(b2, bc, (0,))
                h = BO._hist_core(b2.reshape(nchunks, CH, seg), 261)[:n_seg]
                return acc + jnp.sum(h, dtype=jnp.int32)
            return f

        timed(f"hist CH={CH}", mk_hist, reps=5)

    # marks_finish whole
    def mk_marks():
        @jax.jit
        def f(acc):
            a_row = a_row0 + jnp.minimum(acc, 0)
            mb, mc, mv, nm, dsr = BO._marks_finish(
                sa, a_row, n=n, n_pad=n_pad, seg=seg, cap=cap, ndocs=ndocs,
                mark_period=mark_period)
            return acc + nm + jnp.sum(mv, dtype=jnp.int32) + jnp.sum(mc, dtype=jnp.int32) + jnp.sum(dsr, dtype=jnp.int32) + jnp.sum(mb, dtype=jnp.uint32).astype(jnp.int32)
        return f

    timed("marks_finish", mk_marks)

    # marks pieces: bitmap+ckpt only
    def mk_bitmap():
        @jax.jit
        def f(acc):
            a_row = a_row0 + jnp.minimum(acc, 0)
            marked_sa = (a_row & 1) != 0
            marked_row = jnp.concatenate(
                [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)])
            bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
            weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
            words = jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)
            return acc + jnp.sum(words, dtype=jnp.uint32).astype(jnp.int32)
        return f

    timed("  bitmap pack", mk_bitmap)

    # rank_select + gathers
    @jax.jit
    def prep(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)])
        bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
        words = jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)
        return words.reshape(n_seg, seg // 32)

    words2d = prep(a_row0)
    n_marks = jnp.sum(jax.lax.population_count(words2d))

    def mk_select():
        @jax.jit
        def f(acc):
            w = words2d + jnp.minimum(acc, 0).astype(jnp.uint32)
            valid, rowc = BO._mark_rank_select(w, n_marks, cap, n)
            return acc + jnp.sum(rowc, dtype=jnp.int32) + jnp.sum(valid, dtype=jnp.int32)
        return f

    timed("  rank_select", mk_select)

    def mk_gather():
        @jax.jit
        def f(acc):
            rows = (jnp.arange(cap, dtype=jnp.int32) * 20 + jnp.maximum(acc, 0) % 3) % n
            sa_tag = jnp.stack([sa, a_row0 >> 1], axis=1)
            picked = sa_tag[rows]
            return acc + jnp.sum(picked, dtype=jnp.int32)
        return f

    timed("  sa_tag stack+gather", mk_gather)


if __name__ == "__main__":
    main()
