"""Probe 5: locate walk with the mark bit EMBEDDED in the BWT codes.

bwt codes use 9 of 16 bits; storing the row's mark flag at bit 9 lets the
locate walk answer is-marked AND the in-segment mark rank from the segment
row it already gathers (one compare-reduce on the same registers),
dropping the mark-bitmap gather stream.  mark_ckpt [B]-scalar gather
stays.  Compares against the current 3-stream walk (probe 4 L1: 81 ms).
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    SEG = 256
    n_seg = 1 << 16
    n = n_seg * SEG
    MP = 20

    rng = np.random.default_rng(11)
    log(f"devices: {jax.devices()}  n={n}")

    bwt_np = rng.integers(0, 30, size=(n_seg, SEG)).astype(np.uint16)
    mb = (rng.random(size=(n_seg, SEG)) < 1.0 / MP)
    bwt_emb_np = (bwt_np | (mb.astype(np.uint16) << 9))
    ckpt_np = rng.integers(0, 1 << 24, size=(n_seg, 261)).astype(np.int32)
    C_np = np.sort(rng.integers(0, n, size=262)).astype(np.int32)
    mark_ckpt_np = (np.arange(n_seg) * (SEG // MP)).astype(np.int32)
    mark_vals_np = rng.integers(0, n, size=(n // MP + SEG,)).astype(np.int32)

    bwt_emb = jnp.asarray(bwt_emb_np)
    ckpt = jnp.asarray(ckpt_np)
    C = jnp.asarray(C_np)
    mark_ckpt = jnp.asarray(mark_ckpt_np)
    mark_vals = jnp.asarray(mark_vals_np)

    def bench(name, fn, *args, iters=6):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(f"{name}: {dt:.2f} ms")
        return dt

    def locate_emb(rows):
        B = rows.shape[0]

        def cond(st):
            i, rows, granks, steps, done = st
            return (i <= MP) & jnp.any(~done)

        def body(st):
            i, r, granks, steps, done = st
            s = r // SEG
            off = r - s * SEG
            raw = jnp.take(bwt_emb, s, axis=0).astype(jnp.int32)  # [B, SEG]
            segd = raw & 511
            mbit = raw >> 9
            c = segd[jnp.arange(B), off]
            base = ckpt[s, c]
            io = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
            before = io < off[:, None]
            within = jnp.sum((segd == c[:, None]) & before,
                             axis=1).astype(jnp.int32)
            lf = C[c] + base + within
            bit = mbit[jnp.arange(B), off] != 0
            mwithin = jnp.sum(jnp.where(before, mbit, 0),
                              axis=1).astype(jnp.int32)
            grank = mark_ckpt[s] + mwithin
            is_m = bit & (~done)
            granks = jnp.where(is_m, grank, granks)
            steps = jnp.where(is_m, i, steps)
            done = done | is_m
            r = jnp.where(done, r, lf % n)
            return i + 1, r, granks, steps, done

        st = (jnp.int32(0), rows, jnp.zeros(B, jnp.int32),
              jnp.full(B, -1, jnp.int32), jnp.zeros(B, bool))
        _, _, granks, steps, done = jax.lax.while_loop(cond, body, st)
        return jnp.sum(mark_vals[granks] + steps)

    for B in (1 << 16, 1 << 15):
        rows = jnp.asarray(rng.integers(0, n, size=B).astype(np.int32))
        dt = bench(f"L-emb locate B={B}", locate_emb, rows)
        log(f"   -> {B / dt * 1e3 / 1e6:.2f}M rows/s")


if __name__ == "__main__":
    main()
