"""Probe: decompose _marks_finish cost at 96 MiB (566 ms steady)."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    n = 96 * (1 << 20)
    seg = 256
    n_seg = n // seg + 1
    n_pad = n_seg * seg
    cap = -(-(n // 20 + 2 * 1536 + 2) // 128) * 128
    W = seg // 32
    rng = np.random.default_rng(3)
    log(f"n={n} n_seg={n_seg} cap={cap}")

    a_row = jnp.asarray(
        ((rng.random(n) < 0.05).astype(np.int32))
        | (rng.integers(0, 2, size=n, dtype=np.int32) << 1))
    sa = jnp.asarray(rng.permutation(n).astype(np.int32))

    def bench(name, fn, *args, iters=5):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        log(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")
        return out

    def p1(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)])
        bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
        mark_bits = jnp.sum(bits * weights, axis=1, dtype=jnp.uint32).reshape(
            n_seg, W)
        per_seg = marked_row.reshape(n_seg, seg).sum(axis=1).astype(jnp.int32)
        ckpt = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(per_seg[:-1])]
        ).astype(jnp.int32)
        return mark_bits, ckpt, jnp.sum(per_seg)

    mark_bits, mark_ckpt, n_marks = bench("P1 bitmap+ckpt", p1, a_row)

    def p2(mark_ckpt):
        seg_at = (
            jnp.zeros((cap + 1,), jnp.int32)
            .at[jnp.minimum(mark_ckpt, cap)]
            .max(jnp.arange(n_seg, dtype=jnp.int32), mode="drop")[:cap]
        )
        return jax.lax.cummax(seg_at)

    s = bench("P2 seg_of_g scatter+cummax", p2, mark_ckpt)

    def p3(mark_bits, mark_ckpt, s):
        g = jnp.arange(cap, dtype=jnp.int32)
        j = g - mark_ckpt[s]
        words = jnp.take(mark_bits, s, axis=0)
        pc = jax.lax.population_count(words).astype(jnp.int32)
        cpc = jnp.cumsum(pc, axis=1)
        iw = jax.lax.broadcasted_iota(jnp.int32, (cap, W), 1)
        w = jnp.min(jnp.where(cpc > j[:, None], iw, W), axis=1)
        wc = jnp.minimum(w, W - 1)
        lanes = jnp.arange(cap)
        before = cpc[lanes, wc] - pc[lanes, wc]
        word = words[lanes, wc]
        rem = j - before
        pos = jnp.zeros((cap,), jnp.int32)
        cur = word
        for half in (16, 8, 4, 2, 1):
            mask = jnp.uint32((1 << half) - 1)
            lowc = jax.lax.population_count(cur & mask).astype(jnp.int32)
            go_hi = rem >= lowc
            rem = jnp.where(go_hi, rem - lowc, rem)
            pos = pos + jnp.where(go_hi, half, 0)
            cur = jnp.where(go_hi, cur >> jnp.uint32(half), cur & mask)
        return s * seg + wc * 32 + pos, (g < n_marks) & (w < W)

    (row, valid) = bench("P3 word select", p3, mark_bits, mark_ckpt, s)

    def p4(sa, row, valid):
        rowc = jnp.minimum(jnp.where(valid, row, 0), n - 1)
        return jnp.where(valid, sa[rowc], -1)

    bench("P4 sa gather", p4, sa, row, valid)


if __name__ == "__main__":
    main()
