"""Probe 3: REAL-kernel-shaped measurements for count and locate.

rank_probe2 showed standalone gathers carry a large fixed overhead and are
noisy; the scan-fused kernels pipeline far better.  So measure the actual
loops:

  C1. backward-search scan, current layout, B=32768, P=16
  C2. same, B=131072 (batch as the lever)
  C3. same, fused-row layout [SEG syms | mark words | ckpt] uint16 with the
      count path slicing rows[:, :SEG] (tests XLA's slice-into-gather)
  L1. locate walk (while_loop, 20 steps), current streams, B=65536
  L2. locate walk, fused-row one-gather variant, B=65536
  L3. L2 at B=262144
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
    K = 261
    MP = 20

    rng = np.random.default_rng(11)
    log(f"devices: {jax.devices()}  n={n} n_seg={n_seg}")

    bwt_np = rng.integers(0, 30, size=(n_seg, SEG)).astype(np.uint16)
    ckpt_np = rng.integers(0, 1 << 24, size=(n_seg, K)).astype(np.int32)
    C_np = np.sort(rng.integers(0, n, size=K + 1)).astype(np.int32)
    mb = (rng.random(size=(n_seg, SEG)) < 1.0 / MP)
    mark_bits_np = np.zeros((n_seg, SEG // 32), dtype=np.uint32)
    for b in range(32):
        mark_bits_np |= (mb[:, b::32].astype(np.uint32) << b)
    mark_ckpt_np = (np.arange(n_seg) * (SEG // MP)).astype(np.int32)
    mark_vals_np = rng.integers(0, n, size=(n // MP + SEG,)).astype(np.int32)

    bwt = jnp.asarray(bwt_np)
    ckpt = jnp.asarray(ckpt_np)
    C = jnp.asarray(C_np)
    mark_bits = jnp.asarray(mark_bits_np)
    mark_ckpt = jnp.asarray(mark_ckpt_np)
    mark_vals = jnp.asarray(mark_vals_np)

    # fused rows: [SEG syms u16 | 16 mark words as u16 pairs | ckpt u16x2]
    mb16 = mark_bits_np.view(np.uint16).reshape(n_seg, SEG // 16)
    mc16 = mark_ckpt_np.astype(np.int32).view(np.uint16).reshape(n_seg, 2)
    fused_np = np.concatenate([bwt_np, mb16, mc16], axis=1)
    fused = jnp.asarray(fused_np)          # [n_seg, SEG+18]

    def bench(name, fn, *args, iters=10):
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

    P = 16

    def occ_cur(cc, r):
        s = r // SEG
        off = r - s * SEG
        base = ckpt[s, cc]
        segd = jnp.take(bwt, s, axis=0).astype(jnp.int32)
        io = jax.lax.broadcasted_iota(jnp.int32, segd.shape, 1)
        within = jnp.sum((segd == cc[:, None]) & (io < off[:, None]),
                         axis=1).astype(jnp.int32)
        return base + within

    def count_cur(pats):
        B = pats.shape[0]
        first = jnp.zeros(B, jnp.int32)
        last = jnp.full(B, n, jnp.int32)

        def step(carry, col):
            f, l = carry
            nf = C[col] + occ_cur(col, f)
            nl = C[col] + occ_cur(col, l)
            return (nf, nl), None

        (f, l), _ = jax.lax.scan(step, (first, last), pats.T)
        return jnp.sum(l - f)

    def occ_fused(cc, r):
        s = r // SEG
        off = r - s * SEG
        base = ckpt[s, cc]
        segd = jnp.take(fused, s, axis=0)[:, :SEG].astype(jnp.int32)
        io = jax.lax.broadcasted_iota(jnp.int32, segd.shape, 1)
        within = jnp.sum((segd == cc[:, None]) & (io < off[:, None]),
                         axis=1).astype(jnp.int32)
        return base + within

    def count_fused(pats):
        B = pats.shape[0]
        first = jnp.zeros(B, jnp.int32)
        last = jnp.full(B, n, jnp.int32)

        def step(carry, col):
            f, l = carry
            nf = C[col] + occ_fused(col, f)
            nl = C[col] + occ_fused(col, l)
            return (nf, nl), None

        (f, l), _ = jax.lax.scan(step, (first, last), pats.T)
        return jnp.sum(l - f)

    # --- narrow-segment variants with compact (uint16 rel + L1) ckpts ---
    def make_narrow(SEGn):
        n_seg_n = n // SEGn
        bwt_n = jnp.asarray(
            bwt_np.reshape(n_seg_n, SEGn))
        rel = jnp.asarray(rng.integers(0, 1 << 14, size=(n_seg_n, K))
                          .astype(np.uint16))
        l1 = jnp.asarray(rng.integers(0, 1 << 24,
                                      size=(n_seg_n // 16 + 1, K))
                         .astype(np.int32))

        def occ_n(cc, r):
            s = r // SEGn
            off = r - s * SEGn
            base = l1[s // 16, cc] + rel[s, cc].astype(jnp.int32)
            segd = jnp.take(bwt_n, s, axis=0).astype(jnp.int32)
            io = jax.lax.broadcasted_iota(jnp.int32, segd.shape, 1)
            within = jnp.sum((segd == cc[:, None]) & (io < off[:, None]),
                             axis=1).astype(jnp.int32)
            return base + within

        def count_n(pats):
            B = pats.shape[0]
            first = jnp.zeros(B, jnp.int32)
            last = jnp.full(B, n, jnp.int32)

            def step(carry, col):
                f, l = carry
                nf = C[col] + occ_n(col, f)
                nl = C[col] + occ_n(col, l)
                return (nf, nl), None

            (f, l), _ = jax.lax.scan(step, (first, last), pats.T)
            return jnp.sum(l - f)

        return count_n

    count_128 = make_narrow(128)
    count_64 = make_narrow(64)

    for name, fn, B in (("C1 count cur B=32K", count_cur, 1 << 15),
                        ("C2 count cur B=128K", count_cur, 1 << 17),
                        ("C3 count fused-slice B=32K", count_fused, 1 << 15),
                        ("C4 count SEG=128 compact B=32K", count_128,
                         1 << 15),
                        ("C5 count SEG=64 compact B=32K", count_64, 1 << 15),
                        ("C6 count SEG=128 compact B=128K", count_128,
                         1 << 17)):
        pats = jnp.asarray(rng.integers(1, 30, size=(B, P))
                           .astype(np.int32))
        dt = bench(name, fn, pats)
        log(f"   -> {B * P / dt * 1e3 / 1e6:.1f}M steps/s")

    # ---- locate walks ----
    def locate_cur(rows):
        B = rows.shape[0]

        def cond(st):
            i, rows, granks, steps, done = st
            return (i <= MP) & jnp.any(~done)

        def body(st):
            i, r, granks, steps, done = st
            s = r // SEG
            off = r - s * SEG
            segd = jnp.take(bwt, s, axis=0).astype(jnp.int32)
            c = segd[jnp.arange(B), off]
            base = ckpt[s, c]
            io = jax.lax.broadcasted_iota(jnp.int32, segd.shape, 1)
            within = jnp.sum((segd == c[:, None]) & (io < off[:, None]),
                             axis=1).astype(jnp.int32)
            lf = C[c] + base + within
            words = jnp.take(mark_bits, s, axis=0)
            wl = off // 32
            word = words[jnp.arange(B), wl]
            bit = ((word >> (r % 32).astype(jnp.uint32)) & jnp.uint32(1)) != 0
            wi = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
            full = jnp.where(wi < wl[:, None], words, jnp.uint32(0))
            cnt = jnp.sum(jax.lax.population_count(full), axis=1).astype(
                jnp.int32)
            pm = (jnp.uint32(1) << (r % 32).astype(jnp.uint32)) - jnp.uint32(1)
            part = jax.lax.population_count(word & pm).astype(jnp.int32)
            grank = mark_ckpt[s] + cnt + part
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

    def locate_fused(rows):
        B = rows.shape[0]

        def cond(st):
            i, rows, granks, steps, done = st
            return (i <= MP) & jnp.any(~done)

        def body(st):
            i, r, granks, steps, done = st
            s = r // SEG
            off = r - s * SEG
            frow = jnp.take(fused, s, axis=0)           # [B, SEG+18]
            segd = frow[:, :SEG].astype(jnp.int32)
            c = segd[jnp.arange(B), off]
            base = ckpt[s, c]
            io = jax.lax.broadcasted_iota(jnp.int32, segd.shape, 1)
            within = jnp.sum((segd == c[:, None]) & (io < off[:, None]),
                             axis=1).astype(jnp.int32)
            lf = C[c] + base + within
            w16 = frow[:, SEG:SEG + 16].astype(jnp.uint32)
            words = w16[:, 0::2] | (w16[:, 1::2] << 16)  # [B, 8] u32
            wl = off // 32
            word = words[jnp.arange(B), wl]
            bit = ((word >> (r % 32).astype(jnp.uint32)) & jnp.uint32(1)) != 0
            wi = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
            full = jnp.where(wi < wl[:, None], words, jnp.uint32(0))
            cnt = jnp.sum(jax.lax.population_count(full), axis=1).astype(
                jnp.int32)
            pm = (jnp.uint32(1) << (r % 32).astype(jnp.uint32)) - jnp.uint32(1)
            part = jax.lax.population_count(word & pm).astype(jnp.int32)
            mck = (frow[:, SEG + 16].astype(jnp.int32)
                   | (frow[:, SEG + 17].astype(jnp.int32) << 16))
            grank = mck + cnt + part
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

    for name, fn, B in (("L1 locate cur B=64K", locate_cur, 1 << 16),
                        ("L2 locate fused B=64K", locate_fused, 1 << 16),
                        ("L3 locate fused B=256K", locate_fused, 1 << 18)):
        rows = jnp.asarray(rng.integers(0, n, size=B).astype(np.int32))
        dt = bench(name, fn, rows, iters=5)
        log(f"   -> {B / dt * 1e3 / 1e6:.2f}M rows/s (1/20 mark density)")


if __name__ == "__main__":
    main()
