"""Probe: rank (Occ) kernel design space for the >=40M steps/s target.

Hypothesis (VERDICT weak #3): the count kernel is gather-ISSUE-bound, so
the lever is the number of gather ROWS per backward step, not bytes.
Current _occ_dense costs per lane per bound: 1 ckpt row + 1 segment row
(+ C LUT).  A fused layout F[s] = [packed symbols | C[c]+ckpt[s,c]] serves
a whole rank from ONE row gather.

Measures (n=16.8M rows, n_seg=65536, SEG=256, K=261 and K=32):
  A. baseline pair-rank step: 2x (ckpt gather + seg gather + C LUT)
  B. fused rows int32[n_seg, SEG + K]: 2x one-row gather
  C. fused packed rows int32[n_seg, SEG//2 + K]: symbols 2/word
  D. one [2B] fused gather vs two [B] gathers
  E. duplicate rows vs random rows (hardware dedupe?)
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
    B = 1 << 15
    K = 261

    rng = np.random.default_rng(3)
    log(f"devices: {jax.devices()}  n_seg={n_seg} SEG={SEG} B={B}")

    bwt = jnp.asarray(rng.integers(0, K, size=(n_seg, SEG), dtype=np.int32)
                      .astype(np.uint16))
    ckpt = jnp.asarray(
        rng.integers(0, 1 << 24, size=(n_seg, K), dtype=np.int32))
    C = jnp.asarray(np.sort(rng.integers(0, 1 << 24, size=K + 1)
                            .astype(np.int32)))
    # fused: [SEG symbols as int32 | K ckpt words]
    fused = jnp.concatenate(
        [bwt.astype(jnp.int32), ckpt], axis=1)          # [n_seg, SEG+K]
    # fused packed: 2 uint16 symbols per int32 word
    b2 = np.asarray(bwt).astype(np.uint32).reshape(n_seg, SEG // 2, 2)
    packed_syms = jnp.asarray((b2[:, :, 0] | (b2[:, :, 1] << 16))
                              .astype(np.int32))
    fusedp = jnp.concatenate([packed_syms, ckpt], axis=1)  # [n_seg, 128+K]

    r1 = jnp.asarray(rng.integers(0, n_seg * SEG, size=B, dtype=np.int32))
    r2 = jnp.asarray(rng.integers(0, n_seg * SEG, size=B, dtype=np.int32))
    c = jnp.asarray(rng.integers(0, K, size=B, dtype=np.int32))

    def bench(name, fn, *args, iters=30):
        f = jax.jit(fn)
        acc = f(jnp.int32(0), *args)
        _ = int(acc)
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = f(acc, *args)
        _ = int(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(f"{name}: {dt:.2f} ms")
        return dt

    iota = jax.lax.broadcasted_iota(jnp.int32, (B, SEG), 1)

    def occ_base(r, cc):
        s = r // SEG
        off = r - s * SEG
        base = ckpt[s, cc]
        segd = jnp.take(bwt, s, axis=0).astype(jnp.int32)
        within = jnp.sum((segd == cc[:, None]) & (iota < off[:, None]),
                         axis=1).astype(jnp.int32)
        return C[cc] + base + within

    def step_a(acc, r1, r2, cc):
        return acc + jnp.sum(occ_base(r1, cc)) + jnp.sum(occ_base(r2, cc))

    def occ_fused(r, cc):
        s = r // SEG
        off = r - s * SEG
        rows = jnp.take(fused, s, axis=0)               # [B, SEG+K]
        segd = rows[:, :SEG]
        base = rows[jnp.arange(B), SEG + cc]
        within = jnp.sum((segd == cc[:, None]) & (iota < off[:, None]),
                         axis=1).astype(jnp.int32)
        return base + within

    def step_b(acc, r1, r2, cc):
        return acc + jnp.sum(occ_fused(r1, cc)) + jnp.sum(occ_fused(r2, cc))

    iota2 = jax.lax.broadcasted_iota(jnp.int32, (B, SEG // 2, 2), 1) * 2 + \
        jax.lax.broadcasted_iota(jnp.int32, (B, SEG // 2, 2), 2)

    def occ_fusedp(r, cc):
        s = r // SEG
        off = r - s * SEG
        rows = jnp.take(fusedp, s, axis=0)              # [B, 128+K]
        w = rows[:, :SEG // 2].astype(jnp.uint32)
        lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
        hi = (w >> 16).astype(jnp.int32)
        sym = jnp.stack([lo, hi], axis=2)               # [B, 128, 2]
        base = rows[jnp.arange(B), SEG // 2 + cc]
        within = jnp.sum(
            (sym == cc[:, None, None]) & (iota2 < off[:, None, None]),
            axis=(1, 2)).astype(jnp.int32)
        return base + within

    def step_c(acc, r1, r2, cc):
        return acc + jnp.sum(occ_fusedp(r1, cc)) + jnp.sum(occ_fusedp(r2, cc))

    def step_d(acc, r1, r2, cc):
        r = jnp.concatenate([r1, r2])
        cc2 = jnp.concatenate([cc, cc])
        s = r // SEG
        off = r - s * SEG
        rows = jnp.take(fused, s, axis=0)               # [2B, SEG+K]
        segd = rows[:, :SEG]
        io = jax.lax.broadcasted_iota(jnp.int32, (2 * B, SEG), 1)
        base = rows[jnp.arange(2 * B), SEG + cc2]
        within = jnp.sum((segd == cc2[:, None]) & (io < off[:, None]),
                         axis=1).astype(jnp.int32)
        return acc + jnp.sum(base + within)

    def gather_only(acc, s):
        rows = jnp.take(fused, s, axis=0)
        return acc + jnp.sum(rows[:, 0])

    s_rand = r1 // SEG
    s_dup = jnp.broadcast_to(s_rand[:B // 16], (16, B // 16)).reshape(B)
    s_seq = jnp.arange(B, dtype=jnp.int32) % n_seg

    a = bench("A baseline 2x(ckpt+seg+C)", step_a, r1, r2, c)
    b = bench("B fused 2x one-row", step_b, r1, r2, c)
    cns = bench("C fused-packed 2x one-row", step_c, r1, r2, c)
    d = bench("D fused one [2B] gather", step_d, r1, r2, c)
    bench("E gather-only fused random", gather_only, s_rand)
    bench("E gather-only fused dup16", gather_only, s_dup)
    bench("E gather-only fused seq", gather_only, s_seq)
    # small-alphabet variant: K=32 fused packed
    log(f"steps/s equivalent: A {B/a*1e3/1e6:.1f}M  B {B/b*1e3/1e6:.1f}M  "
        f"C {B/cns*1e3/1e6:.1f}M  D {B/d*1e3/1e6:.1f}M")


if __name__ == "__main__":
    main()
