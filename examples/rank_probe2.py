"""Probe 2: raw random-row gather cost vs row size, + lean occ variants.

rank_probe.py showed the fused (ckpt-in-row) layouts LOSE: 2KB rows cost
1.4x the 512B baseline, so gathers are neither purely issue-bound nor
bandwidth-bound — the row-size cost curve decides the layout.  Measures:

  G. gather-only: uint16 rows of 32/64/128/256/512 symbols wide
     (64B..1KB), random segment ids, B=32768
  G'. 512-sym rows with duplicate-heavy and sequential ids (cache effect)
  O. occ with SEG=128 (half the segment read, denser checkpoints)
  P. occ on the packed tier layout (uint32 words, 6x 5-bit codes/word,
     broadcast-shift unpack — no stack/reshape)
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    B = 1 << 15
    n_rows = 1 << 24
    K = 32

    rng = np.random.default_rng(5)
    log(f"devices: {jax.devices()}  B={B}")

    def bench(name, fn, *args, iters=20):
        f = jax.jit(fn)
        acc = f(jnp.int32(0), *args)
        _ = int(acc)
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = f(acc, *args)
        _ = int(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(f"{name}: {dt:.3f} ms  ({dt * 1e6 / B:.1f} ns/row)")
        return dt

    # --- G: gather-only cost vs row width ---
    for width in (32, 64, 128, 256, 512):
        n_seg = n_rows // width
        arr = jnp.asarray(
            rng.integers(0, K, size=(n_seg, width), dtype=np.int32)
            .astype(np.uint16))
        s = jnp.asarray(rng.integers(0, n_seg, size=B, dtype=np.int32))

        def g(acc, s, arr=arr):
            rows = jnp.take(arr, s, axis=0)
            return acc + jnp.sum(rows.astype(jnp.int32)[:, 0])

        bench(f"G gather u16[{width}] ({2*width}B)", g, s)

    # --- G': duplicates / sequential on 256-wide ---
    n_seg = n_rows // 256
    arr = jnp.asarray(rng.integers(0, K, size=(n_seg, 256), dtype=np.int32)
                      .astype(np.uint16))
    s_rand = jnp.asarray(rng.integers(0, n_seg, size=B, dtype=np.int32))
    s_dup = jnp.broadcast_to(s_rand[:B // 16], (16, B // 16)).reshape(B)
    s_seq = jnp.arange(B, dtype=jnp.int32) % n_seg

    def g256(acc, s):
        rows = jnp.take(arr, s, axis=0)
        return acc + jnp.sum(rows.astype(jnp.int32)[:, 0])

    bench("G' u16[256] random", g256, s_rand)
    bench("G' u16[256] dup16", g256, s_dup)
    bench("G' u16[256] sequential", g256, s_seq)

    # --- O: occ at SEG=128 vs 256 (both with separate ckpt gather) ---
    for SEG in (128, 256):
        n_seg = n_rows // SEG
        bwt = jnp.asarray(
            rng.integers(0, K, size=(n_seg, SEG), dtype=np.int32)
            .astype(np.uint16))
        ckpt = jnp.asarray(
            rng.integers(0, 1 << 24, size=(n_seg, 261), dtype=np.int32))
        r = jnp.asarray(
            rng.integers(0, n_rows, size=B, dtype=np.int32))
        c = jnp.asarray(rng.integers(0, K, size=B, dtype=np.int32))
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, SEG), 1)

        def occ(acc, r, cc, bwt=bwt, ckpt=ckpt, SEG=SEG, iota=iota):
            s = r // SEG
            off = r - s * SEG
            base = ckpt[s, cc]
            segd = jnp.take(bwt, s, axis=0).astype(jnp.int32)
            within = jnp.sum(
                (segd == cc[:, None]) & (iota < off[:, None]), axis=1
            ).astype(jnp.int32)
            return acc + jnp.sum(base + within)

        bench(f"O occ SEG={SEG} u16", occ, r, c)

    # --- P: occ on packed words (5-bit codes, 6/word, 256 rows/seg) ---
    SEG = 256
    per_word, bits = 6, 5
    W = -(-SEG // per_word)                    # 43 words = 172B
    n_seg = n_rows // SEG
    codes = rng.integers(0, K, size=(n_seg, W * per_word), dtype=np.int64)
    packed = np.zeros((n_seg, W), dtype=np.uint32)
    for t in range(per_word):
        packed |= (codes[:, t::per_word][:, :W] << (t * bits)).astype(
            np.uint32)
    packedj = jnp.asarray(packed)
    ckpt = jnp.asarray(
        rng.integers(0, 1 << 24, size=(n_seg, 261), dtype=np.int32))
    r = jnp.asarray(rng.integers(0, n_rows, size=B, dtype=np.int32))
    c = jnp.asarray(rng.integers(0, K, size=B, dtype=np.int32))
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits)[None, None, :]
    mask = jnp.uint32((1 << bits) - 1)
    iota3 = (
        jax.lax.broadcasted_iota(jnp.int32, (B, W, per_word), 1) * per_word
        + jax.lax.broadcasted_iota(jnp.int32, (B, W, per_word), 2)
    )

    def occp(acc, r, cc):
        s = r // SEG
        off = r - s * SEG
        base = ckpt[s, cc]
        words = jnp.take(packedj, s, axis=0)            # [B, W] u32
        vals = ((words[:, :, None] >> shifts) & mask).astype(jnp.int32)
        within = jnp.sum(
            (vals == cc[:, None, None]) & (iota3 < off[:, None, None]),
            axis=(1, 2)).astype(jnp.int32)
        return acc + jnp.sum(base + within)

    bench("P occ packed 5-bit (172B)", occp, r, c)


if __name__ == "__main__":
    main()
