"""Probe 2: LUT gather, key-count scaling, byte-key sorts (n=16.8M)."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    n = 1 << 24
    log(f"devices: {jax.devices()}  n={n}")
    rng = np.random.default_rng(7)
    text = jnp.asarray(rng.integers(0, 261, size=n, dtype=np.int32))
    lut = jnp.asarray(rng.integers(0, 100, size=512, dtype=np.int32))
    keys = [jnp.asarray(rng.integers(0, 1 << 27, size=n, dtype=np.int32))
            for _ in range(5)]
    bytekey = jnp.asarray(rng.integers(0, 2, size=n, dtype=np.uint8))
    idx = jnp.arange(n, dtype=jnp.int32)

    def bench(name, step, *args, iters=4):
        acc = jnp.int32(0)
        acc = step(acc, *args)
        _ = int(acc)
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = step(acc, *args)
        _ = int(acc)
        log(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")

    @jax.jit
    def tl(acc, lut, text):
        t = (text + jnp.minimum(acc, 0)) % 512
        out = jnp.take(lut, t, axis=0)
        return acc + out[0] + out[-1]

    bench("take(lut512, text) n rows", tl, lut, text)

    @jax.jit
    def cmpsum(acc, text):
        t = text + jnp.minimum(acc, 0)
        # searchsorted-free dense remap: sum of (t >= used_code) over K=100
        used = jnp.arange(100, dtype=jnp.int32) * 2
        out = jnp.sum(
            (t[:, None] >= used[None, :]).astype(jnp.int32), axis=1
        )
        return acc + out[0] + out[-1]

    bench("compare-sum remap K=100", cmpsum, text)

    for nkeys in (4, 5):
        ops = tuple(keys[:nkeys]) + (idx, idx)

        @partial(jax.jit, static_argnums=(1,))
        def f(acc, nk, *ops):
            o0 = ops[0] + jnp.minimum(acc, 0)
            out = jax.lax.sort((o0,) + ops[1:], num_keys=nk)
            return acc + out[-1][0] + out[0][-1]

        bench(f"lax.sort {nkeys+2} operands num_keys={nkeys}", f, nkeys, *ops)

    @jax.jit
    def bk(acc, bytekey, idx):
        k = bytekey ^ jnp.minimum(acc, 0).astype(jnp.uint8)
        out = jax.lax.sort((k, idx), num_keys=1)
        return acc + out[1][0] + out[1][-1]

    bench("lax.sort byte key + i32 payload", bk, bytekey, idx)

    @jax.jit
    def bk32(acc, bytekey, idx):
        k = bytekey.astype(jnp.int32) + jnp.minimum(acc, 0)
        out = jax.lax.sort((k, idx), num_keys=1)
        return acc + out[1][0] + out[1][-1]

    bench("lax.sort i32 0/1 key + i32 payload", bk32, bytekey, idx)

    @jax.jit
    def bk2(acc, bytekey, idx):
        k = bytekey.astype(jnp.int32) + jnp.minimum(acc, 0)
        out = jax.lax.sort((k, idx, idx, idx), num_keys=1)
        return acc + out[1][0] + out[1][-1]

    bench("lax.sort 0/1 key + 3 payloads", bk2, bytekey, idx)

    # roll cost (key prep)
    @jax.jit
    def rl(acc, x):
        y = jnp.roll(x + jnp.minimum(acc, 0), -3)
        return acc + y[0] + y[-1]

    bench("single roll n", rl, keys[0])


if __name__ == "__main__":
    main()
