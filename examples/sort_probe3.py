"""Probe: initial-sort key-count tradeoff (2 vs 3 int32 keys, 2 payloads).

A 2-key initial sort orders 2*per_key symbols instead of 3*per_key; if it
is ~25% cheaper the extra direct-extension round on the (slightly larger)
residual pays for itself.  n=2^24; ratio extrapolates.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << 24
    rng = np.random.default_rng(9)
    log(f"devices: {jax.devices()}  n={n}")
    ks = [jnp.asarray(rng.integers(0, 1 << 30, size=n, dtype=np.int32))
          for _ in range(3)]
    idx = jnp.arange(n, dtype=jnp.int32)
    pay = jnp.asarray(rng.integers(0, 1 << 30, size=n, dtype=np.int32))

    def bench(name, fn, *args, iters=6):
        f = jax.jit(fn)
        out = f(jnp.int32(0), *args)
        _ = int(out)
        t0 = time.perf_counter()
        acc = jnp.int32(0)
        for _ in range(iters):
            acc = f(acc, *args)
        _ = int(acc)
        log(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")

    def s2(acc, k0, k1, k2, idx, pay):
        o = jax.lax.sort((k0, k1, idx + acc, pay), num_keys=2)
        return acc + o[2][0]

    def s3(acc, k0, k1, k2, idx, pay):
        o = jax.lax.sort((k0, k1, k2, idx + acc, pay), num_keys=3)
        return acc + o[3][0]

    bench("sort 2 keys + 2 payloads", s2, ks[0], ks[1], ks[2], idx, pay)
    bench("sort 3 keys + 2 payloads", s3, ks[0], ks[1], ks[2], idx, pay)


if __name__ == "__main__":
    main()
