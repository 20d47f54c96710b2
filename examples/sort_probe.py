"""Measure the TPU cost floor of the build's primitive ops at n=16.8M.

One process (the remote-compile tunnel dislikes process churn).  Timing
uses chained data dependencies + a scalar device_get per measurement —
block_until_ready alone does not flush the axon tunnel.  All device arrays
are passed as jit ARGUMENTS (closed-over arrays get inlined into the
remote-compile request and blow its size limit).
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
    log(f"devices: {jax.devices()}  n={n}")
    rng = np.random.default_rng(7)
    keys = [jnp.asarray(rng.integers(0, 1 << 27, size=n, dtype=np.int32))
            for _ in range(3)]
    idx = jnp.arange(n, dtype=jnp.int32)
    payload = jnp.asarray(rng.integers(0, 1 << 27, size=n, dtype=np.int32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    def bench(name, step, *args, iters=4):
        acc = jnp.int32(0)
        acc = step(acc, *args)
        _ = int(acc)  # warm + compile
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = step(acc, *args)
        _ = int(acc)
        log(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms")

    from functools import partial
    for nops, nkeys in ((2, 1), (3, 2), (4, 3), (5, 3), (6, 3)):
        ops = tuple(keys[:nkeys]) + (idx,) * (nops - nkeys)

        @partial(jax.jit, static_argnums=(1,))
        def f(acc, nk, *ops):
            o0 = ops[0] + jnp.minimum(acc, 0)
            out = jax.lax.sort((o0,) + ops[1:], num_keys=nk)
            return acc + out[-1][0] + out[0][-1]

        bench(f"lax.sort {nops} operands num_keys={nkeys}", f, nkeys, *ops)

    @jax.jit
    def g(acc, payload, perm):
        p = (perm + jnp.minimum(acc, 0)) % n
        out = jnp.take(payload, p, axis=0)
        return acc + out[0] + out[-1]

    bench("n-row random gather", g, payload, perm)

    @jax.jit
    def g2(acc, payload, k0, perm):
        p = (perm + jnp.minimum(acc, 0)) % n
        a = jnp.take(payload, p, axis=0)
        b = jnp.take(k0, p, axis=0)
        return acc + a[0] + b[-1]

    bench("2x n-row random gather (pipelined)", g2, payload, keys[0], perm)

    @jax.jit
    def s(acc, payload, perm):
        p = (perm + jnp.minimum(acc, 0)) % n
        out = jnp.zeros((n,), jnp.int32).at[p].set(payload, mode="drop")
        return acc + out[0] + out[-1]

    bench("n-row random scatter-set", s, payload, perm)

    @jax.jit
    def si(acc, payload, idx):
        p = (idx + jnp.minimum(acc, 0)) % n
        out = jnp.zeros((n,), jnp.int32).at[p].set(
            payload, mode="drop", indices_are_sorted=True)
        return acc + out[0] + out[-1]

    bench("n-row sorted scatter-set", si, payload, idx)

    @jax.jit
    def c(acc, payload):
        out = jnp.cumsum(payload + jnp.minimum(acc, 0))
        return acc + out[-1]

    bench("n cumsum", c, payload)

    @jax.jit
    def cm(acc, payload):
        out = jax.lax.cummax(payload + jnp.minimum(acc, 0))
        return acc + out[-1]

    bench("n cummax", cm, payload)


if __name__ == "__main__":
    main()
