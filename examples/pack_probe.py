"""Probe packaging-stage variants on the real TPU.

Targets the two measured hot spots of index packaging (dispatch_probe):
  * mark-bitmap packing (bool[n] -> uint32 words): 24.9 ms at n=16.8M,
    ~50x the bandwidth floor — the [n/32, 32] reduce shape wastes lanes;
  * the MXU histogram's lax.map chunk count (sequential kernel launches).
"""

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

    n = int(float(os.environ.get("BENCH_MB", "16")) * (1 << 20))
    seg = 256
    n_seg = n // seg + 1
    n_pad = n_seg * seg
    log(f"device: {jax.devices()[0]}, n={n} n_pad={n_pad}")

    rng = np.random.default_rng(0)
    a_np = (rng.random(n) < 0.05).astype(np.int32)
    a_row = jnp.asarray(a_np)

    # --- bitmap packing variants (bool[n_pad] -> uint32[n_pad/32]) ---

    @jax.jit
    def pack_current(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)])
        bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
        return jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)

    (w_cur,), _ = timeit("pack current [n/32,32]", lambda: (pack_current(a_row),))

    X = -(-n_pad // 4096)  # 128 words x 32 bits per row
    n_pad2 = X * 4096

    @jax.jit
    def pack_tiled(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad2 - n,), dtype=bool)])
        bits = marked_row.reshape(X, 128, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        return jnp.sum(
            bits * weights[None, None, :], axis=2, dtype=jnp.uint32
        ).reshape(-1)[: n_pad // 32]

    (w_til,), _ = timeit("pack tiled [X,128,32]", lambda: (pack_tiled(a_row),))
    assert np.array_equal(np.asarray(w_cur), np.asarray(w_til))

    @jax.jit
    def pack_f32mm(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad2 - n,), dtype=bool)])
        bits = marked_row.reshape(X * 128, 32).astype(jnp.float32)
        wlo = (1 << np.arange(16)).astype(np.float32)
        whi = (1 << np.arange(16)).astype(np.float32)
        lo = bits[:, :16] @ wlo          # exact: < 2^16
        hi = bits[:, 16:] @ whi          # exact: < 2^16
        return (lo.astype(jnp.uint32)
                | (hi.astype(jnp.uint32) << jnp.uint32(16)))[: n_pad // 32]

    (w_mm,), _ = timeit("pack f32 matvec", lambda: (pack_f32mm(a_row),))
    assert np.array_equal(np.asarray(w_cur), np.asarray(w_mm))

    # bitcast trick: pack 8 bools -> uint8 via dot with [1,2,4,...,128]?
    # int8 dot is MXU-able; try int8 matmul with int32 accum
    @jax.jit
    def pack_i8mm(a_row):
        marked_sa = ((a_row & 1) != 0).astype(jnp.int8)
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad2 - n,), dtype=jnp.int8)])
        bits = marked_row.reshape(X * 128, 32)
        w = jnp.asarray(
            np.kron(np.eye(4, dtype=np.int8),
                    (1 << np.arange(8)).astype(np.int8)[:, None]).reshape(32, 4)
        )  # [32,4]: byte b of word = bits[8b:8b+8] . (1<<j)
        bytes4 = jax.lax.dot_general(
            bits, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)        # [N,4] bytes
        word = (bytes4[:, 0].astype(jnp.uint32)
                | (bytes4[:, 1].astype(jnp.uint32) << 8)
                | (bytes4[:, 2].astype(jnp.uint32) << 16)
                | (bytes4[:, 3].astype(jnp.uint32) << 24))
        return word[: n_pad // 32]

    (w_i8,), _ = timeit("pack i8 matmul", lambda: (pack_i8mm(a_row),))
    assert np.array_equal(np.asarray(w_cur), np.asarray(w_i8))

    # --- per-seg mark counts: reduce bool[n_seg, seg] vs popcount words ---
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

    timeit("perseg popcount(words)", lambda: (perseg_pop(w_cur),))

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

        timeit(f"hist CH={CH} ({nchunks} map steps)", lambda h=hist: (h(bwt_chars),), reps=5)


if __name__ == "__main__":
    main()
