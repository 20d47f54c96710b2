"""Round-5 sort design space (VERDICT r4 #1): can a two-pass
distribution sort (the TPU analog of the reference's sort.hh:64-620
Sorter) beat the monolithic lax.sort that carries the SA seed sort?

Measures, on the real chip, with the accumulator-chained methodology:
  A. lax.sort throughput vs n (the primitive's scaling curve) for the
     production operand set (2 int32 keys + idx + payload);
  B. the batched per-bucket sort CEILING: a [B, cap] row-wise sort of
     the same total element count (what a perfectly balanced,
     zero-cost partition would leave to do);
  C. the mandatory partition costs: a stable 1-key uint8 sort (bucket
     ids) and an n-row scatter (bucket-major placement);
  D. variants: 3-key, 4-key, uint16 key-halves.

Decision rule: distribution sort is viable iff
  C_partition + B_ceiling < A_monolithic at the operating n.

Usage: python examples/sort_probe4.py [--ns 4,16,64] [--iters 5]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, args, iters, tag):
    """Accumulator-chained timing: fn(args..., acc) -> (out..., acc)."""
    acc = jnp.int32(0)
    out = fn(*args, acc)
    acc = out[-1]
    _ = int(acc)
    acc = jnp.int32(0)
    t0 = time.perf_counter()
    for _i in range(ITERS):
        out = fn(*args, acc)
        acc = out[-1]
    _ = int(acc)
    dt = (time.perf_counter() - t0) / ITERS
    log(f"  {tag}: {dt*1e3:8.2f} ms")
    return dt


ITERS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="4,16,64")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    global ITERS
    ITERS = args.iters

    log(f"device: {jax.devices()[0]}")

    for nm in (int(s) for s in args.ns.split(",")):
        n = nm << 20
        log(f"--- n = {nm}M elements ---")
        key = jax.random.PRNGKey(7)
        k0 = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        k1 = jnp.roll(k0, -5)
        k2 = jnp.roll(k0, -10)
        payload = jnp.arange(n, dtype=jnp.int32)

        # A: production shape — 2 keys + idx + payload
        @jax.jit
        def sort2(k0, k1, payload, acc):
            ka = k0 + jnp.minimum(acc, 0)
            out = jax.lax.sort(
                (ka, k1, jnp.arange(n, dtype=jnp.int32), payload),
                num_keys=2)
            return out[0], acc + out[-1][0] + out[0][0]

        tA = timed(sort2, (k0, k1, payload), ITERS, "A  2-key sort (+idx+payload)")

        @jax.jit
        def sort3(k0, k1, k2, payload, acc):
            ka = k0 + jnp.minimum(acc, 0)
            out = jax.lax.sort(
                (ka, k1, k2, jnp.arange(n, dtype=jnp.int32), payload),
                num_keys=3)
            return out[0], acc + out[-1][0] + out[0][0]

        timed(sort3, (k0, k1, k2, payload), ITERS, "D  3-key sort (+idx+payload)")

        # D: uint16 key-halves (4 keys of uint16 == 2 int32 keys)
        h0 = (k0 >> 15).astype(jnp.uint16)
        l0 = (k0 & 0x7FFF).astype(jnp.uint16)
        h1 = (k1 >> 15).astype(jnp.uint16)
        l1 = (k1 & 0x7FFF).astype(jnp.uint16)

        @jax.jit
        def sort_halves(h0, l0, h1, l1, payload, acc):
            ha = h0 ^ jnp.minimum(acc, 0).astype(jnp.uint16)
            out = jax.lax.sort(
                (ha, l0, h1, l1, jnp.arange(n, dtype=jnp.int32), payload),
                num_keys=4)
            return out[0], acc + out[-1][0] + out[0][0].astype(jnp.int32)

        timed(sort_halves, (h0, l0, h1, l1, payload), ITERS,
              "D  4x uint16 halves (+idx+payload)")

        # B: batched-bucket ceiling at several bucket counts
        for B in (32, 256, 2048):
            cap = n // B  # perfectly balanced; real caps need ~1.25x
            k0b = k0.reshape(B, cap)
            k1b = k1.reshape(B, cap)
            pb = payload.reshape(B, cap)

            @jax.jit
            def sortb(k0b, k1b, pb, acc):
                ka = k0b + jnp.minimum(acc, 0)
                idx = jnp.broadcast_to(
                    jnp.arange(cap, dtype=jnp.int32)[None, :], (B, cap))
                out = jax.lax.sort((ka, k1b, idx, pb), num_keys=2,
                                   dimension=1)
                return out[0], acc + out[-1][0, 0] + out[0][0, 0]

            timed(sortb, (k0b, k1b, pb), ITERS,
                  f"B  batched sort {B} x {cap}")

        # C: partition costs — stable uint8 1-key sort and n-row scatter
        bk = (k0 >> 22).astype(jnp.uint8)  # 256 buckets

        @jax.jit
        def sort_bucket_ids(bk, k0, k1, payload, acc):
            ba = bk ^ jnp.minimum(acc, 0).astype(jnp.uint8)
            out = jax.lax.sort(
                (ba, jnp.arange(n, dtype=jnp.int32), k0, k1, payload),
                num_keys=2, is_stable=False)
            return out[0], acc + out[-1][0] + out[0][0].astype(jnp.int32)

        timed(sort_bucket_ids, (bk, k0, k1, payload), ITERS,
              "C  1-key u8 partition sort (3 payloads)")

        perm = jax.random.permutation(key, n).astype(jnp.int32)

        @jax.jit
        def scatter_rows(perm, k0, acc):
            pa = perm + jnp.minimum(acc, 0)
            out = jnp.zeros((n,), jnp.int32).at[pa].set(k0, mode="drop")
            return out, acc + out[0]

        timed(scatter_rows, (perm, k0), ITERS, "C  n-row random scatter")

        @jax.jit
        def gather_rows(perm, k0, acc):
            pa = perm + jnp.minimum(acc, 0)
            out = k0[pa]
            return out, acc + out[0]

        timed(gather_rows, (perm, k0), ITERS, "C  n-row random gather")


if __name__ == "__main__":
    main()
