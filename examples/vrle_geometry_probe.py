"""ONE geometry, BOTH numbers (VERDICT r4 #2): size + serving speed for
the row tiers across seg=512/1024/2048 on REAL English prose, on the
real TPU, with the bench methodology (accumulator-chained timed loops —
block_until_ready returns early on this remote-dispatch transport,
PERF.md round 2).

Usage: python examples/vrle_geometry_probe.py [--mb 8] [--segs 512,1024,2048]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import femto_tpu as ft  # noqa: E402
from femto_tpu.ops.search_ops import (  # noqa: E402
    backward_search, locate_rows_pyramid,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=8.0)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--patlen", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--segs", default="512,1024,2048")
    ap.add_argument("--tiers", default="vseg,vrle")
    ap.add_argument("--mark", type=int, default=20)
    args = ap.parse_args()

    from corpus_real import english_prose  # UNIQUE prose — never tiled

    buf = english_prose(args.mb)
    docs = [buf[i:i + 65536] for i in range(0, len(buf), 65536)]
    prep = ft.prepare_documents(docs)
    n = prep.n
    log(f"corpus: {n/2**20:.1f} MiB english prose, "
        f"{prep.num_docs} docs, device {jax.devices()[0]}")

    rng = np.random.default_rng(5)
    B, PL = args.batch, args.patlen
    starts = rng.integers(0, n - PL - 1, size=B)
    tn = np.asarray(prep.text)
    pats_np = np.stack([tn[s:s + PL] for s in starts]).astype(np.int32)
    pats_dev = jnp.asarray(pats_np)
    rows_np = rng.integers(0, n, size=65536).astype(np.int32)
    rows_dev = jnp.asarray(rows_np)

    print(f"{'tier':>6} {'seg':>5} | {'B/char':>7} | {'count Msteps/s':>14} "
          f"| {'walk Mrows/s':>12}", flush=True)

    for tier in args.tiers.split(","):
        for seg in (int(s) for s in args.segs.split(",")):
            ix = ft.build_index(prep, tier=tier, seg=seg,
                                mark_period=args.mark)
            sz = sum(np.asarray(v).nbytes for v in
                     ix.arrays._asdict().values() if v is not None) / n

            @jax.jit
            def count_step(arrays, pats, acc):
                pats = pats + jnp.minimum(acc, 0).astype(jnp.int32)
                f, l = backward_search(arrays, n, pats)
                return acc + jnp.sum(l - f), f, l

            acc = jnp.int32(0)
            acc, f, l = count_step(ix.arrays, pats_dev, acc)
            total = int(acc)
            acc = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                acc, f, l = count_step(ix.arrays, pats_dev, acc)
            _ = int(acc)
            sps = B * PL * args.iters / (time.perf_counter() - t0)

            @jax.jit
            def walk_step(arrays, rows, acc):
                rows = (rows + jnp.minimum(acc, 0).astype(jnp.int32)) % n
                offs = locate_rows_pyramid(arrays, args.mark, rows)
                return acc + jnp.sum(offs), offs

            acc = jnp.int32(0)
            acc, offs = walk_step(ix.arrays, rows_dev, acc)
            _ = int(acc)
            acc = jnp.int32(0)
            t0 = time.perf_counter()
            for _ in range(5):
                acc, offs = walk_step(ix.arrays, rows_dev, acc)
            _ = int(acc)
            wps = 5 * len(rows_np) / (time.perf_counter() - t0)

            print(f"{tier:>6} {seg:>5} | {sz:7.3f} | {sps/1e6:14.2f} "
                  f"| {wps/1e6:12.2f}   (matches {total})", flush=True)


if __name__ == "__main__":
    main()
