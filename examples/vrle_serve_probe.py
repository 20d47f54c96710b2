"""vrle serving throughput on REAL text (where RLE/continuation rows
actually exist), on the TPU: count steps/s + locate walk per tier.

Usage: python examples/vrle_serve_probe.py [--mb 8]
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import femto_tpu as ft  # noqa: E402
from femto_tpu import search  # noqa: E402
from femto_tpu.alphabet import pattern_to_alpha  # noqa: E402
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
    args = ap.parse_args()

    import pydoc_data.topics as topics
    buf = ("\n".join(sorted(topics.topics.values()))).encode()
    nb = int(args.mb * (1 << 20))
    reps = -(-nb // len(buf))
    buf = (buf * reps)[:nb]
    docs = [buf[i:i + 65536] for i in range(0, len(buf), 65536)]
    prep = ft.prepare_documents(docs)
    log(f"corpus: {prep.n/2**20:.1f} MiB english prose, "
        f"{prep.num_docs} docs, device {jax.devices()[0]}")

    rng = np.random.default_rng(5)
    B, PL = args.batch, args.patlen
    starts = rng.integers(0, prep.n - PL - 1, size=B)
    tn = np.asarray(prep.text)
    pats_np = np.stack([tn[s:s + PL] for s in starts]).astype(np.int32)

    for tier in ("packed", "vseg", "vrle"):
        ix = ft.build_index(prep, tier=tier, seg=512, mark_period=20)
        sz = sum(np.asarray(v).nbytes for v in
                 ix.arrays._asdict().values() if v is not None) / prep.n
        pats = jnp.asarray(pats_np)

        fn = jax.jit(functools.partial(backward_search, n=prep.n))
        f, l = fn(ix.arrays, pats=pats)
        jax.block_until_ready((f, l))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            f, l = fn(ix.arrays, pats=pats)
        jax.block_until_ready((f, l))
        dt = (time.perf_counter() - t0) / args.iters
        sps = B * PL / dt
        total = int(jnp.sum(l - f))

        rows = jnp.asarray(
            rng.integers(0, prep.n, size=65536).astype(np.int32))
        wfn = jax.jit(lambda a, r: locate_rows_pyramid(a, 20, r))
        offs = wfn(ix.arrays, rows)
        jax.block_until_ready(offs)
        t0 = time.perf_counter()
        for _ in range(5):
            offs = wfn(ix.arrays, rows)
        jax.block_until_ready(offs)
        wdt = (time.perf_counter() - t0) / 5
        log(f"{tier:>6}: {sz:.3f} B/char | count {sps/1e6:.2f}M steps/s "
            f"(matches {total}) | walk {65536/wdt/1e6:.2f}M rows/s")


if __name__ == "__main__":
    main()
