"""Probe per-dispatch overhead and packaging substage costs on the TPU.

Establishes how much of each small jitted stage's steady time is transport
dispatch latency vs real device work — decides whether fusing packaging
stages (fewer dispatches) can pay on this deployment.
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
    dev = jax.devices()[0]
    log(f"device: {dev}, n={n}")

    # 1. trivial dispatch: scalar add
    x = jnp.float32(1.0)
    f_triv = jax.jit(lambda v: v + 1.0)
    timeit("trivial scalar dispatch", lambda: f_triv(x))

    # 2. O(n) elementwise pass (1 read + 1 write)
    big = jnp.arange(n, dtype=jnp.int32)
    f_ew = jax.jit(lambda v: v + 1)
    timeit("O(n) elementwise (67MB r+w)", lambda: f_ew(big))

    # 3. split_pull-shaped: one input, three outputs incl dtype casts
    def split(pull):
        bwt_chars = pull & 511
        a_row = pull >> 9
        return bwt_chars.astype(jnp.uint16), bwt_chars, a_row

    f_sp = jax.jit(split)
    timeit("split-pull shaped (3 outputs)", lambda: f_sp(big))

    # 4. device->host scalar pull (host sync cost)
    s = jnp.int32(3)
    timeit("device->host int()", lambda: int(s) + 0 or s)

    # 5. marks_finish substages
    from femto_tpu.ops import build_ops as BO

    seg = 256
    n_seg = n // seg + 1
    n_pad = n_seg * seg
    mark_period = 20
    ndocs = 256
    cap = BO.mark_cap(n, ndocs, mark_period, seg)
    rng = np.random.default_rng(0)
    # synthetic aux words + sa
    sa_np = rng.permutation(n).astype(np.int32)
    a_np = ((rng.random(n) < 1.0 / mark_period) | (sa_np < ndocs)).astype(
        np.int32
    )
    sa = jnp.asarray(sa_np)
    a_row = jnp.asarray(a_np)

    timeit(
        "marks_finish (whole)",
        lambda: BO._marks_finish(
            sa, a_row, n=n, n_pad=n_pad, seg=seg, cap=cap, ndocs=ndocs,
            mark_period=mark_period),
        reps=5,
    )

    # bitmap-only part
    @jax.jit
    def bitmap_part(a_row):
        marked_sa = (a_row & 1) != 0
        marked_row = jnp.concatenate(
            [marked_sa, jnp.zeros((n_pad - n,), dtype=bool)])
        bits = marked_row.reshape(n_pad // 32, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
        mark_bits = jnp.sum(bits * weights, axis=1, dtype=jnp.uint32).reshape(
            n_pad // seg, seg // 32)
        per_seg_marks = (
            marked_row.reshape(n_pad // seg, seg).sum(axis=1).astype(jnp.int32))
        return mark_bits, per_seg_marks

    (mark_bits, per_seg), _ = timeit("  bitmap+perseg", lambda: bitmap_part(a_row))

    n_marks = jnp.sum(per_seg)

    @jax.jit
    def select_part(mark_bits, n_marks):
        return BO._mark_rank_select(mark_bits, n_marks, cap, n)

    (valid, rowc), _ = timeit("  rank_select", lambda: select_part(mark_bits, n_marks))

    @jax.jit
    def gather_part(sa, a_row, rowc, valid):
        sa_tag = jnp.stack([sa.astype(jnp.int32), a_row >> 1], axis=1)
        picked = sa_tag[rowc]
        mark_vals = jnp.where(valid, picked[:, 0], -1)
        tags = jnp.where(valid, picked[:, 1], 0)
        return mark_vals, tags

    timeit("  stack+gather (current)", lambda: gather_part(sa, a_row, rowc, valid))

    @jax.jit
    def gather2_part(sa, a_row, rowc, valid):
        mark_vals = jnp.where(valid, sa[rowc], -1)
        tags = jnp.where(valid, (a_row >> 1)[rowc], 0)
        return mark_vals, tags

    timeit("  2 separate gathers (alt)", lambda: gather2_part(sa, a_row, rowc, valid))


if __name__ == "__main__":
    main()
