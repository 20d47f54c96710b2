"""Multi-config benchmark in ONE process (single TPU client session).

The remote-compile tunnel wedges when client processes churn, so this runs
every configuration — corpus sizes, tiers, locate batches — inside one
backend session.  Prints one labelled line per measurement.

    python examples/bench_all.py "16:full" "16:packed" "96:full"
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_config(mb: float, tier: str, locate_batches=(65536, 131072)):
    import jax
    import jax.numpy as jnp

    import femto_tpu as ft
    from femto_tpu.alphabet import CHARACTER_OFFSET, SEOF
    from femto_tpu.fmindex import FMIndex, FMMeta
    from femto_tpu.ops.build_ops import build_fm_arrays_device
    from femto_tpu.ops.rank import n_segments as R_n_segments
    from femto_tpu.ops.search_ops import backward_search, locate_rows

    B, P = 32768, 16
    seg, mark_period = 256, 20
    n = int(mb * (1 << 20))
    doc_size = 1 << 16
    ndocs = -(-n // doc_size)
    doc_starts_np = np.minimum(
        np.arange(ndocs + 1, dtype=np.int64) * doc_size, n
    )

    @jax.jit
    def gen_text(key):
        letters = jnp.asarray(
            np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
            .astype(np.int32) + CHARACTER_OFFSET
        )
        probs = 1.0 / np.arange(1, 31, dtype=np.float32)
        logits = jnp.log(jnp.asarray(probs / probs.sum()))
        ix = jax.random.categorical(key, logits, shape=(n,))
        text = letters[ix]
        pos = jnp.arange(n, dtype=jnp.int32)
        is_end = (pos % doc_size == doc_size - 1) | (pos == n - 1)
        return jnp.where(is_end, SEOF, text)

    text_dev = gen_text(jax.random.PRNGKey(1234))
    text_dev.block_until_ready()
    log(f"[{mb}MiB/{tier}] corpus on device")

    def sa_barrier():
        sa = ft.suffix_array(text_dev)
        return sa, int(jnp.sum(sa & 1))

    t0 = time.perf_counter()
    sa, _ = sa_barrier()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sa, _ = sa_barrier()
    t_sa = time.perf_counter() - t0
    log(f"[{mb}MiB/{tier}] SA {t_sa:.2f}s steady = {mb/t_sa:.1f} MiB/s "
        f"(cold {t_cold:.1f}s)")

    doc_starts_dev = jnp.asarray(doc_starts_np.astype(np.int32))

    def build_barrier():
        arrays, n_marks, au = build_fm_arrays_device(
            text_dev, sa, doc_starts_dev,
            n=n, seg=seg, mark_period=mark_period, ndocs=ndocs, tier=tier,
        )
        jax.block_until_ready(arrays)
        return arrays, int(n_marks), au

    arrays, n_marks, alpha_used = build_barrier()
    t0 = time.perf_counter()
    arrays, n_marks, alpha_used = build_barrier()
    t_build = time.perf_counter() - t0
    nbytes = sum(np.asarray(v).nbytes for v in arrays)
    log(f"[{mb}MiB/{tier}] packaging {t_build:.2f}s; total build "
        f"{mb/(t_sa+t_build):.2f} MiB/s; index {nbytes/n:.2f} B/char"
        + (f" (K={alpha_used})" if alpha_used else ""))

    meta = FMMeta(n=n, seg=seg, mark_period=mark_period, num_docs=ndocs,
                  n_marks=n_marks, n_seg=int(R_n_segments(arrays)),
                  alpha_used=alpha_used)
    index = FMIndex(arrays=arrays, meta=meta, doc_starts_np=doc_starts_np,
                    infos=[b"bench%d" % i for i in range(ndocs)])

    rng = np.random.default_rng(99)
    starts = (
        rng.integers(0, ndocs, size=B) * doc_size
        + rng.integers(0, doc_size - P - 2, size=B)
    ).astype(np.int32)
    starts = np.minimum(starts, n - P - 2)

    @jax.jit
    def slice_patterns(text, starts):
        idx = starts[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]
        return jnp.take(text, idx, axis=0).astype(jnp.int32)

    packed_dev = slice_patterns(text_dev, jnp.asarray(starts))

    @jax.jit
    def count_step(arrays, pats, acc):
        pats = pats + jnp.minimum(acc, 0).astype(jnp.int32)
        first, last = backward_search(arrays, n, pats)
        return acc + jnp.sum(last - first), first, last

    acc = jnp.int32(0)
    acc, f, l = count_step(arrays, packed_dev, acc)
    _ = int(acc)
    iters = 20
    acc = jnp.int32(0)
    t0 = time.perf_counter()
    for _i in range(iters):
        acc, f, l = count_step(arrays, packed_dev, acc)
    _ = int(acc)
    sps = B * P * iters / (time.perf_counter() - t0)
    log(f"[{mb}MiB/{tier}] count {sps/1e6:.2f}M steps/s/chip")

    for LB in locate_batches:
        rows = jnp.asarray(rng.integers(0, n, size=LB).astype(np.int32))

        @jax.jit
        def loc_step(arrays, rows, acc):
            rows = (rows + jnp.minimum(acc, 0).astype(jnp.int32)) % n
            offs = locate_rows(arrays, mark_period, rows)
            return acc + jnp.sum(offs), offs

        acc = jnp.int32(0)
        acc, offs = loc_step(arrays, rows, acc)
        _ = int(acc)
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _i in range(5):
            acc, offs = loc_step(arrays, rows, acc)
        _ = int(acc)
        log(f"[{mb}MiB/{tier}] locate {5*LB/(time.perf_counter()-t0)/1e6:.2f}"
            f"M rows/s (B={LB})")
    return sps


def main():
    configs = sys.argv[1:] or ["16:full", "16:packed", "96:full"]
    for cfg in configs:
        mb_s, tier = cfg.split(":")
        run_config(float(mb_s), tier)
        log(f"=== {cfg} done ===")


if __name__ == "__main__":
    main()
