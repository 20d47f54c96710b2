"""Trustworthy end-to-end build timing on the real TPU.

Methodology (PERF.md round 2+): jax.block_until_ready returns early on the
axon transport and per-array single-element pulls cost one ~25 ms tunnel
round-trip EACH, so each timed build rep ends with ONE jitted fingerprint
program that reads every output array and returns one scalar, materialized
with int() — device-true time + exactly one round-trip.

    BENCH_MB=16 python examples/profile_build2.py
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import femto_tpu as ft
    from femto_tpu.alphabet import CHARACTER_OFFSET, SEOF
    from femto_tpu.ops import build_ops as BO

    mb = float(os.environ.get("BENCH_MB", "16"))
    seg = int(os.environ.get("BENCH_SEG", "256"))
    mark_period = int(os.environ.get("BENCH_MARK", "20"))
    tier = os.environ.get("BENCH_TIER", "full")

    n = int(mb * (1 << 20))
    doc_size = 1 << 16
    ndocs = -(-n // doc_size)
    doc_starts_np = np.minimum(
        np.arange(ndocs + 1, dtype=np.int64) * doc_size, n)

    @jax.jit
    def gen_text(key):
        letters = jnp.asarray(
            np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
            .astype(np.int32) + CHARACTER_OFFSET)
        probs = 1.0 / np.arange(1, 31, dtype=np.float32)
        logits = jnp.log(jnp.asarray(probs / probs.sum()))
        ix = jax.random.categorical(key, logits, shape=(n,))
        text = letters[ix]
        pos = jnp.arange(n, dtype=jnp.int32)
        is_end = (pos % doc_size == doc_size - 1) | (pos == n - 1)
        return jnp.where(is_end, SEOF, text)

    # the generator's alphabet is static: zipf letters + SEOF
    alpha_np = np.sort(np.concatenate([
        np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
        .astype(np.int32) + CHARACTER_OFFSET,
        np.asarray([SEOF], dtype=np.int32)]))
    text_dev = gen_text(jax.random.PRNGKey(1234))
    _ = int(text_dev[0])  # force
    log(f"device: {jax.devices()[0]}, corpus {mb} MiB on device, tier={tier}")

    doc_starts_dev = jnp.asarray(doc_starts_np.astype(np.int32))

    @jax.jit
    def fingerprint(tree):
        tot = jnp.int32(0)
        for leaf in jax.tree.leaves(tree):
            idx = tuple(0 for _ in leaf.shape)
            tot = tot + leaf[idx].astype(jnp.int32)
        return tot

    def build_once():
        t0 = time.perf_counter()
        payload = BO.build_sa_payload(
            text_dev, doc_starts_dev, n=n, mark_period=mark_period,
            ndocs=ndocs)
        sa, pull = ft.suffix_array(text_dev, payload=payload, alpha=alpha_np)
        t1 = time.perf_counter()  # suffix_array already syncs on m
        arrays, n_marks, _ = BO.build_fm_arrays_device(
            text_dev, sa, doc_starts_dev, n=n, seg=seg,
            mark_period=mark_period, ndocs=ndocs, tier=tier, pull=pull)
        _ = int(fingerprint(arrays))
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1, t2 - t0

    t_sa, t_pkg, t_tot = build_once()
    log(f"cold: SA {t_sa:.1f}s pkg {t_pkg:.1f}s total {t_tot:.1f}s")
    best = None
    for r in range(3):
        t_sa, t_pkg, t_tot = build_once()
        log(f"steady rep {r}: SA {t_sa*1e3:.0f} ms, packaging "
            f"{t_pkg*1e3:.0f} ms, total {t_tot*1e3:.0f} ms "
            f"= {mb/t_tot:.1f} MiB/s")
        best = t_tot if best is None else min(best, t_tot)
    log(f"best steady total: {best*1e3:.0f} ms = {mb/best:.1f} MiB/s")


if __name__ == "__main__":
    main()
