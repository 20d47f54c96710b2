"""Round-3 TPU measurement batch (PERF.md methodology: timed loops chain
a scalar accumulator; build phases end with one fingerprint pull because
block_until_ready returns early on the remote transport).

Stages (select with R3_STAGES=comma list; default all):
  count   - baseline vs shared-segment pair rank (backward_search_shared)
  vseg    - vseg tier build + count + locate walk vs full/packed tiers
  locate  - lockstep walk vs device-compaction pyramid walk
  dist1   - distributed build on a mesh of the ONE real chip (mesh=1):
            wide-sort rate vs the single-chip suffix_array

Run: BENCH_MB=16 python examples/r3_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import femto_tpu as ft
    from femto_tpu.alphabet import CHARACTER_OFFSET, SEOF
    from femto_tpu.ops.build_ops import (
        build_fm_arrays_device, build_sa_payload,
    )
    from femto_tpu.ops.search_ops import (
        backward_search, backward_search_shared, locate_rows,
        locate_rows_pyramid,
    )

    stages = os.environ.get("R3_STAGES", "count,vseg,locate,dist1").split(",")
    mb = float(os.environ.get("BENCH_MB", "16"))
    B = int(os.environ.get("BENCH_BATCH", "32768"))
    P = int(os.environ.get("BENCH_PATLEN", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    mark_period = 20

    dev = jax.devices()[0]
    log(f"device: {dev}, corpus {mb} MiB, batch {B}, patlen {P}")
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

    alpha_np = np.sort(np.concatenate([
        np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
        .astype(np.int32) + CHARACTER_OFFSET,
        np.asarray([SEOF], dtype=np.int32)]))
    text_dev = gen_text(jax.random.PRNGKey(1234))
    _ = int(text_dev[0])
    log("corpus synthesized on device")

    @jax.jit
    def fingerprint(tree):
        tot = jnp.int32(0)
        for leaf in jax.tree.leaves(tree):
            if leaf is None:
                continue
            idx = tuple(0 for _ in leaf.shape)
            tot = tot + leaf[idx].astype(jnp.int32)
        return tot

    doc_starts_dev = jnp.asarray(doc_starts_np.astype(np.int32))
    payload = build_sa_payload(text_dev, doc_starts_dev, n=n,
                               mark_period=mark_period, ndocs=ndocs)
    sa, pull = ft.suffix_array(text_dev, payload=payload, alpha=alpha_np)
    _ = int(fingerprint((sa, pull)))
    log("suffix array done")

    def build_tier(tier, seg):
        arrays, n_marks, _ = build_fm_arrays_device(
            text_dev, sa, doc_starts_dev, n=n, seg=seg,
            mark_period=mark_period, ndocs=ndocs, tier=tier, pull=pull,
            alpha=alpha_np)
        _ = int(fingerprint(arrays))
        return arrays

    rng = np.random.default_rng(99)
    starts = (rng.integers(0, ndocs, size=B) * doc_size
              + rng.integers(0, doc_size - P - 2, size=B)).astype(np.int32)
    starts = np.minimum(starts, n - P - 2)

    @jax.jit
    def slice_patterns(text, starts):
        idx = starts[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]
        return jnp.take(text, idx, axis=0).astype(jnp.int32)

    packed_dev = slice_patterns(text_dev, jnp.asarray(starts))
    _ = int(packed_dev[0, 0])

    def time_count(arrays, fn, label, **kw):
        @jax.jit
        def step(arrays, pats, acc):
            pats = pats + jnp.minimum(acc, 0).astype(jnp.int32)
            first, last = fn(arrays, n, pats, **kw)
            return acc + jnp.sum(last - first), first, last

        acc = jnp.int32(0)
        acc, f, l = step(arrays, packed_dev, acc)
        sanity = int(acc)
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _i in range(iters):
            acc, f, l = step(arrays, packed_dev, acc)
        _ = int(acc)
        dt = time.perf_counter() - t0
        sps = B * P * iters / dt
        log(f"{label}: {sps/1e6:.2f}M steps/s (total={sanity})")
        return sps

    def time_locate(arrays, fn, label, LB=65536, reps=5):
        rows = jnp.asarray(rng.integers(0, n, size=LB).astype(np.int32))

        @jax.jit
        def step(arrays, rows, acc):
            r = (rows + jnp.minimum(acc, 0).astype(jnp.int32)) % n
            offs = fn(arrays, mark_period, r)
            return acc + jnp.sum(offs), offs

        acc = jnp.int32(0)
        acc, offs = step(arrays, rows, acc)
        _ = int(acc)
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for _i in range(reps):
            acc, offs = step(arrays, rows, acc)
        _ = int(acc)
        rps = reps * LB / (time.perf_counter() - t0)
        log(f"{label}: {rps/1e6:.2f}M rows/s (B={LB})")
        return rps

    if "count" in stages:
        arrays = build_tier("full", 256)
        time_count(arrays, backward_search, "count full baseline")
        for cap in (B // 2, B // 4):
            time_count(arrays, backward_search_shared,
                       f"count full shared cap={cap}", compact_cap=cap)

    if "vseg" in stages:
        for tier, seg in (("packed", 256), ("vseg", 256), ("vseg", 512)):
            arrays = build_tier(tier, seg)
            time_count(arrays, backward_search, f"count {tier} seg={seg}")
            time_count(arrays, backward_search_shared,
                       f"count {tier} seg={seg} shared", compact_cap=B // 2)
            time_locate(arrays, locate_rows, f"locate walk {tier} seg={seg}")

    if "locate" in stages:
        arrays = build_tier("full", 256)
        time_locate(arrays, locate_rows, "locate walk baseline")
        time_locate(arrays, locate_rows_pyramid, "locate walk pyramid")
        time_locate(arrays, locate_rows, "locate walk baseline B=128K",
                    LB=131072)
        time_locate(arrays, locate_rows_pyramid, "locate pyramid B=128K",
                    LB=131072)

    if "dist1" in stages:
        from femto_tpu.parallel import dist_build as db
        from femto_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(1)
        text_pad, n_pad = db.pad_text_for_mesh(np.asarray(text_dev), 1, 256)
        tdev = jax.device_put(jnp.asarray(text_pad))
        _ = int(tdev[0])

        def dist_barrier():
            sa_d, bwt_d, aux_d, of = db.dist_suffix_array(
                tdev, mesh, n=n, doc_starts=doc_starts_dev,
                mark_period=mark_period,
                alpha=alpha_np[alpha_np > 0].astype(np.int32))
            _ = int(fingerprint((sa_d, bwt_d)))
            return of

        t0 = time.perf_counter()
        of = dist_barrier()
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        of = dist_barrier()
        t_steady = time.perf_counter() - t0
        log(f"dist build mesh=1: {mb/t_steady:.2f} MiB/s steady "
            f"(cold {t_cold:.1f}s) overflow={int(of)} "
            f"stats={db.LAST_BUILD_STATS}")
        # single-chip reference rate
        t0 = time.perf_counter()
        sa2, pull2 = ft.suffix_array(text_dev, payload=payload,
                                     alpha=alpha_np)
        _ = int(fingerprint((sa2, pull2)))
        t_sc = time.perf_counter() - t0
        log(f"single-chip suffix_array: {mb/t_sc:.2f} MiB/s steady")


if __name__ == "__main__":
    main()
