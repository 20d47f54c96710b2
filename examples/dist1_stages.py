"""mesh=1 stage timing at the 128 MiB operating point (VERDICT r4 #4):
where do the ~3.0 s go vs the 0.89 s single-chip SA?  Times each mesh
dispatch separately with the accumulator/fingerprint methodology.

Usage: BENCH_MB=128 python examples/dist1_stages.py
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
    from femto_tpu.parallel import dist_build as db
    from femto_tpu.parallel.mesh import make_mesh

    mb = float(os.environ.get("BENCH_MB", "128"))
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
    log(f"device {jax.devices()[0]}, {mb} MiB")

    mesh = make_mesh(1)
    axis = db.DEFAULT_AXIS
    text_pad, n_pad = db.pad_text_for_mesh(np.asarray(text_dev), 1, 256)
    tdev = jax.device_put(jnp.asarray(text_pad))
    _ = int(tdev[0])
    from femto_tpu.parallel.distributed import put_global
    from jax.sharding import NamedSharding, PartitionSpec as P

    doc_starts_dev = put_global(doc_starts_np.astype(np.int32),
                                NamedSharding(mesh, P()))
    used_np = alpha_np[alpha_np > 0].astype(np.int32)
    used_dev = put_global(used_np, NamedSharding(mesh, P()))
    K = len(used_np)
    per_key, bits = db._pack_rate(K)
    nkeys = 2 if 2 * per_key >= 10 else 3
    span = per_key * nkeys
    cap = max(64, int(np.ceil(4.0 * n_pad / 1)))
    key = jax.random.PRNGKey(0)
    mark_period = 20

    @jax.jit
    def fp(tree):
        tot = jnp.int32(0)
        for leaf in jax.tree.leaves(tree):
            tot = tot + leaf[tuple(0 for _ in leaf.shape)].astype(jnp.int32)
        return tot

    def timeit(label, fn, reps=3):
        out = fn()
        _ = int(fp(out))
        t0 = time.perf_counter()
        for _i in range(reps):
            out = fn()
            _ = int(fp(out))
        dt = (time.perf_counter() - t0) / reps
        log(f"  {label}: {dt*1e3:8.1f} ms")
        return out

    prep_seed = db._jit_prep_seed(mesh, axis, n, n_pad, per_key, bits,
                                  nkeys, mark_period, ndocs, cap)
    out = timeit("prep+seed (fused program)",
                 lambda: prep_seed(tdev, doc_starts_dev, used_dev, key))
    sa, pull, st, m_act_dev, of, key0_blk, payload = out
    m_act = int(m_act_dev)
    log(f"  m_act = {m_act}")

    # prep alone (keys + payload, no sort)
    prep = db._jit_prep(mesh, axis, n, n_pad, per_key, bits, nkeys,
                        mark_period, ndocs)
    timeit("prep alone (keys+payload)",
           lambda: prep(tdev, doc_starts_dev, used_dev))

    M = db._bucket_anchored(m_act, n_pad)
    epi = db._jit_epilogue(mesh, axis, n_pad, M, db._EXT_T, per_key)

    def run_epi():
        # non-donating copy cost included once per rep (sa etc. reused)
        return epi(jnp.array(sa), jnp.array(st), key0_blk, jnp.array(pull),
                   payload, jnp.int32(span))

    timeit(f"fused epilogue (M={M})", run_epi)

    @jax.jit
    def decode(pull):
        return pull & 511, pull >> 9

    timeit("pull decode (bwt/aux split)", lambda: decode(pull))

    # reference points
    @jax.jit
    def plain_sort(k0, k1, payload):
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        out = jax.lax.sort((k0, k1, idx, payload), num_keys=2)
        return out[-2], out[-1]

    k0 = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 30, n_pad, dtype=np.int32))
    k1 = jnp.roll(k0, -5)
    timeit("bare 2-key lax.sort (+idx+payload)",
           lambda: plain_sort(k0, k1, pull))


if __name__ == "__main__":
    main()
