"""Per-stage build profiling on the real TPU (PERF.md methodology).

Times the suffix sort and each packaging stage (_bwt/_occ/_marks)
separately, steady-state, with on-device corpus synthesis.  Run:
    BENCH_MB=16 python examples/profile_build.py

Timing note: jax.block_until_ready does NOT reliably wait on the axon
remote transport (measured: a 9 ms histogram "completes" in 0.09 ms), so
every timed region here ends by materializing one scalar element from
each output buffer — pulling any element of a program's output forces the
whole program to have executed.
"""

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(out):
    """Materialize one element of every array in `out` (host pull), which
    forces the producing programs to have fully executed — unlike
    block_until_ready on this transport."""
    import jax

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "shape"):
            idx = tuple(0 for _ in leaf.shape)
            np.asarray(leaf[idx] if leaf.shape else leaf)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache (opt-in: wedges the axon remote-compile
    # tunnel, so only enable where the backend supports it).
    if os.environ.get("FEMTO_TPU_COMPILE_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import femto_tpu as ft
    from femto_tpu.alphabet import CHARACTER_OFFSET, SEOF
    from femto_tpu.ops import build_ops as BO

    mb = float(os.environ.get("BENCH_MB", "16"))
    seg = int(os.environ.get("BENCH_SEG", "256"))
    mark_period = int(os.environ.get("BENCH_MARK", "20"))

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
    log(f"corpus {mb} MiB on device")

    # --- SA (fused payload; FEMTO_TPU_SA_DEBUG=1 prints sub-stages) ---
    doc_starts_dev = jnp.asarray(doc_starts_np.astype(np.int32))
    payload = BO.build_sa_payload(
        text_dev, doc_starts_dev, n=n, mark_period=mark_period, ndocs=ndocs)
    payload.block_until_ready()

    def sa_run():
        t0 = time.perf_counter()
        sa, pull = ft.suffix_array(text_dev, payload=payload)
        force((sa, pull))
        return sa, pull, time.perf_counter() - t0

    sa, pull, t_cold = sa_run()
    sa, pull, t_sa = sa_run()
    log(f"SA+pull: {t_sa:.3f}s steady = {mb/t_sa:.1f} MiB/s "
        f"(cold {t_cold:.1f}s)")

    # --- packaging stages ---
    n_seg = n // seg + 1
    n_pad = n_seg * seg
    cap = BO.mark_cap(n, ndocs, mark_period, seg)

    def timeit(name, fn, reps=3):
        out = fn()
        force(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
            force(out)
        dt = (time.perf_counter() - t0) / reps
        log(f"{name}: {dt*1e3:.1f} ms steady")
        return out, dt

    (bwt, bwt_chars, a_row), t_b = timeit(
        "split_pull (fused path)",
        lambda: BO._split_pull(pull, n=n, n_pad=n_pad))
    (C, occ_ckpt, occ_l1), t_o = timeit(
        "occ_stage",
        lambda: BO._occ_stage(bwt_chars, n=n, n_seg=n_seg, seg=seg))
    marks_out, t_m = timeit(
        "marks_finish",
        lambda: BO._marks_finish(
            sa, a_row, n=n, n_pad=n_pad, seg=seg, cap=cap, ndocs=ndocs,
            mark_period=mark_period))

    t_pkg = t_b + t_o + t_m
    log(f"packaging total: {t_pkg:.3f}s -> build total {t_sa+t_pkg:.3f}s "
        f"= {mb/(t_sa+t_pkg):.1f} MiB/s")


if __name__ == "__main__":
    main()
