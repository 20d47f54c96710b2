"""Benchmark: batched FM backward-search throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is LF/backward-search steps per second per chip — the
reference's batched count-query throughput axis (doc/femto.pdf §4.1 Fig. 4);
BASELINE.md sets the target at >= 10M steps/s/chip.  One "step" = one
pattern-character advance of one query = 2 rank(c, r) lookups.

Timing methodology: the execution environment may pipeline/queue remote
dispatches, so every timed loop carries a data dependency from iteration to
iteration (a scalar accumulator folded into the next input) and ends with a
host materialization of that scalar — wall-clock therefore covers real
end-to-end execution, not queue insertion.

Extra diagnostics (build rate, locate rate) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(mb: float) -> bytes:
    """Deterministic english-like synthetic corpus."""
    rng = np.random.default_rng(1234)
    n = int(mb * (1 << 20))
    letters = np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
    probs = 1.0 / np.arange(1, len(letters) + 1)
    probs /= probs.sum()
    return rng.choice(letters, size=n, p=probs).astype(np.uint8).tobytes()


def main():
    import jax
    import jax.numpy as jnp

    import femto_tpu as ft
    from femto_tpu.alphabet import pattern_to_alpha
    from femto_tpu.ops.search_ops import backward_search, locate_rows
    from femto_tpu.search import pack_patterns

    mb = float(os.environ.get("BENCH_MB", "32"))
    B = int(os.environ.get("BENCH_BATCH", "8192"))
    P = int(os.environ.get("BENCH_PATLEN", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    dev = jax.devices()[0]
    log(f"device: {dev}, corpus {mb} MiB, batch {B}, patlen {P}")

    corpus = make_corpus(mb)
    doc_size = 1 << 16
    docs = [corpus[i : i + doc_size] for i in range(0, len(corpus), doc_size)]
    prepared = ft.prepare_documents(docs)

    # --- suffix array: cold (compile) then steady with a hard barrier ---
    text_dev = jnp.asarray(prepared.text.astype(np.int32))

    def sa_barrier():
        sa = ft.suffix_array(text_dev)
        # scalar dependency on the full result, materialized on host
        return sa, int(jnp.sum(sa.astype(jnp.int64) & 1))

    t0 = time.perf_counter()
    sa, _ = sa_barrier()
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sa, _ = sa_barrier()
    t_sa = time.perf_counter() - t0
    log(f"suffix array: {t_sa:.2f}s steady ({mb / t_sa:.2f} MiB/s on-device; "
        f"cold incl. compile {t_cold:.2f}s)")

    t0 = time.perf_counter()
    index = ft.build_index(prepared, sa=sa)
    t_build = time.perf_counter() - t0
    log(f"index packaging (incl. compile): {t_build:.2f}s; "
        f"steady total build ~{mb/(t_sa+t_build):.2f} MiB/s")

    # --- backward search: chained iterations ---
    rng = np.random.default_rng(99)
    starts = rng.integers(0, len(corpus) - P, size=B)
    pats = [pattern_to_alpha(corpus[s : s + P]) for s in starts]
    packed, _ = pack_patterns(pats, pad_b=B)
    packed_dev = jnp.asarray(packed)

    n = index.meta.n
    arrays = index.arrays

    @jax.jit
    def count_step(arrays, pats, acc):
        # fold the accumulator into the input so iterations chain
        pats = pats + jnp.minimum(acc, 0).astype(jnp.int32)
        first, last = backward_search(arrays, n, pats)
        return acc + jnp.sum(last - first), first, last

    acc = jnp.int32(0)
    acc, f, l = count_step(arrays, packed_dev, acc)  # compile
    _ = int(acc)

    acc = jnp.int32(0)
    t0 = time.perf_counter()
    for _i in range(iters):
        acc, f, l = count_step(arrays, packed_dev, acc)
    _ = int(acc)  # host materialization barrier
    dt = time.perf_counter() - t0
    steps = B * packed.shape[1] * iters
    sps = steps / dt
    log(f"backward search: {sps/1e6:.2f}M steps/s/chip "
        f"({dt/iters*1e3:.1f} ms per {B}x{packed.shape[1]} batch)")

    # --- locate: chained ---
    mark_period = index.meta.mark_period
    rows_np = rng.integers(0, n, size=4096).astype(np.int32)
    rows = jnp.asarray(rows_np)

    @jax.jit
    def loc_step(arrays, rows, acc):
        rows = rows + jnp.minimum(acc, 0).astype(jnp.int32)
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
    log(f"locate: {5*4096/(time.perf_counter()-t0)/1e3:.1f}K rows/s")

    target = 1e7  # BASELINE.md: >= 10M steps/s/chip
    print(json.dumps({
        "metric": "backward_search_steps_per_sec_per_chip",
        "value": sps,
        "unit": "steps/s",
        "vs_baseline": sps / target,
    }))


if __name__ == "__main__":
    main()
