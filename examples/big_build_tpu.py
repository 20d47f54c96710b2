"""Gated >2^31-symbol build on the real TPU, chunk-by-chunk.

The CI-gated test (tests/test_big_corpus.py::test_over_2to31_symbols)
drives the same doc-boundary chunking mechanism with host-numpy text; on
this deployment host->device uploads tunnel through a remote TPU and are
pathologically slow, so this driver synthesizes each chunk's documents ON
DEVICE (the corpus never round-trips), builds each chunk index entirely on
device, queries it, and composes global doc ids/offsets host-side exactly
like MultiIndex does (per-chunk int32 rows, int64 global composition —
the reference handles 512 GiB texts with 39-bit offsets,
/root/reference/src/dcx_cc/index_tool.cc:45-46).

Corpus (mirrors the gated test): BIG_NDOCS docs x 2^BIG_DOC_LOG2 symbols
of zipf English-like text, with a needle planted in docs 0/64/128 at
doc-relative offset 1000+d.  Defaults give 129 * 2^24 = 2.164G symbols.

Run:
    PYTHONPATH=/root/repo:/root/.axon_site python examples/big_build_tpu.py
Smoke test (small):
    BIG_NDOCS=5 BIG_DOC_LOG2=20 BIG_DOCS_PER_CHUNK=2 ... same command
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
    from femto_tpu import search
    from femto_tpu.alphabet import CHARACTER_OFFSET, SEOF, bytes_to_alpha
    from femto_tpu.fmindex import FMIndex, FMMeta
    from femto_tpu.ops.build_ops import (
        build_fm_arrays_device,
        build_sa_payload,
    )
    from femto_tpu.ops.rank import n_segments as R_n_segments

    doc_log2 = int(os.environ.get("BIG_DOC_LOG2", "24"))
    doc_size = 1 << doc_log2
    ndocs = int(os.environ.get("BIG_NDOCS", "129"))
    # 8 docs = 128 MiB chunks: the proven flagship configuration (256 MiB
    # chunks run at the same MiB/s but exhaust HBM to fragmentation after
    # ~8 chunks on a 16 GB chip — measured round 3)
    docs_per_chunk = int(os.environ.get("BIG_DOCS_PER_CHUNK", "8"))
    tier = os.environ.get("BIG_TIER", "packed")
    seg = int(os.environ.get("BIG_SEG", "256"))
    mark_period = int(os.environ.get("BIG_MARK", "20"))
    needle_bytes = b"NEEDLE-XYZZY"   # upper/'-' are outside the zipf set
    needle = bytes_to_alpha(needle_bytes)
    needle_docs = [d for d in (0, 64, 128) if d < ndocs]

    n_total = ndocs * doc_size
    log(f"corpus: {ndocs} docs x {doc_size} = {n_total} symbols "
        f"({n_total / 2**20:.0f} MiB), chunks of {docs_per_chunk} docs, "
        f"tier={tier}")
    dev = jax.devices()[0]
    log(f"device: {dev}")

    @jax.jit
    def fingerprint(tree):
        tot = jnp.int32(0)
        for leaf in jax.tree.leaves(tree):
            idx = tuple(0 for _ in leaf.shape)
            tot = tot + leaf[idx].astype(jnp.int32)
        return tot

    needle_dev = jnp.asarray(needle.astype(np.int32))
    # static per-chunk alphabet: zipf letters + SEOF + needle symbols,
    # plus 0 (the tail chunk's pad symbol — every chunk builds at ONE
    # uniform shape so the whole run compiles once)
    alpha_np = np.unique(np.concatenate([
        np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n", dtype=np.uint8)
        .astype(np.int32) + CHARACTER_OFFSET,
        np.asarray([0, SEOF], dtype=np.int32),
        needle.astype(np.int32)]))

    n_uniform = docs_per_chunk * doc_size

    def gen_chunk(d0: int, ndc: int):
        """Synthesize docs [d0, d0+ndc) on device: zipf letters + SEOF
        trailers + planted needles.  Always returns n_uniform symbols —
        a ragged tail is padded with trailing 0s, the same trailing-
        ESCAPE(0) scheme as the sharded builds (dist_build.py), so the
        tail reuses the uniform chunk's compiled programs (the ragged
        shape previously cost a second 178 s full compile, PERF.md)."""
        n_real = ndc * doc_size

        @jax.jit
        def gen(key):
            letters = jnp.asarray(
                np.frombuffer(b"etaoin shrdlucmfwypvbgkqjxz.,\n",
                              dtype=np.uint8).astype(np.int32)
                + CHARACTER_OFFSET
            )
            probs = 1.0 / np.arange(1, 31, dtype=np.float32)
            logits = jnp.log(jnp.asarray(probs / probs.sum()))
            ix = jax.random.categorical(key, logits, shape=(n_uniform,))
            text = letters[ix]
            pos = jnp.arange(n_uniform, dtype=jnp.int32)
            is_end = pos % doc_size == doc_size - 1
            text = jnp.where(is_end, SEOF, text)
            return jnp.where(pos < n_real, text, 0)

        text = gen(jax.random.PRNGKey(1234 + d0))
        for d in needle_docs:
            if d0 <= d < d0 + ndc:
                off = (d - d0) * doc_size + 1000 + d
                text = jax.lax.dynamic_update_slice(text, needle_dev, (off,))
        return text

    results = []           # (global_doc, doc_off)
    total_count = 0
    t_build_total = 0.0
    t_query_total = 0.0
    t_wall0 = time.perf_counter()

    d0 = 0
    chunk_i = 0
    while d0 < ndocs:
        ndc = min(docs_per_chunk, ndocs - d0)
        n_c = ndc * doc_size
        text = gen_chunk(d0, ndc)
        _ = int(text[0])  # force (block_until_ready returns early here)

        t0 = time.perf_counter()
        doc_starts_np = np.arange(ndc + 1, dtype=np.int64) * doc_size
        # uniform build shapes: doc_starts padded with degenerate empty
        # docs (duplicate n_c boundaries), text with trailing 0s
        doc_starts_pad = np.full(docs_per_chunk + 1, n_c, np.int32)
        doc_starts_pad[: ndc + 1] = doc_starts_np
        doc_starts_dev = jnp.asarray(doc_starts_pad)
        profile = os.environ.get("BIG_PROFILE", "") != ""
        payload = build_sa_payload(
            text, doc_starts_dev, n=n_uniform, mark_period=mark_period,
            ndocs=docs_per_chunk)
        sa, pull = ft.suffix_array(
            text, payload=payload, alpha=alpha_np,
            n_real=n_c if n_c < n_uniform else None)
        if profile:
            _ = int(fingerprint((sa, pull)))
            t_sa = time.perf_counter() - t0
        arrays, n_marks, alpha_used = build_fm_arrays_device(
            text, sa, doc_starts_dev, n=n_uniform, seg=seg,
            mark_period=mark_period, ndocs=docs_per_chunk, tier=tier,
            pull=pull, alpha=alpha_np)
        _ = int(fingerprint(arrays))
        dt_build = time.perf_counter() - t0
        if profile:
            log(f"  profile: sa {t_sa:.2f}s "
                f"({n_uniform / 2**20 / t_sa:.1f} MiB/s), "
                f"packaging {dt_build - t_sa:.2f}s")
        t_build_total += dt_build

        # free the build intermediates before querying
        del text, payload, sa, pull
        meta = FMMeta(n=n_c, seg=seg, mark_period=mark_period, num_docs=ndc,
                      n_marks=int(n_marks), n_seg=int(R_n_segments(arrays)),
                      alpha_used=alpha_used,
                      n_rows=n_uniform, row0=n_uniform - n_c)
        index = FMIndex(arrays=arrays, meta=meta, doc_starts_np=doc_starts_np,
                        infos=[b"doc%d" % (d0 + i) for i in range(ndc)])

        t0 = time.perf_counter()
        cnt = int(search.count(index, [needle_bytes])[0])
        total_count += cnt
        for doc, off in search.locate(index, needle_bytes):
            results.append((doc + d0, int(off)))
        dt_query = time.perf_counter() - t0
        t_query_total += dt_query

        log(f"chunk {chunk_i}: docs [{d0},{d0+ndc}) n={n_c} "
            f"build {dt_build:.2f}s ({n_c / 2**20 / dt_build:.1f} MiB/s) "
            f"query {dt_query:.2f}s count={cnt}")
        del index, arrays
        d0 += ndc
        chunk_i += 1

    t_wall = time.perf_counter() - t_wall0
    results.sort()
    expect = [(d, 1000 + d) for d in needle_docs]
    ok = (results == expect) and (total_count == len(needle_docs))
    log(f"locate results: {results} (expected {expect})")
    log(f"total: {n_total} symbols (> 2^31: {n_total > 2**31}), "
        f"{chunk_i} chunks, build {t_build_total:.1f}s "
        f"({n_total / 2**20 / t_build_total:.1f} MiB/s aggregate), "
        f"query {t_query_total:.1f}s, wall {t_wall:.1f}s")
    if not ok:
        log("MISMATCH")
        sys.exit(1)
    log("OK")


if __name__ == "__main__":
    main()
