"""End-to-end femto_tpu demo: build an index and run every query family.

Usage: python examples/demo.py [--mb 8]
Synthesizes an english-like corpus on device (fast in tunneled
environments), builds the index, then demonstrates count, locate, extract,
context, regex, approximate, Boolean, common-substrings, and the server
protocol. Prints timings for each family.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=4.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import femto_tpu as ft
    from femto_tpu.alphabet import CHARACTER_OFFSET, SEOF
    from femto_tpu.fmindex import FMIndex, FMMeta
    from femto_tpu.ops.build_ops import build_fm_arrays_device

    def stamp(msg, t0):
        print(f"  [{time.perf_counter()-t0:6.2f}s] {msg}", flush=True)

    t0 = time.perf_counter()
    n = int(args.mb * (1 << 20))
    doc_size = 1 << 14
    ndocs = -(-n // doc_size)
    doc_starts_np = np.minimum(np.arange(ndocs + 1, dtype=np.int64) * doc_size, n)

    words = (b"the quick brown fox jumps over lazy dogs while banana "
             b"bandana republic ships quantum suffix arrays ")
    reps = -(-n // len(words))
    corpus = (words * reps)[:n]
    # per-doc terminators
    buf = bytearray(corpus)
    for i in range(1, ndocs + 1):
        buf[min(i * doc_size, n) - 1] = 0x0A
    docs = [bytes(buf[doc_starts_np[i]: doc_starts_np[i + 1] - 1])
            for i in range(ndocs)]
    prepared = ft.prepare_documents(docs)
    stamp(f"prepared {ndocs} docs, n={prepared.n}", t0)

    index = ft.build_index(prepared)
    stamp("index built (suffix sort + device packaging)", t0)

    counts = ft.count(index, [b"quantum", b"banana", b"fox", b"zebra"])
    stamp(f"count quantum/banana/fox/zebra = {counts.tolist()}", t0)

    hits = ft.locate(index, b"quantum suffix", max_matches=5)
    stamp(f"locate 'quantum suffix' (first 5) = {hits}", t0)

    doc0 = ft.extract_document(index, 0)
    stamp(f"extract doc0[:40] = {doc0[:40]!r}", t0)

    f, l = ft.count_ranges(index, [b"bandana"])
    ctx = ft.extract_context(index, int(f[0]), before=10, pattern_len=7, after=10)
    stamp(f"context = {ctx!r}", t0)

    from femto_tpu.query.engine import count_query, docs_query, find_strings

    stamp(f"regex ban(ana|dana) = {count_query(index, 'ban(ana|dana)')}", t0)
    ms = find_strings(index, "APPROX 1 quamtum")
    stamp(f"approx 'quamtum' -> {sorted({m.match for m in ms})[:3]}", t0)
    bq = docs_query(index, "quantum AND banana", max_matches=3)
    stamp(f"boolean docs = {[i.decode() for _, i, _ in bq][:3]}", t0)

    from femto_tpu.tools import common_substrings

    cs = common_substrings(index, length=6, top_k=3)
    stamp(f"common 6-grams = {cs}", t0)

    from femto_tpu.server.server import FemtoServer

    srv = FemtoServer(index)
    try:
        import json

        r = json.loads(srv.request("find_docs 2 1 quantum"))
        stamp(f"server find_docs -> {len(r['results'])} docs", t0)
    finally:
        srv.stop()
    print("DEMO COMPLETE", flush=True)


if __name__ == "__main__":
    main()
