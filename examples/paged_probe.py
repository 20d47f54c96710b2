"""Paged-tier degradation curve on the real chip (VERDICT r4 #5):
count + locate throughput of a flat vrle index served RESIDENT vs PAGED
at budgets of ~1/2 and ~1/4 of the row store, plus fault statistics.

Usage: python examples/paged_probe.py [--mb 64] [--batch 8192]
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import femto_tpu as ft  # noqa: E402
from femto_tpu.paged import load_paged  # noqa: E402
from femto_tpu.search import count_ranges, locate_rows_array  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=64.0)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--patlen", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--seg", type=int, default=1024)
    args = ap.parse_args()

    from corpus_real import english_prose

    buf = english_prose(args.mb)
    docs = [buf[i:i + 65536] for i in range(0, len(buf), 65536)]
    prep = ft.prepare_documents(docs)
    n = prep.n
    log(f"corpus {n/2**20:.1f} MiB prose, device {jax.devices()[0]}")
    ix = ft.build_index(prep, tier="vrle", seg=args.seg, mark_period=20)

    rng = np.random.default_rng(11)
    B, PL = args.batch, args.patlen
    tn = np.asarray(prep.text)
    starts = rng.integers(0, n - PL - 1, size=B)
    pats = [bytes((tn[s:s + PL] - 5).astype(np.uint8)) for s in starts]
    rows = rng.integers(0, n, size=4096).astype(np.int32)

    # resident baseline
    f, l = count_ranges(ix, pats)  # warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        f, l = count_ranges(ix, pats)
    dt = (time.perf_counter() - t0) / args.iters
    res_sps = B * PL / dt
    offs_res = locate_rows_array(ix, rows)
    t0 = time.perf_counter()
    offs_res = locate_rows_array(ix, rows)
    res_lps = len(rows) / (time.perf_counter() - t0)
    log(f"resident: count {res_sps/1e6:.2f}M steps/s, "
        f"locate {res_lps/1e3:.0f}K rows/s")

    td = tempfile.mkdtemp()
    p = os.path.join(td, "idx.ftpu")
    ix.save_flat(p)
    meta, infos, arrs = ft.FMIndex.parse_flat(p)
    bwt_bytes = arrs["bwt"].nbytes
    resident_b = sum(v.nbytes for k, v in arrs.items() if k != "bwt")
    n_seg = arrs["bwt"].shape[0]
    log(f"index: rows {bwt_bytes/2**20:.1f} MiB + resident "
        f"{resident_b/2**20:.1f} MiB, {n_seg} segments")

    for frac in (2, 4):
        pg = load_paged(p, budget_bytes=resident_b + n_seg * 4
                        + bwt_bytes // frac)
        log(f"--- paged 1/{frac}: cache {pg.cache_rows}/{n_seg} rows ---")
        f2, l2 = pg.count_ranges(pats)   # cold pass (faults)
        assert (f2 == f).all() and (l2 == l).all(), "count mismatch"
        cold = dict(pg.stats)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            f2, l2 = pg.count_ranges(pats)
        dt = (time.perf_counter() - t0) / args.iters
        warm = dict(pg.stats)
        log(f"  count {B*PL/dt/1e6:.2f}M steps/s warm "
            f"({100*B*PL/dt/res_sps:.0f}% of resident); cold faults "
            f"{cold['faults']} ({cold['fetched_bytes']/2**20:.1f} MiB), "
            f"warm faults/pass "
            f"{(warm['faults']-cold['faults'])//args.iters}")
        offs_p = pg.locate_rows_array(rows)
        assert (offs_p == np.asarray(offs_res)).all(), "locate mismatch"
        t0 = time.perf_counter()
        offs_p = pg.locate_rows_array(rows)
        lps = len(rows) / (time.perf_counter() - t0)
        log(f"  locate {lps/1e3:.0f}K rows/s "
            f"({100*lps/res_lps:.0f}% of resident)")


if __name__ == "__main__":
    main()
