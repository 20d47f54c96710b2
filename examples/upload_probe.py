"""Probe host->device text-upload cost and transfer/compute overlap.

Questions (answered on the real chip, recorded in PERF.md):
  1. What does a 16 Mi-symbol text upload cost as int32 vs uint16?
  2. Is jax.device_put async on this transport (does a following
     independent device computation overlap the transfer)?

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/upload_probe.py
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    n = 16 << 20
    dev = jax.devices()[0]
    log(f"device: {dev}, n = {n} symbols")

    rng = np.random.default_rng(0)
    t16 = rng.integers(5, 261, size=n).astype(np.uint16)
    t32 = t16.astype(np.int32)

    @jax.jit
    def digest(t):
        return jnp.sum(t.astype(jnp.int32) % 97)

    # busy-work compute, independent of the upload
    m = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))

    @jax.jit
    def busy(m, reps=24):
        def body(c, _):
            return jnp.tanh(c @ m) * 1e-3 + c, None
        out, _ = jax.lax.scan(body, m, None, length=reps)
        return jnp.sum(out)

    _ = float(busy(m))         # compile
    _ = int(digest(jnp.asarray(t16)))   # compile digest for uint16
    _ = int(digest(jnp.asarray(t32)))   # compile digest for int32

    for name, arr in (("int32", t32), ("uint16", t16)):
        for rep in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            t_put = time.perf_counter() - t0
            v = int(digest(d))
            t_all = time.perf_counter() - t0
            log(f"upload {name} rep{rep}: device_put returned {t_put*1e3:.1f} ms,"
                f" materialized {t_all*1e3:.1f} ms ({arr.nbytes/2**20:.0f} MB"
                f" -> {arr.nbytes/2**20/t_all:.0f} MB/s), digest={v}")

    # overlap: put + busy vs busy alone vs a DEDICATED put-alone baseline
    # (not a leaked loop variable, which measured the wrong rep)
    t0 = time.perf_counter()
    s = float(busy(m))
    t_busy = time.perf_counter() - t0
    t0 = time.perf_counter()
    d0 = jax.device_put(t16)
    _ = int(digest(d0))
    t_put_alone = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = jax.device_put(t16)
    s2 = float(busy(m))
    v = int(digest(d))
    t_both = time.perf_counter() - t0
    log(f"busy alone {t_busy*1e3:.1f} ms; put alone {t_put_alone*1e3:.1f} ms;"
        f" put+busy+digest {t_both*1e3:.1f} ms (overlap saves "
        f"{'YES' if t_both < t_busy + 0.8 * t_put_alone else 'no'})")


if __name__ == "__main__":
    main()
