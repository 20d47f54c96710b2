"""Corpora beyond one index's 2^31-symbol ceiling (VERDICT round-1 item 6).

Mechanism tests run in CI with an artificially small chunk limit; the real
>2^31 build is gated behind FEMTO_TPU_BIG_TESTS=1 (tens of minutes on the
CPU backend) — its measured result is recorded in PERF.md.
"""

import os
import tempfile

import numpy as np
import pytest

import femto_tpu as ft
from femto_tpu.multi import MultiIndex, build_chunked_prepared
from tests.oracle import naive_count, naive_locate


def test_chunked_prepared_mechanism(rng):
    """Doc-boundary chunking + global int64 doc/offset composition and
    MultiIndex save/load, with a tiny chunk limit standing in for 2^31."""
    docs = [bytes(rng.integers(97, 103, size=int(rng.integers(50, 400)))
                  .astype(np.uint8)) for _ in range(12)]
    prepared = ft.prepare_documents(docs)
    mi = build_chunked_prepared(prepared, max_chunk_symbols=700,
                                seg=64, mark_period=8)
    assert len(mi.indexes) >= 3  # actually chunked
    assert mi.n == prepared.n
    for pat in [b"ab", b"ba", docs[5][:4], b"zzz"]:
        assert int(mi.count([pat])[0]) == naive_count(docs, pat)
        assert mi.locate(pat) == naive_locate(docs, pat)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "multi")
        mi.save(p)
        mi2 = MultiIndex.load(p)
        assert int(mi2.count([b"ab"])[0]) == naive_count(docs, b"ab")
        # CLI loader dispatches on the manifest
        from femto_tpu.cli import _load_index

        got = _load_index(p)
        assert isinstance(got, MultiIndex)


def test_chunked_oversized_doc_raises(rng):
    docs = [b"x" * 300]
    prepared = ft.prepare_documents(docs)
    with pytest.raises(ValueError):
        build_chunked_prepared(prepared, max_chunk_symbols=100)


@pytest.mark.skipif(not os.environ.get("FEMTO_TPU_BIG_TESTS"),
                    reason="set FEMTO_TPU_BIG_TESTS=1 (slow: >2^31 build)")
def test_over_2to31_symbols():
    """Build + query a synthetic corpus with n > 2^31 total symbols via
    chunked int32 indexes (reference: 39-bit offsets for 512 GiB texts,
    index_tool.cc:45-46)."""
    from femto_tpu.alphabet import PreparedText, SEOF, bytes_to_alpha

    doc_size = 1 << 24            # 16 Mi symbols per doc (incl. SEOF)
    ndocs = 129                   # total = 129 * 2^24 > 2^31
    rng = np.random.default_rng(7)
    base = rng.integers(97, 123, size=doc_size - 1).astype(np.uint16) + 5
    needle = bytes_to_alpha(b"NEEDLE-XYZZY")
    text = np.empty(ndocs * doc_size, dtype=np.uint16)
    for d in range(ndocs):
        seg = base.copy()
        if d in (0, 64, 128):     # plant the needle in 3 docs
            seg[1000 + d: 1000 + d + len(needle)] = needle
        text[d * doc_size: (d + 1) * doc_size - 1] = seg
        text[(d + 1) * doc_size - 1] = SEOF
    n = ndocs * doc_size
    assert n > 2**31
    prepared = PreparedText(
        text=text,
        doc_starts=np.arange(ndocs + 1, dtype=np.int64) * doc_size,
        infos=[b"doc%d" % d for d in range(ndocs)],
    )
    mi = build_chunked_prepared(prepared, max_chunk_symbols=2**28,
                                seg=256, mark_period=20)
    assert mi.n == n > 2**31
    got = mi.locate(b"NEEDLE-XYZZY")
    assert [d for d, _ in got] == [0, 64, 128]
    offs = {d: o for d, o in got}
    assert offs[0] == 1000 and offs[64] == 1064 and offs[128] == 1128
    assert int(mi.count([b"NEEDLE-XYZZY"])[0]) == 3
