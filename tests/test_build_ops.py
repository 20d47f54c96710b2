"""Device index assembly must match the numpy reference packaging."""

import numpy as np

import femto_tpu as ft


def test_device_build_matches_host(rng):
    docs = [
        b"",
        b"banana banana",
        bytes(rng.integers(0, 256, size=700).astype(np.uint8)),
        b"aaaaaaaaaaaaaaaa",
    ]
    prepared = ft.prepare_documents(docs)
    ih = ft.build_index(prepared, seg=64, mark_period=8, device_build=False)
    idv = ft.build_index(prepared, seg=64, mark_period=8, device_build=True)

    np.testing.assert_array_equal(np.asarray(ih.arrays.bwt), np.asarray(idv.arrays.bwt))
    np.testing.assert_array_equal(np.asarray(ih.arrays.occ_ckpt), np.asarray(idv.arrays.occ_ckpt))
    np.testing.assert_array_equal(np.asarray(ih.arrays.C), np.asarray(idv.arrays.C))
    np.testing.assert_array_equal(np.asarray(ih.arrays.mark_bits), np.asarray(idv.arrays.mark_bits))
    np.testing.assert_array_equal(np.asarray(ih.arrays.mark_ckpt), np.asarray(idv.arrays.mark_ckpt))
    nm = ih.meta.n_marks
    assert idv.meta.n_marks == nm
    # host and device pack mark values with identical geometry, so the
    # packed stores (and their int32[5] geometry headers) match verbatim
    np.testing.assert_array_equal(
        np.asarray(ih.arrays.mark_meta), np.asarray(idv.arrays.mark_meta)
    )
    np.testing.assert_array_equal(
        np.asarray(ih.arrays.mark_vals), np.asarray(idv.arrays.mark_vals)
    )
    np.testing.assert_array_equal(
        np.asarray(ih.arrays.doc_seof_rows), np.asarray(idv.arrays.doc_seof_rows)
    )
    # query parity
    pats = [b"banana", b"a", b"\x00", b"zz"]
    np.testing.assert_array_equal(ft.count(ih, pats), ft.count(idv, pats))
    assert ft.locate(ih, b"banana") == ft.locate(idv, b"banana")


def test_compact_tier_matches(rng):
    import femto_tpu as ft
    from tests.oracle import naive_count, naive_locate

    docs = [
        b"banana banana",
        bytes(rng.integers(0, 256, size=9000).astype(np.uint8)),
        b"compact tier check",
    ]
    prepared = ft.prepare_documents(docs)
    full = ft.build_index(prepared, seg=64, mark_period=8)
    comp = ft.build_index(prepared, seg=64, mark_period=8, compact=True)
    assert str(comp.arrays.occ_ckpt.dtype) == "uint16"
    pats = [b"banana", b"tier", b"\x00", b"zz"]
    np.testing.assert_array_equal(ft.count(full, pats), ft.count(comp, pats))
    assert ft.locate(comp, b"banana") == naive_locate(docs, b"banana")
    assert ft.extract_document(comp, 2) == docs[2]
    # psi/context path exercises select through the compact tier
    f, l = ft.count_ranges(comp, [b"tier"])
    ctx = ft.extract_context(comp, int(f[0]), before=8, pattern_len=4, after=6)
    assert ctx == b"compact tier check"


def test_packed_tier_matches(rng):
    """Packed tier (dense alphabet + bit-packed BWT words) must answer
    every query identically to the full tier, including for a corpus using
    all 256 byte values (K == max)."""
    import tempfile, os
    from tests.oracle import naive_locate

    docs = [
        b"banana banana",
        bytes(rng.integers(0, 256, size=9000).astype(np.uint8)),
        b"packed tier check",
        bytes(range(256)),
    ]
    prepared = ft.prepare_documents(docs)
    full = ft.build_index(prepared, seg=64, mark_period=8)
    pk = ft.build_index(prepared, seg=64, mark_period=8, tier="packed")
    assert str(pk.arrays.bwt.dtype) == "uint32"
    assert pk.meta.alpha_used > 0
    pats = [b"banana", b"tier", b"\x00", b"zz", b"ck", bytes([7, 8, 9])]
    np.testing.assert_array_equal(ft.count(full, pats), ft.count(pk, pats))
    assert ft.locate(pk, b"banana") == naive_locate(docs, b"banana")
    for d in range(4):
        assert ft.extract_document(pk, d) == docs[d]
    f, l = ft.count_ranges(pk, [b"tier"])
    ctx = ft.extract_context(pk, int(f[0]), before=7, pattern_len=4, after=6)
    assert ctx == b"packed tier check"
    # save/load roundtrip keeps the tier
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "idx.ftpu")
        pk.save_flat(p)
        pk2 = ft.FMIndex.load(p)
        assert str(pk2.arrays.bwt.dtype) == "uint32"
        np.testing.assert_array_equal(ft.count(pk2, pats), ft.count(pk, pats))


def test_packed_tier_small_alphabet(rng):
    """DNA-like corpus: tiny dense alphabet packs many codes per word."""
    docs = [bytes(rng.choice([65, 67, 71, 84], size=5000).astype(np.uint8))
            for _ in range(3)]
    prepared = ft.prepare_documents(docs)
    pk = ft.build_index(prepared, seg=64, mark_period=8, tier="packed")
    full = ft.build_index(prepared, seg=64, mark_period=8)
    # alphabet = ACGT + SEOF + EOF (+ maybe doc-id chars)
    assert pk.meta.alpha_used <= 16
    pats = [b"ACGT", b"GGG", b"TTTT", b"AC"]
    np.testing.assert_array_equal(ft.count(full, pats), ft.count(pk, pats))
    assert ft.extract_document(pk, 1) == docs[1]
    # index size: packed BWT must be < half the dense uint16 BWT
    assert pk.arrays.bwt.size * 4 < full.arrays.bwt.size * 2 / 2


def test_vseg_tier_matches(rng):
    """vseg tier (per-segment dense remap at per-segment bit width + int8
    interpolated checkpoints — the compressed serving tier) must answer
    every query identically to the full tier, including byte-complete
    corpora (dense K > 256: 9-bit identity segments, uint16 symbol
    lists).  Behavioral stand-in for the reference's RLE-gamma/Huffman
    wavelet tree (wtree.c:359-770)."""
    import tempfile, os
    from tests.oracle import naive_locate

    docs = [
        b"banana banana",
        bytes(rng.integers(0, 256, size=9000).astype(np.uint8)),
        b"vseg tier check",
        bytes(range(256)),
        b"a" * 500,                       # constant segments (w == 0/1)
    ]
    prepared = ft.prepare_documents(docs)
    full = ft.build_index(prepared, seg=64, mark_period=8)
    vs = ft.build_index(prepared, seg=64, mark_period=8, tier="vseg")
    assert vs.arrays.bwt.ndim == 2 and str(vs.arrays.bwt.dtype) == "uint32"
    assert vs.arrays.seg_nsym is not None
    # byte-complete docs force overflow/identity segments into the side
    # table (9-bit global codes, uint16 symbol lists)
    assert vs.arrays.seg_ovf.shape[0] > 1
    pats = [b"banana", b"tier", b"\x00", b"zz", b"ck", bytes([7, 8, 9]),
            b"aaaa"]
    np.testing.assert_array_equal(ft.count(full, pats), ft.count(vs, pats))
    assert ft.locate(vs, b"banana") == naive_locate(docs, b"banana")
    for d in range(len(docs)):
        assert ft.extract_document(vs, d) == docs[d]
    f, l = ft.count_ranges(vs, [b"tier"])
    ctx = ft.extract_context(vs, int(f[0]), before=5, pattern_len=4, after=6)
    assert ctx == b"vseg tier check"
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "idx.ftpu")
        vs.save_flat(p)
        vs2 = ft.FMIndex.load(p)
        assert vs2.arrays.seg_nsym is not None
        np.testing.assert_array_equal(ft.count(vs2, pats), ft.count(vs, pats))


def test_vseg_tier_smaller(rng):
    """On a small-alphabet (DNA-like) corpus the vseg tier's BWT stream
    must land well under the packed tier's fixed-width words (per-segment
    widths: pure-ACGT segments pack at 2 bits)."""
    docs = [bytes(rng.choice([65, 67, 71, 84], size=20000).astype(np.uint8))
            for _ in range(3)]
    prepared = ft.prepare_documents(docs)
    # seg=512 is the vseg sweet spot (per-row syms/marks overheads halve)
    vs = ft.build_index(prepared, seg=512, mark_period=20, tier="vseg")
    pk = ft.build_index(prepared, seg=512, mark_period=20, tier="packed")
    full = ft.build_index(prepared, seg=512, mark_period=20)
    pats = [b"ACGT", b"GGG", b"TTTT", b"AC"]
    np.testing.assert_array_equal(ft.count(full, pats), ft.count(vs, pats))
    assert ft.locate(vs, b"GGG") == ft.locate(full, b"GGG")
    # v3 rows carry syms+marks+ckpts too, so compare whole-index bytes
    def total_bytes(ix):
        return sum(np.asarray(getattr(ix.arrays, f)).nbytes
                   for f in ix.arrays._fields
                   if getattr(ix.arrays, f) is not None)

    assert total_bytes(vs) < total_bytes(pk), (total_bytes(vs),
                                               total_bytes(pk))


def test_doc_lists_device_parity(rng):
    """The device chunk-doc-lists pass must reproduce the host numpy pass
    exactly, including under pad_shape (which the host pass never
    supported — VERDICT r2 item 7)."""
    from femto_tpu.fmindex import compute_chunk_doc_lists
    from femto_tpu.suffix import suffix_array

    docs = [bytes(rng.integers(97, 105, size=int(rng.integers(40, 400)))
                  .astype(np.uint8)) for _ in range(9)]
    prepared = ft.prepare_documents(docs)
    ix_host = ft.build_index(prepared, seg=64, mark_period=8,
                             device_build=False, doc_chunks=True)
    ix_dev = ft.build_index(prepared, seg=64, mark_period=8,
                            doc_chunks=True)
    np.testing.assert_array_equal(ix_dev.chunk_doc_offsets_np,
                                  ix_host.chunk_doc_offsets_np)
    np.testing.assert_array_equal(ix_dev.chunk_docs_np,
                                  ix_host.chunk_docs_np)
    # pad_shape + doc_chunks now compose; doc lists describe the padded
    # row space (pad rows contribute nothing)
    ix_pad = ft.build_index(prepared, seg=64, mark_period=8,
                            doc_chunks=True,
                            pad_shape=(prepared.n + 333,
                                       prepared.num_docs + 2))
    assert ix_pad.chunk_docs_np is not None
    from femto_tpu.search import range_docs
    f, l = ft.count_ranges(ix_pad, [docs[3][:4]])
    want = range_docs(ix_dev, *map(int, ft.count_ranges(ix_dev,
                                                        [docs[3][:4]])))
    got = range_docs(ix_pad, int(f[0]), int(l[0]))
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_docs_only_skips_whole_segment_locate(rng, monkeypatch):
    """Docs-only queries on a doc_chunks index must serve whole segments
    from the chunk doc-lists: per-row locate is only allowed on the two
    segment-edge slivers (reference whole-chunk path server.c:4549)."""
    import femto_tpu.search as S

    docs = [bytes(rng.integers(97, 100, size=2000).astype(np.uint8))
            for _ in range(6)]
    prepared = ft.prepare_documents(docs)
    ix = ft.build_index(prepared, seg=64, mark_period=8, doc_chunks=True)
    located_rows = []
    orig = S.locate_range

    def counting(index, first, last, *a, **k):
        located_rows.append(last - first)
        return orig(index, first, last, *a, **k)

    monkeypatch.setattr(S, "locate_range", counting)
    from femto_tpu.query.engine import docs_query

    res = docs_query(ix, "'aa'", with_offsets=False)
    want = {i for i, d in enumerate(docs) if b"aa" in d}
    assert {d for d, _, _ in res} == want
    total = ft.count(ix, [b"aa"])[0]
    assert total > 500
    # edges only: at most 2 partial segments per interval
    assert sum(located_rows) < 4 * 64, (sum(located_rows), int(total))


def test_alpha_path_matches_histogram_path(rng):
    """Passing the host-known alphabet must produce byte-identical arrays
    to the device-histogram path (review r3: a tautological pad guard used
    to inflate K by a phantom 0 code on every host-alpha build)."""
    import jax.numpy as jnp
    from femto_tpu.ops.build_ops import (
        build_fm_arrays_device, build_sa_payload,
    )
    from femto_tpu.suffix import suffix_array

    docs = [bytes(rng.integers(97, 112, size=3000).astype(np.uint8))]
    prepared = ft.prepare_documents(docs)
    n = prepared.n
    text = jnp.asarray(prepared.text.astype(np.int32))
    ds = jnp.asarray(prepared.doc_starts.astype(np.int32))
    alpha = np.nonzero(np.bincount(prepared.text, minlength=512))[0] \
        .astype(np.int32)
    payload = build_sa_payload(text, ds, n=n, mark_period=8, ndocs=1)
    sa, pull = suffix_array(text, payload=payload, alpha=alpha)
    for tier in ("packed", "vseg"):
        a1, m1, k1 = build_fm_arrays_device(
            text, sa, ds, n=n, seg=64, mark_period=8, ndocs=1, tier=tier,
            pull=pull, alpha=alpha)
        a2, m2, k2 = build_fm_arrays_device(
            text, sa, ds, n=n, seg=64, mark_period=8, ndocs=1, tier=tier,
            pull=pull, alpha=None)
        assert k1 == k2, (tier, k1, k2)
        for f in a1._fields:
            v1, v2 = getattr(a1, f), getattr(a2, f)
            if v1 is None:
                assert v2 is None
                continue
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2),
                                          err_msg=f"{tier}.{f}")


def test_packed_mark_store_roundtrip(rng):
    """Device pack -> rank.mark_offset decode is the identity on every
    slot, for grid values, exceptions (non-grid doc starts/SEOFs), and
    empty slots alike."""
    import jax.numpy as jnp
    from femto_tpu.fmindex import FMArrays
    from femto_tpu.ops.build_ops import _pack_mark_vals, mark_pack_geom
    from femto_tpu.ops.rank import mark_offset

    n, period, ndocs = 1_000_000, 20, 50
    cap = 512
    bits, exc_base, exc_cap, n_words = mark_pack_geom(n, period, ndocs, cap)
    vals = np.full(cap, -1, np.int32)
    n_real = 300
    # grid values (multiples of period) with scattered exceptions
    vals[:n_real] = (
        rng.integers(0, n // period, size=n_real).astype(np.int32) * period
    )
    exc_pos = rng.choice(n_real, size=40, replace=False)
    vals[exc_pos] = rng.integers(0, n, size=40).astype(np.int32) | 1
    packed, meta = _pack_mark_vals(
        jnp.asarray(vals), cap=cap, bits=bits, exc_base=exc_base,
        exc_cap=exc_cap, period=period, n_words=n_words)
    dummy = jnp.zeros((1, 32), jnp.uint32)
    arrays = FMArrays(
        bwt=dummy, occ_ckpt=dummy, occ_l1=dummy, C=dummy,
        mark_bits=dummy, mark_ckpt=dummy, mark_vals=packed,
        doc_starts=dummy, doc_seof_rows=dummy, alpha_map=dummy,
        alpha_rev=dummy, mark_meta=meta)
    out = np.asarray(mark_offset(arrays, jnp.arange(n_real, dtype=jnp.int32)))
    np.testing.assert_array_equal(out, vals[:n_real])

    # host packing produces the identical store
    from femto_tpu.ops.build_ops import pack_mark_vals_np
    packed_np, meta_np = pack_mark_vals_np(
        vals[:n_real].astype(np.int64), n=n, period=period, ndocs=ndocs,
        cap=cap)
    np.testing.assert_array_equal(np.asarray(packed), packed_np)
    np.testing.assert_array_equal(np.asarray(meta), meta_np)


def test_vrle_tier_matches(rng):
    """vrle tier (RLE-slot rows + fixed-width fallback + side table) must
    answer every query identically to the full tier, across run-heavy
    text, binary bytes, constant docs, and byte-complete docs."""
    import tempfile, os
    from tests.oracle import naive_locate

    docs = [
        b"banana banana bananas in pajamas " * 40,
        bytes(rng.integers(0, 256, size=6000).astype(np.uint8)),
        b"vrle tier check",
        bytes(range(256)),
        b"a" * 2000,                      # one-run segments
    ]
    prepared = ft.prepare_documents(docs)
    full = ft.build_index(prepared, seg=128, mark_period=8)
    vr = ft.build_index(prepared, seg=128, mark_period=8, tier="vrle")
    assert vr.arrays.seg_rle is not None
    woff = np.asarray(vr.arrays.seg_woff)
    assert (woff < 0).any(), "expected RLE-mode segments on run-heavy text"
    pats = [b"banana", b"tier", b"\x00", b"zz", b"ck", bytes([7, 8, 9]),
            b"aaaa", b"pajamas"]
    np.testing.assert_array_equal(ft.count(full, pats), ft.count(vr, pats))
    assert ft.locate(vr, b"banana") == naive_locate(docs, b"banana")
    for d in range(len(docs)):
        assert ft.extract_document(vr, d) == docs[d]
    f, l = ft.count_ranges(vr, [b"tier"])
    ctx = ft.extract_context(vr, int(f[0]), before=5, pattern_len=4, after=6)
    assert ctx == b"vrle tier check"
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "idx.ftpu")
        vr.save_flat(p)
        vr2 = ft.FMIndex.load(p)
        assert vr2.arrays.seg_rle is not None
        np.testing.assert_array_equal(ft.count(vr2, pats), ft.count(vr, pats))


def test_vrle_tier_smaller_on_runs(rng):
    """On run-structured text (the shape of real BWTs: mean run 3.5-4.2 on
    code/prose) the vrle tier must beat the fixed-width vseg tier."""
    words = [b"the ", b"of ", b"and ", b"compression ", b"index ",
             b"segment ", b"query ", b"locate "]
    docs = []
    for _ in range(6):
        docs.append(b"".join(words[j] for j in
                             rng.integers(0, 8, size=4000)))
    prepared = ft.prepare_documents(docs)
    vr = ft.build_index(prepared, seg=512, mark_period=20, tier="vrle")
    vs = ft.build_index(prepared, seg=512, mark_period=20, tier="vseg")
    pats = [b"the compression", b"query locate", b"of and"]
    np.testing.assert_array_equal(ft.count(vs, pats), ft.count(vr, pats))

    def total_bytes(ix):
        return sum(np.asarray(getattr(ix.arrays, f)).nbytes
                   for f in ix.arrays._fields
                   if getattr(ix.arrays, f) is not None)

    assert total_bytes(vr) < total_bytes(vs), (total_bytes(vr),
                                               total_bytes(vs))


def test_vrle_continuation_rows():
    """Real English text produces continuation rows at small segments
    (RLE streams longer than the main code area spill into ONE seg_cont
    row, seg_woff == -(1 + cont_row)); queries stay exact across
    main/continuation/side segments."""
    import pydoc_data.topics as topics
    from tests.oracle import naive_locate

    buf = ("\n".join(sorted(topics.topics.values()))).encode()[:400000]
    docs = [buf[i:i + 50000] for i in range(0, len(buf), 50000)]
    prepared = ft.prepare_documents(docs)
    vr = ft.build_index(prepared, seg=512, mark_period=8, tier="vrle")
    woff = np.asarray(vr.arrays.seg_woff)
    assert (woff < -1).any(), "expected continuation segments"
    assert vr.arrays.seg_cont.shape[0] > 1
    full = ft.build_index(prepared, seg=512, mark_period=8)
    pats = [b"Python", b"lambda", b"qzqz", b"the "]
    np.testing.assert_array_equal(ft.count(full, pats), ft.count(vr, pats))
    assert ft.locate(vr, b"lambda") == naive_locate(docs, b"lambda")
    assert ft.extract_document(vr, 1) == docs[1]
