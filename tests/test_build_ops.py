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
    np.testing.assert_array_equal(
        np.asarray(ih.arrays.mark_vals)[:nm], np.asarray(idv.arrays.mark_vals)[:nm]
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
