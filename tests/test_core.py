"""Core end-to-end tests: suffix array, BWT, count, locate, extract."""

import numpy as np
import pytest

import femto_tpu as ft
from femto_tpu.suffix import suffix_array_np
from tests.oracle import naive_count, naive_locate


def make_docs(rng, ndocs=6, maxlen=200, alphabet=b"abcd"):
    docs = []
    for _ in range(ndocs):
        L = int(rng.integers(0, maxlen))
        docs.append(bytes(rng.choice(list(alphabet), size=L).astype(np.uint8)))
    return docs


def test_suffix_array_matches_oracle(rng):
    import jax.numpy as jnp

    for trial in range(5):
        n = int(rng.integers(2, 400))
        text = rng.integers(1, 6, size=n).astype(np.int32)
        sa = np.asarray(ft.suffix_array(jnp.asarray(text)))
        sa_ref = suffix_array_np(text)
        np.testing.assert_array_equal(sa, sa_ref)


def test_suffix_array_repetitive(rng):
    import jax.numpy as jnp

    # highly repetitive input stresses doubling termination
    text = np.array([2, 2, 2, 2, 2, 2, 2, 1], dtype=np.int32)
    sa = np.asarray(ft.suffix_array(jnp.asarray(text)))
    np.testing.assert_array_equal(sa, suffix_array_np(text))


def test_suffix_array_long_embedded_repeat(rng):
    """A repeat longer than the direct-extension window forces the
    extension -> filtered-doubling fallback; also payload pull parity."""
    import jax.numpy as jnp

    block = rng.integers(1, 5, size=3000).astype(np.int32)
    noise1 = rng.integers(1, 5, size=500).astype(np.int32)
    noise2 = rng.integers(1, 5, size=700).astype(np.int32)
    text = np.concatenate([noise1, block, noise2, block, [5]])
    sa_ref = suffix_array_np(text)
    sa = np.asarray(ft.suffix_array(jnp.asarray(text)))
    np.testing.assert_array_equal(sa, sa_ref)
    # fused payload: pull[r] must equal payload[sa[r]]
    payload = rng.integers(0, 1 << 20, size=text.shape[0]).astype(np.int32)
    sa2, pull = ft.suffix_array(jnp.asarray(text), jnp.asarray(payload))
    np.testing.assert_array_equal(np.asarray(sa2), sa_ref)
    np.testing.assert_array_equal(np.asarray(pull), payload[sa_ref])


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(7)
    docs = [
        b"",
        b"\x00\x01\x00",
        bytes(range(256)),
        b"banana banana banana",
        b"the quick brown fox jumps over the lazy dog",
    ] + make_docs(rng, ndocs=5, maxlen=300, alphabet=b"abn \x00\xff")
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=8)
    return docs, index


def test_count_parity(small_index, rng):
    docs, index = small_index
    pats = [b"banana", b"an", b"a", b"zzz", b"\x00", b"the", b" ", b"na b"]
    # plus substrings of the docs themselves
    for d in docs:
        if len(d) >= 3:
            pats.append(d[:3])
            pats.append(d[len(d) // 2 : len(d) // 2 + 4])
    counts = ft.count(index, pats)
    for p, c in zip(pats, counts):
        assert c == naive_count(docs, p), (p, c, naive_count(docs, p))


def test_locate_parity(small_index):
    docs, index = small_index
    for p in [b"banana", b"an", b"the", b"\x00", b"fox", b"q"]:
        got = ft.locate(index, p)
        want = naive_locate(docs, p)
        assert got == want, (p, got, want)


def test_locate_direct_tier(small_index, tmp_path):
    """locate='direct' (HBM-resident SA; one gather per row) must agree
    with the mark-walk tier and survive both save formats."""
    docs, _ = small_index
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=8, locate="direct")
    assert index.sa_direct is not None
    for p in [b"banana", b"an", b"the", b"\x00", b"fox"]:
        assert ft.locate(index, p) == naive_locate(docs, p), p
    index.save(str(tmp_path / "idx_dir"))
    r1 = ft.FMIndex.load(str(tmp_path / "idx_dir"))
    assert r1.sa_direct is not None
    index.save_flat(str(tmp_path / "idx.ftpu"))
    r2 = ft.FMIndex.load(str(tmp_path / "idx.ftpu"))
    assert r2.sa_direct is not None
    for r in (r1, r2):
        assert ft.locate(r, b"an") == naive_locate(docs, b"an")


def test_flat_compressed_roundtrip(small_index, tmp_path):
    """save_flat(compress=True): zlib-coded blobs, identical index after
    load, and smaller than the raw flat file on text-ish corpora."""
    import os

    docs, index = small_index
    raw = str(tmp_path / "raw.ftpu")
    comp = str(tmp_path / "comp.ftpu")
    index.save_flat(raw)
    index.save_flat(comp, compress=True)
    assert os.path.getsize(comp) < os.path.getsize(raw)
    r = ft.FMIndex.load(comp)
    for p in [b"banana", b"an", b"\x00", b"fox"]:
        assert ft.locate(r, p) == naive_locate(docs, p), p
    assert ft.extract_document(r, 3) == docs[3]


def test_empty_pattern(small_index):
    docs, index = small_index
    assert ft.count(index, [b""])[0] == index.meta.n


def test_extract_document(small_index):
    docs, index = small_index
    for di in range(len(docs)):
        assert ft.extract_document(index, di) == docs[di]


def test_extract_context(small_index):
    docs, index = small_index
    first, last = ft.count_ranges(index, [b"quick"])
    assert last[0] - first[0] == 1
    ctx = ft.extract_context(index, int(first[0]), before=4, pattern_len=5, after=6)
    assert ctx == b"the quick brown"


def test_save_load(small_index, tmp_path):
    docs, index = small_index
    path = str(tmp_path / "idx")
    index.save(path)
    loaded = ft.FMIndex.load(path)
    np.testing.assert_array_equal(
        ft.count(loaded, [b"banana", b"an"]), ft.count(index, [b"banana", b"an"])
    )
    assert loaded.infos == index.infos


def test_backward_search_steps_prev_range(small_index):
    """Too-few-matches reporting: when the range empties, the last
    non-empty range and matched-character count are preserved
    (server.c:830-941 prev_first/prev_last semantics)."""
    import jax.numpy as jnp

    from femto_tpu.alphabet import pattern_to_alpha
    from femto_tpu.ops.search_ops import backward_search_steps
    from femto_tpu.search import pack_patterns

    docs, index = small_index
    pats, B = pack_patterns(
        [pattern_to_alpha(b"\xfebanana"), pattern_to_alpha(b"banana")]
    )
    first, last, pf, pl, matched = backward_search_steps(
        index.arrays, index.meta.n, jnp.asarray(pats)
    )
    # full pattern has no matches...
    assert int(last[0]) <= int(first[0])
    # ...but the suffix "banana" matched 6 characters
    assert int(matched[0]) == 6
    assert int(pl[0]) - int(pf[0]) == int(ft.count(index, [b"banana"])[0])
    # fully-matching pattern: prev == final
    assert int(matched[1]) == 6
    assert (int(pf[1]), int(pl[1])) == (int(first[1]), int(last[1]))


def test_mark_period_zero_count_only():
    """mark_period=0 disables locate sampling (should_mark returns false,
    index_types.h:136) — counts still work; locate yields no offsets."""
    docs = [b"hello world", b"hello"]
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=0)
    assert int(ft.count(index, [b"hello"])[0]) == 2
    offs = ft.locate_range(index, 0, 4)
    assert (offs == -1).all()


def test_pattern_longer_than_docs(small_index):
    docs, index = small_index
    long_pat = b"x" * 2000
    assert int(ft.count(index, [long_pat])[0]) == 0


def test_locate_deferred_grank_parity(rng):
    """Deferred mark-value resolution must agree with per-step resolution
    (lf_mark_step) across every row."""
    import jax.numpy as jnp
    from femto_tpu.search import _locate_jit

    docs = [bytes(rng.integers(97, 105, size=4000).astype(np.uint8))
            for _ in range(5)]
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=20)
    n = index.meta.n
    rows = np.arange(-(-n // 256) * 256, dtype=np.int32) % n
    got = np.asarray(_locate_jit(index.arrays, n, 20, jnp.asarray(rows)))
    # locating all rows yields exactly the suffix array (a permutation)
    assert len(np.unique(got[:n])) == n
    sa = np.asarray(ft.suffix_array(
        jnp.asarray(prepared.text.astype(np.int32))))
    np.testing.assert_array_equal(got[:n], sa)


def test_locate_phased_parity(rng):
    """locate_rows_phased (lane compaction between walk phases) must match
    the lockstep while_loop on every row, including padded/duplicate rows
    and batch sizes that are not powers of two."""
    import jax.numpy as jnp
    from femto_tpu.ops.search_ops import locate_rows, locate_rows_phased

    docs = [bytes(rng.integers(97, 123, size=2500).astype(np.uint8))
            for _ in range(6)]
    prepared = ft.prepare_documents(docs)
    index = ft.build_index(prepared, seg=64, mark_period=20)
    n = index.meta.n
    for B in (5000, 8192, 12345):
        rows = jnp.asarray(rng.integers(0, n, size=B).astype(np.int32))
        ref = np.asarray(locate_rows(index.arrays, 20, rows))
        got = np.asarray(locate_rows_phased(index.arrays, 20, rows,
                                            min_compact=1024))
        np.testing.assert_array_equal(ref, got)


def test_backward_search_shared_parity(rng):
    """The shared-segment pair rank (occ2_shared + device compaction) must
    return identical ranges to the baseline backward search on every tier,
    at compaction capacities that exercise both the compacted and the
    full-width fallback paths."""
    import jax.numpy as jnp

    from femto_tpu.alphabet import pattern_to_alpha
    from femto_tpu.ops.search_ops import backward_search, \
        backward_search_shared
    from femto_tpu.search import pack_patterns

    docs = [bytes(rng.integers(97, 105, size=3000).astype(np.uint8))
            for _ in range(4)] + [b"needle in the haystack " * 10]
    prepared = ft.prepare_documents(docs)
    pats = [b"needle", b"ab", b"a", b"zzz", docs[0][5:13], b"haystack ne"]
    packed, B = pack_patterns([pattern_to_alpha(p) for p in pats])
    packed = jnp.asarray(packed)
    for tier in ("full", "packed", "vseg"):
        ix = ft.build_index(prepared, seg=64, mark_period=8, tier=tier)
        f0, l0 = backward_search(ix.arrays, ix.meta.n_rows, packed,
                                 row0=ix.meta.row0)
        for cap in (0, 2, len(pats) + 2):
            f1, l1 = backward_search_shared(
                ix.arrays, ix.meta.n_rows, packed, row0=ix.meta.row0,
                compact_cap=cap)
            np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_locate_pyramid_parity(rng):
    """The device-compaction pyramid walk must locate identically to the
    lockstep walk (big batch exercises the sub-batch phases + cleanup)."""
    import jax.numpy as jnp

    from femto_tpu.ops.search_ops import locate_rows, locate_rows_pyramid

    docs = [bytes(rng.integers(97, 101, size=4000).astype(np.uint8))
            for _ in range(3)]
    prepared = ft.prepare_documents(docs)
    ix = ft.build_index(prepared, seg=64, mark_period=20)
    B = 8192
    rows = jnp.asarray(
        rng.integers(0, ix.meta.n, size=B).astype(np.int32))
    base = np.asarray(locate_rows(ix.arrays, 20, rows))
    pyr = np.asarray(locate_rows_pyramid(ix.arrays, 20, rows))
    np.testing.assert_array_equal(base, pyr)
