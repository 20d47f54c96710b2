"""Native C++ corpus loader must match the Python readers byte-for-byte."""

import os

import numpy as np
import pytest

from femto_tpu.io.corpus import read_corpus, read_fasta
from femto_tpu.io.native import (
    ensure_built,
    prepare_corpus_native,
    prepare_fasta_native,
)

pytestmark = pytest.mark.skipif(
    not ensure_built(), reason="native toolchain unavailable"
)


def test_corpus_parity(tmp_path, rng):
    paths = []
    for i, content in enumerate(
        [b"hello world", b"", bytes(range(256)),
         bytes(rng.integers(0, 256, size=10000).astype(np.uint8))]
    ):
        p = tmp_path / f"f{i}"
        p.write_bytes(content)
        paths.append(str(p))
    pn = prepare_corpus_native(paths)
    pp = read_corpus(paths, use_native=False)
    np.testing.assert_array_equal(pn.text, pp.text)
    np.testing.assert_array_equal(pn.doc_starts, pp.doc_starts)


def test_fasta_parity(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_bytes(b">rec1 desc\nacgt\nACGT\n>rec2\nNNNN\n\n>empty\n")
    for rc in (False, True):
        fn = prepare_fasta_native([str(fa)], reverse_complement=rc)
        fp = read_fasta([str(fa)], reverse_complement=rc)
        np.testing.assert_array_equal(fn.text, fp.text)
        np.testing.assert_array_equal(fn.doc_starts, fp.doc_starts)


def test_missing_file_raises(tmp_path):
    with pytest.raises(OSError):
        prepare_corpus_native([str(tmp_path / "nope")])


def test_fasta_rc_non_acgt(tmp_path):
    fa = tmp_path / "y.fa"
    fa.write_bytes(b">r\nacgxty\n")
    fn = prepare_fasta_native([str(fa)], reverse_complement=True)
    fp = read_fasta([str(fa)], reverse_complement=True)
    np.testing.assert_array_equal(fn.text, fp.text)


def test_path_headers(tmp_path):
    import femto_tpu as ft

    p1 = tmp_path / "alpha.txt"
    p1.write_bytes(b"the quick brown fox")
    p2 = tmp_path / "beta.txt"
    p2.write_bytes(b"lazy dogs")
    paths = [str(p1), str(p2)]
    pn = prepare_corpus_native(paths, path_headers=True)
    pp = ft.prepare_documents(
        [p.encode() and open(p, "rb").read() for p in paths],
        infos=[p.encode() for p in paths],
        headers=[p.encode() for p in paths],
    )
    np.testing.assert_array_equal(pn.text, pp.text)
    np.testing.assert_array_equal(pn.doc_starts, pp.doc_starts)
    np.testing.assert_array_equal(pn.header_lens, pp.header_lens)
    # headers are searchable: path text occurs in the index
    index = ft.build_index(pn, seg=64, mark_period=8)
    assert int(ft.count(index, [b"alpha.txt"])[0]) == 1
    assert ft.extract_document(index, 0) == b"the quick brown fox"
