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
