"""Corpus readers: files, directory trees, FASTA.

The reference's input plugins (its ABI, /root/reference/src/dcx_cc/
index_tool_support.h:20-120) are two-pass document readers with three
implementations: files/dirs, FASTA, and a synthetic benchmark corpus.  This
module is the Python path; femto_tpu/io/native.py binds the multithreaded
C++ loader when built.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional

from ..alphabet import PreparedText, prepare_documents


def iter_files(paths: Iterable[str]) -> List[str]:
    """Expand files and directory trees to a sorted file list
    (utils/file_find.c analog)."""
    out: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs.sort()
                for f in sorted(files):
                    out.append(os.path.join(root, f))
        else:
            out.append(p)
    return out


def read_corpus(paths: Iterable[str],
                max_bytes: Optional[int] = None,
                use_native: bool = True) -> PreparedText:
    """One document per file.  Uses the native C++ loader when available
    (unless byte-limited)."""
    files = iter_files(paths)
    if use_native and max_bytes is None:
        from .native import prepare_corpus_native

        try:
            prepared = prepare_corpus_native(files)
        except OSError:
            prepared = None
        if prepared is not None:
            return prepared
    docs: List[bytes] = []
    infos: List[bytes] = []
    total = 0
    for fp in iter_files(paths):
        with open(fp, "rb") as f:
            data = f.read()
        if max_bytes is not None and total + len(data) > max_bytes:
            data = data[: max_bytes - total]
        docs.append(data)
        infos.append(fp.encode())
        total += len(data)
        if max_bytes is not None and total >= max_bytes:
            break
    return prepare_documents(docs, infos)


def read_zero(total_bytes: int, doc_size: int = 1 << 16,
              seed: int = 0) -> PreparedText:
    """Deterministic synthetic benchmark corpus — the analog of the
    reference's `zero` input plugin (index_tool_support_zero.c), used for
    construction benchmarking without real input files."""
    import numpy as np

    rng = np.random.default_rng(seed)
    docs: List[bytes] = []
    remaining = total_bytes
    while remaining > 0:
        size = min(doc_size, remaining)
        docs.append(
            rng.integers(0, 4, size=size).astype("uint8").tobytes()
        )
        remaining -= size
    return prepare_documents(docs)


def read_fasta(paths: Iterable[str],
               reverse_complement: bool = False) -> PreparedText:
    """One document per FASTA record: headers stripped, sequence uppercased;
    optional reverse complement appended (ssort_chpl README.md:47-56
    preprocessing semantics)."""
    comp = bytes.maketrans(b"ACGTacgt", b"TGCATGCA")
    docs: List[bytes] = []
    infos: List[bytes] = []
    for fp in iter_files(paths):
        name = None
        seq: List[bytes] = []

        def flush():
            if name is None:
                return
            s = b"".join(seq).upper()
            if reverse_complement:
                s = s + s.translate(comp)[::-1]
            docs.append(s)
            infos.append(name)

        with open(fp, "rb") as f:
            for line in f:
                line = line.rstrip(b"\r\n")
                if line.startswith(b">"):
                    flush()
                    name = line[1:].strip() or fp.encode()
                    seq = []
                elif line and name is not None:
                    seq.append(line)
                elif line and name is None:
                    name = fp.encode()
                    seq = [line]
        flush()
    return prepare_documents(docs, infos)
