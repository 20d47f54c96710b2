"""Result sets and Boolean combination.

The reference keeps sorted compressed document/offset lists with
union/intersect/subtract ops (/root/reference/src/main/results.{h,c}:
result types COUNT/DOCUMENTS/OFFSETS/DOC_OFFSETS, intersectResults/
unionResults results.h:115-121).  Here a result set is a sorted numpy
record array of (doc, offset) or just doc ids; Boolean THEN/WITHIN use
offsets with distance windows (QUERY_FORMAT.txt).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np


class ResultType(enum.Enum):
    COUNT = 0
    DOCUMENTS = 1
    DOC_OFFSETS = 2


@dataclasses.dataclass
class Results:
    """Sorted match results.

    docs:    int64[k] document ids (sorted, unique for DOCUMENTS type)
    offsets: int64[k] per-match offsets (DOC_OFFSETS only; sorted by
             (doc, offset))
    count:   total number of matching positions (rows)
    """

    type: ResultType
    count: int = 0
    docs: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int64)
    )
    offsets: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int64)
    )

    @classmethod
    def from_doc_offsets(cls, docs, offsets) -> "Results":
        docs = np.asarray(docs, np.int64)
        offsets = np.asarray(offsets, np.int64)
        order = np.lexsort((offsets, docs))
        return cls(
            type=ResultType.DOC_OFFSETS,
            count=len(docs),
            docs=docs[order],
            offsets=offsets[order],
        )

    @classmethod
    def from_docs(cls, docs, count: Optional[int] = None) -> "Results":
        docs = np.unique(np.asarray(docs, np.int64))
        return cls(
            type=ResultType.DOCUMENTS,
            count=count if count is not None else len(docs),
            docs=docs,
        )

    def doc_set(self) -> np.ndarray:
        return np.unique(self.docs)


def union(a: Results, b: Results) -> Results:
    if a.type == ResultType.DOC_OFFSETS and b.type == ResultType.DOC_OFFSETS:
        docs = np.concatenate([a.docs, b.docs])
        offs = np.concatenate([a.offsets, b.offsets])
        keys = np.stack([docs, offs], axis=1)
        uniq, idx = np.unique(keys, axis=0, return_index=True)
        return Results.from_doc_offsets(docs[idx], offs[idx])
    return Results.from_docs(np.concatenate([a.doc_set(), b.doc_set()]))


def intersect(a: Results, b: Results) -> Results:
    """AND: documents present in both; keeps a's offsets when available."""
    common = np.intersect1d(a.doc_set(), b.doc_set())
    if a.type == ResultType.DOC_OFFSETS:
        keep = np.isin(a.docs, common)
        return Results.from_doc_offsets(a.docs[keep], a.offsets[keep])
    return Results.from_docs(common)


def subtract(a: Results, b: Results) -> Results:
    """NOT: documents in a but not in b."""
    keepdocs = np.setdiff1d(a.doc_set(), b.doc_set())
    if a.type == ResultType.DOC_OFFSETS:
        keep = np.isin(a.docs, keepdocs)
        return Results.from_doc_offsets(a.docs[keep], a.offsets[keep])
    return Results.from_docs(keepdocs)


def then_within(
    a: Results, b: Results, distance: int, ordered: bool
) -> Results:
    """THEN (ordered) / WITHIN (either order): documents where a match of b
    starts within `distance` characters of the start of a match of a
    (QUERY_FORMAT.txt boolean section).  Result keeps a's matching
    offsets."""
    if a.type != ResultType.DOC_OFFSETS or b.type != ResultType.DOC_OFFSETS:
        raise ValueError("THEN/WITHIN need offset results")
    out_docs, out_offs = [], []
    bd, bo = b.docs, b.offsets
    for doc, off in zip(a.docs, a.offsets):
        sel = bd == doc
        if not sel.any():
            continue
        delta = bo[sel] - off
        if ordered:
            ok = (delta >= 0) & (delta <= distance)
        else:
            ok = np.abs(delta) <= distance
        if ok.any():
            out_docs.append(doc)
            out_offs.append(off)
    return Results.from_doc_offsets(
        np.array(out_docs, np.int64), np.array(out_offs, np.int64)
    )
