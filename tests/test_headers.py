"""Document header sections (SOH/EOH) tests."""

import numpy as np

import femto_tpu as ft
from tests.oracle import naive_count


def test_headers_roundtrip_and_search(tmp_path):
    docs = [b"the quick brown fox", b"pack my box", b""]
    headers = [b"url:alpha", b"url:beta", b""]
    prepared = ft.prepare_documents(docs, headers=headers)
    assert prepared.doc_bytes(0) == docs[0]
    assert prepared.header_bytes(0) == headers[0]
    assert prepared.header_bytes(2) == b""
    assert prepared.doc_len(1) == len(docs[1])

    index = ft.build_index(prepared, seg=64, mark_period=8)
    # content search: counts unaffected by headers
    for p in [b"quick", b"box", b"the"]:
        assert int(ft.count(index, [p])[0]) == naive_count(docs, p), p
    # header content is searchable; offsets are negative (before content)
    assert int(ft.count(index, [b"url:"])[0]) == 2
    res = ft.locate(index, b"url:alpha")
    assert res == [(0, -(len(headers[0]) + 1))]
    # patterns cannot match across the EOH boundary into content
    assert int(ft.count(index, [b"alphathe"])[0]) == 0
    # extraction returns content only
    assert ft.extract_document(index, 0) == docs[0]
    assert ft.extract_document(index, 2) == b""
    # persistence keeps header offsets working
    path = str(tmp_path / "hidx")
    index.save(path)
    loaded = ft.FMIndex.load(path)
    assert ft.locate(loaded, b"url:alpha") == res
    flat = str(tmp_path / "hidx.ftpu")
    index.save_flat(flat)
    loaded2 = ft.FMIndex.load(flat)
    assert ft.locate(loaded2, b"url:alpha") == res
