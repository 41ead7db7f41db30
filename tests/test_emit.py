"""Property test: the vectorized postings emit must agree with a scalar
reference implementation on random term sequences."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from search_engine_ray.kernels.varint import encode_varint
from search_engine_ray.stages.emit import emit_postings_columnar

WORDS = ["a", "bb", "ccc", "@t", "word1", "word2", "zz", "@x"]


def scalar_runs(doc_ids, dls, term_strs):
    out = {}
    for did, dl, s in zip(doc_ids, dls, term_strs):
        positions = {}
        for pos, term in enumerate(s.split(" ") if s else ()):
            positions.setdefault(term, []).append(pos)
        for term, plist in positions.items():
            buf = bytearray()
            prev = None
            for p in plist:
                encode_varint(p if prev is None else p - prev, buf)
                prev = p
            out[(term, did)] = (len(plist), dl, bytes(buf))
    return out


@given(st.lists(st.lists(st.sampled_from(WORDS), max_size=30), min_size=1,
                max_size=20))
@settings(max_examples=60, deadline=None)
def test_emit_matches_scalar(docs):
    doc_ids = np.arange(100, 100 + len(docs), dtype=np.int64)
    dls = np.asarray([len(d) for d in docs], dtype=np.int64)
    strs = [" ".join(d) for d in docs]
    runs = emit_postings_columnar(doc_ids, dls, strs)
    expect = scalar_runs(doc_ids, dls, strs)

    got = {}
    offs = runs["run_byte_offsets"]
    mv = memoryview(runs["pos_stream"])
    for i in range(len(runs["terms"])):
        key = (runs["terms"][i], int(runs["run_doc"][i]))
        got[key] = (int(runs["run_tf"][i]), int(runs["run_dl"][i]),
                    bytes(mv[offs[i]:offs[i + 1]]))
    assert got == expect
