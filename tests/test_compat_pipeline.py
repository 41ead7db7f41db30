"""Distributed compat serving must equal the sequential driver-side
rank_chunks on the same canonical docs (the sequential path itself is
pinned bit-for-bit to the C++ by test_rank_conformance)."""

from __future__ import annotations

import struct

import pytest


def test_compat_distributed_equals_sequential(ray_session, sf_dir):
    from search_engine_ray.pipelines.compat import (compat_search,
                                                    docs_rows_from_parquet)
    from search_engine_ray.pipelines.flagship import build_sf_index
    from search_engine_ray.query import compile as qc
    from search_engine_ray.query.compat_tree import build_chunks
    from search_engine_ray.query.ranker_compat import rank_chunks
    from search_engine_ray.query.refqueries import REF_QUERIES

    # small chunks force the multi-chunk merge + prefix-cap logic
    table = compat_search(sf_dir, chunk_size=97)

    index_dir = build_sf_index(sf_dir)
    docs = docs_rows_from_parquet(index_dir)
    chunks = build_chunks(docs, chunk_size=97)
    synsets = qc.get_default_synsets()

    got = {}
    for qid, q, rank, score, url in zip(
            table.column("query_id").to_pylist(),
            table.column("query").to_pylist(),
            table.column("rank").to_pylist(),
            table.column("score").to_pylist(),
            table.column("url").to_pylist()):
        got.setdefault(qid, []).append((url, score))

    nonempty = 0
    for qid, query in enumerate(REF_QUERIES):
        plan = qc.compile_query(query, synsets)
        if plan is None:
            assert qid not in got
            continue
        expect = [(url, score) for url, _, score in rank_chunks(chunks, plan)]
        mine = got.get(qid, [])
        assert [u for u, _ in mine] == [u for u, _ in expect], query
        for (_, gs), (_, es) in zip(mine, expect):
            assert struct.pack("<d", gs) == struct.pack("<d", es), query
        if expect:
            nonempty += 1
    assert nonempty >= 5
