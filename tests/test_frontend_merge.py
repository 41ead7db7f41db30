"""R7: the front-end merge port (merge_frontend_compat) must reproduce
the compiled reference mergeSortedArrays (query/query.cpp:738-770) —
including its ascending-order bug, first-array tie-win, and URL dedup
that advances the losing cursor."""

from __future__ import annotations

import os
import random
import shutil
import struct
import subprocess

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "tools")
HARNESS = os.path.join(TOOLS, "ref_merge_harness")
REFERENCE = "/root/reference"


def _ensure_harness() -> str:
    if os.path.exists(HARNESS):
        return HARNESS
    if shutil.which("g++") is None or not os.path.isdir(REFERENCE):
        pytest.skip("g++ or reference tree unavailable")
    cmd = ["g++", "-O2", "-std=c++17", "-pthread",
           f"-I{REFERENCE}/engine/csolver",
           "-Dntohll(x)=__builtin_bswap64(x)",
           "-o", HARNESS,
           os.path.join(TOOLS, "ref_merge_harness.cpp"),
           f"{REFERENCE}/query/query.cpp",
           f"{REFERENCE}/query/synsets.cpp",
           f"{REFERENCE}/engine/lib/stemmer/stemmer.cpp"]
    subprocess.run(cmd, check=True)
    return HARNESS


def _run_reference(arrays):
    lines = [str(len(arrays))]
    for arr in arrays:
        lines.append(str(len(arr)))
        for url, _title, score in arr:
            bits = struct.unpack("<Q", struct.pack("<d", score))[0]
            lines.append(f"{bits:016x}\t{url}")
    out = subprocess.run([_ensure_harness()], check=True,
                         input="\n".join(lines) + "\n",
                         capture_output=True, text=True).stdout
    results = []
    for line in out.splitlines():
        hexbits, url = line.split("\t")
        score = struct.unpack("<d", struct.pack("<Q", int(hexbits, 16)))[0]
        results.append((url, score))
    return results


def _fixture_arrays(seed: int, n_arrays: int, max_len: int):
    """Descending per-node lists with planted cross-node duplicate urls
    and exact score ties."""
    rng = random.Random(seed)
    url_pool = [f"http://site{i}.com/" for i in range(max_len * 2)]
    score_pool = [rng.uniform(0.0, 8.0) for _ in range(6)]
    arrays = []
    for _ in range(n_arrays):
        n = rng.randrange(max_len + 1)
        items = []
        for _ in range(n):
            url = rng.choice(url_pool)
            score = (rng.choice(score_pool) if rng.random() < 0.5
                     else rng.uniform(0.0, 8.0))
            items.append((url, url, score))
        items.sort(key=lambda r: -r[2])
        arrays.append(items)
    return arrays


def test_frontend_merge_matches_reference():
    from search_engine_ray.pipelines.compat import merge_frontend_compat

    _ensure_harness()
    for seed in range(25):
        arrays = _fixture_arrays(seed, n_arrays=1 + seed % 5, max_len=12)
        got = [(u, s) for u, _t, s in merge_frontend_compat(arrays)]
        expect = _run_reference(arrays)
        assert [u for u, _ in got] == [u for u, _ in expect], seed
        for (_, gs), (_, es) in zip(got, expect):
            assert struct.pack("<d", gs) == struct.pack("<d", es), seed


def test_frontend_merge_is_ascending_with_dedup():
    from search_engine_ray.pipelines.compat import merge_frontend_compat

    a = [("u3", "u3", 3.0), ("u1", "u1", 1.0)]
    b = [("u4", "u4", 4.0), ("u1", "u1", 1.0), ("u0", "u0", 0.5)]
    merged = merge_frontend_compat([a, b])
    # heads are the per-array maxima; the merge picks the smaller head
    # each round: u3(3.0) vs u4(4.0) → u3, then u1(1.0) vs u4 → u1
    # (array a now exhausted), then u4, then u1 (dup, skipped), then u0
    assert [u for u, _t, _s in merged] == ["u3", "u1", "u4", "u0"]


def test_compat_search_frontend_flag(ray_session, sf_dir):
    """compat_search(compat_frontend_order=True) equals applying the
    pinned merge to the per-node lists computed sequentially."""
    from search_engine_ray.pipelines.compat import (compat_search,
                                                    docs_rows_from_parquet,
                                                    merge_frontend_compat)
    from search_engine_ray.pipelines.flagship import build_sf_index
    from search_engine_ray.query import compile as qc
    from search_engine_ray.query.compat_tree import build_chunks
    from search_engine_ray.query.ranker_compat import (merge_chunk_results,
                                                       rank_chunk)
    from search_engine_ray.query.refqueries import REF_QUERIES

    chunk_size, n_nodes = 97, 3
    table = compat_search(sf_dir, chunk_size=chunk_size,
                          compat_frontend_order=True, n_nodes=n_nodes)

    index_dir = build_sf_index(sf_dir)
    docs = docs_rows_from_parquet(index_dir)
    chunks = build_chunks(docs, chunk_size=chunk_size)
    synsets = qc.get_default_synsets()

    import math
    per_node = max(1, math.ceil(len(chunks) / n_nodes))
    got = {}
    for qid, q, url, score in zip(table.column("query_id").to_pylist(),
                                  table.column("query").to_pylist(),
                                  table.column("url").to_pylist(),
                                  table.column("score").to_pylist()):
        got.setdefault(qid, []).append((url, score))

    checked = 0
    for qid, query in enumerate(REF_QUERIES):
        plan = qc.compile_query(query, synsets)
        if plan is None:
            continue
        node_lists = []
        for lo in range(0, len(chunks), per_node):
            arrays, acc = [], 0
            for index in chunks[lo:lo + per_node]:
                partial = rank_chunk(index, plan)
                acc += len(partial)
                arrays.append(partial)
                if acc > 200:
                    break
            node_lists.append(merge_chunk_results(arrays))
        expect = [(u, s) for u, _t, s in merge_frontend_compat(node_lists)]
        assert got.get(qid, []) == expect, query
        if expect:
            checked += 1
    assert checked >= 5
