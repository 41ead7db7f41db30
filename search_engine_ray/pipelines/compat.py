"""Compat-mode serving over Ray: the reference-exact chunk ranking
(query/isr_compat + ranker_compat — the bit-identical semantics pinned by
tests/test_rank_conformance.py) distributed one task per 5000-doc chunk.

The reference couples chunks only through the sequential accumulation cap
(stop ranking chunks once >200 results accumulated, csolver.cpp:145-148).
Chunk results are independent, so we rank ALL chunks in parallel and apply
the same prefix rule afterwards from the per-chunk result sizes — output
identical to the sequential scan.

Canonical doc order (SURVEY.md §4.4): docs sorted by url; chunks of
MIN_PAGES_PER_CHUNK=5000 in that order (constants.h:27).

Distribution: the docs table is url-sorted with Ray's distributed sort;
chunk tasks receive the covering Arrow block refs plus slice ranges and
build their ChunkIndex task-side — the driver touches only per-block row
counts, never doc data.

Front-end layer (R7): with ``compat_frontend_order=True`` the per-node
merged lists are combined with an exact port of the reference front-end's
mergeSortedArrays (query/query.cpp:738-770) — an ASCENDING merge (the
documented reference bug: it picks the minimum head of the descending
per-node lists) with URL dedup that still advances the losing cursor.
Pinned against the compiled reference function by
tests/test_frontend_merge.py via tests/tools/ref_merge_harness.cpp.
"""

from __future__ import annotations

import math

import pyarrow as pa

import ray

from ..query import compile as qc
from ..query.compat_tree import ChunkIndex
from ..query.ranker_compat import merge_chunk_results, rank_chunk
from ..query.refqueries import REF_QUERIES

CHUNK_SIZE = 5000

_DOC_COLUMNS = ["url", "title", "terms", "flags", "n_title_kept",
                "word_count", "title_length", "english"]


def _rows_from_table(t: pa.Table) -> list[dict]:
    """Compat doc dicts from an Arrow slice — one to_pylist per COLUMN
    (batch-level), not per cell."""
    cols = [t.column(c).to_pylist() for c in _DOC_COLUMNS]
    rows = []
    for url, title, terms_s, flags, ntk, wc, tl, eng in zip(*cols):
        kept = terms_s.split(" ") if terms_s else []
        rows.append({
            "url": url,
            "title": title,
            "title_terms": kept[:ntk],
            "body_terms": kept[ntk:],
            "body_flags": list(flags[ntk:]),
            "word_count": wc,
            "title_length": tl,
            "english": eng,
        })
    return rows


def docs_rows_from_parquet(index_dir: str) -> list[dict]:
    """Sequential conformance tool (used by tests as the oracle side):
    reconstruct ALL compat doc dicts url-sorted on the driver."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{index_dir}/docs", columns=_DOC_COLUMNS)
    rows = _rows_from_table(t)
    rows.sort(key=lambda r: r["url"])
    return rows


@ray.remote
def _block_nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _rank_chunk_task(plans: list, slices: list[tuple[int, int, int]],
                     *tables: pa.Table) -> list[list]:
    """Build one ChunkIndex from the given block slices (in order) and
    rank every query against it. ``slices[i]`` is (table_index, start,
    stop) into ``tables``."""
    index = ChunkIndex()
    for ti, start, stop in slices:
        for doc in _rows_from_table(tables[ti].slice(start, stop - start)):
            index.insert(doc)
    index.freeze()
    out = []
    for plan in plans:
        out.append(rank_chunk(index, plan) if plan is not None else [])
    return out


def _chunk_slices(block_counts: list[int], chunk_size: int):
    """Yield, per chunk, the list of (block_idx, local_start, local_stop)
    ranges covering global rows [i*chunk_size, (i+1)*chunk_size)."""
    total = sum(block_counts)
    starts = [0]
    for c in block_counts:
        starts.append(starts[-1] + c)
    n_chunks = max(1, math.ceil(total / chunk_size)) if total else 0
    for ci in range(n_chunks):
        lo, hi = ci * chunk_size, min((ci + 1) * chunk_size, total)
        ranges = []
        for bi, c in enumerate(block_counts):
            b_lo, b_hi = starts[bi], starts[bi + 1]
            s, e = max(lo, b_lo), min(hi, b_hi)
            if s < e:
                ranges.append((bi, s - b_lo, e - b_lo))
        yield ranges


DBL_MAX = float.fromhex("0x1.fffffffffffffp+1023")


def merge_frontend_compat(arrays: list[list]) -> list:
    """Exact port of the reference front-end mergeSortedArrays
    (query/query.cpp:738-770): repeatedly pick the SMALLEST current head
    (strict <, so the first array wins ties and a DBL_MAX/NaN head is
    never picked — matching minVal = numeric_limits<double>::max()),
    append if the url is unseen, and advance the chosen cursor either
    way. Per-node inputs are descending, so the output is the reference's
    ascending-merge bug, reproduced faithfully."""
    indices = [0] * len(arrays)
    seen: set[str] = set()
    out = []
    while True:
        min_val = DBL_MAX
        min_arr = -1
        for i, arr in enumerate(arrays):
            if indices[i] < len(arr) and arr[indices[i]][2] < min_val:
                min_val = arr[indices[i]][2]
                min_arr = i
        if min_arr == -1:
            break
        r = arrays[min_arr][indices[min_arr]]
        if r[0] not in seen:
            out.append(r)
            seen.add(r[0])
        indices[min_arr] += 1
    return out


@ray.remote
def _node_merge_task(n_queries: int, *chunk_results: list[list]) -> list:
    """One csolver node's replies, computed WHERE ITS CHUNKS ARE: apply
    the sequential prefix cap over the node's own chunks
    (csolver.cpp:145-148) then the csolver-side descending merge, for
    every query. The driver never sees per-chunk results — only the
    ≤ ~MAX_RANKED_DOCS per-node merged lists (tree merge; at very large
    node counts the same task composes into another level)."""
    out = []
    for qid in range(n_queries):
        arrays = []
        accumulated = 0
        for cr in chunk_results:  # node's chunks in crawl order
            partial = cr[qid]
            accumulated += len(partial)
            arrays.append(partial)
            if accumulated > 200:  # MAX_RANKED_DOCS, csolver.h:14
                break
        out.append(merge_chunk_results(arrays))
    return out


def compat_search(sf_dir: str, queries: list[str] | None = None,
                  chunk_size: int = CHUNK_SIZE,
                  compat_frontend_order: bool = False,
                  n_nodes: int = 1) -> pa.Table:
    """Serve the reference query set with reference-exact semantics,
    distributed per chunk. Returns (query_id, query, rank, score, url).

    ``n_nodes`` partitions the chunks contiguously into simulated csolver
    nodes (each applies its own 200-result prefix cap). With
    ``compat_frontend_order=True`` the per-node lists are combined with
    the reference front-end's ascending merge (R7); otherwise node lists
    are concatenated in descending-merge order per node.
    """
    import ray.data as rd

    from .flagship import build_sf_index

    index_dir = build_sf_index(sf_dir)
    docs = (rd.read_parquet(f"{index_dir}/docs", columns=_DOC_COLUMNS)
            .sort("url").materialize())
    block_refs = docs.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in block_refs])

    synsets = qc.get_default_synsets()
    qs = queries or REF_QUERIES
    plans = [qc.compile_query(q, synsets) for q in qs]
    plans_ref = ray.put(plans)

    futures = []
    for ranges in _chunk_slices(counts, chunk_size):
        needed = sorted({bi for bi, _, _ in ranges})
        remap = {bi: k for k, bi in enumerate(needed)}
        slices = [(remap[bi], s, e) for bi, s, e in ranges]
        futures.append(_rank_chunk_task.remote(
            plans_ref, slices, *[block_refs[bi] for bi in needed]))
    n_chunks = len(futures)

    # contiguous chunk→node assignment (each reference node indexes its
    # own crawl subset; endpoint order is the node order); the per-node
    # cap+merge runs as its own task fed by the chunk futures, so the
    # driver collects n_nodes bounded lists, not n_chunks
    per_node = max(1, math.ceil(n_chunks / max(n_nodes, 1)))
    node_results = ray.get([
        _node_merge_task.remote(len(qs), *futures[i:i + per_node])
        for i in range(0, n_chunks, per_node)])

    cols = {"query_id": [], "query": [], "rank": [], "score": [], "url": []}
    for qid, q in enumerate(qs):
        node_lists = [nr[qid] for nr in node_results]
        if compat_frontend_order:
            merged = merge_frontend_compat(node_lists)
        else:
            merged = [r for lst in node_lists for r in lst]
        for rank, (url, title, score) in enumerate(merged, 1):
            cols["query_id"].append(qid)
            cols["query"].append(q)
            cols["rank"].append(rank)
            cols["score"].append(score)
            cols["url"].append(url)
    return pa.table({
        "query_id": pa.array(cols["query_id"], pa.int64()),
        "query": pa.array(cols["query"], pa.string()),
        "rank": pa.array(cols["rank"], pa.int64()),
        "score": pa.array(cols["score"], pa.float64()),
        "url": pa.array(cols["url"], pa.string()),
    })
