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
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..query import compile as qc
from ..query.compat_tree import ChunkIndex
from ..query.ranker_compat import merge_chunk_results, rank_chunk
from ..query.refqueries import REF_QUERIES

CHUNK_SIZE = 5000


def docs_rows_from_parquet(index_dir: str) -> list[dict]:
    """Reconstruct compat doc dicts from the built docs table (flat terms
    string + flags bytes + n_title_kept split)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{index_dir}/docs",
        columns=["url", "title", "terms", "flags", "n_title_kept",
                 "word_count", "title_length", "english"])
    rows = []
    for i in range(t.num_rows):
        terms_s = t.column("terms")[i].as_py()
        kept = terms_s.split(" ") if terms_s else []
        ntk = t.column("n_title_kept")[i].as_py()
        flags = t.column("flags")[i].as_py()
        rows.append({
            "url": t.column("url")[i].as_py(),
            "title": t.column("title")[i].as_py(),
            "title_terms": kept[:ntk],
            "body_terms": kept[ntk:],
            "body_flags": list(flags[ntk:]),
            "word_count": t.column("word_count")[i].as_py(),
            "title_length": t.column("title_length")[i].as_py(),
            "english": t.column("english")[i].as_py(),
        })
    rows.sort(key=lambda r: r["url"])
    return rows


@ray.remote
def _rank_chunk_task(chunk_docs: list[dict], plans: list) -> list[list]:
    """Build one ChunkIndex and rank every query against it."""
    index = ChunkIndex()
    for doc in chunk_docs:
        index.insert(doc)
    index.freeze()
    out = []
    for plan in plans:
        out.append(rank_chunk(index, plan) if plan is not None else [])
    return out


def compat_search(sf_dir: str, queries: list[str] | None = None,
                  chunk_size: int = CHUNK_SIZE) -> pa.Table:
    """Serve the reference query set with reference-exact semantics,
    distributed per chunk. Returns (query_id, query, rank, score, url)."""
    from .flagship import build_sf_index

    index_dir = build_sf_index(sf_dir)
    docs = docs_rows_from_parquet(index_dir)
    chunks = [docs[i:i + chunk_size]
              for i in range(0, len(docs), chunk_size)]
    synsets = qc.get_default_synsets()
    qs = queries or REF_QUERIES
    plans = [qc.compile_query(q, synsets) for q in qs]
    plans_ref = ray.put(plans)
    futures = [_rank_chunk_task.remote(chunk, plans_ref)
               for chunk in chunks]
    per_chunk = ray.get(futures)  # [chunk][query] -> results

    cols = {"query_id": [], "query": [], "rank": [], "score": [], "url": []}
    for qid, q in enumerate(qs):
        arrays = []
        accumulated = 0
        for chunk_i in range(len(chunks)):  # sequential prefix rule
            partial = per_chunk[chunk_i][qid]
            accumulated += len(partial)
            arrays.append(partial)
            if accumulated > 200:  # MAX_RANKED_DOCS, csolver.h:14
                break
        merged = merge_chunk_results(arrays)
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
