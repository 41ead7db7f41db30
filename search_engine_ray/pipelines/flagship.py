"""Flagship pipeline: build the sharded index over an sf dir's synthesized
pages, then serve the reference query set with the BM25 engine.

Index dirs are cached under /tmp keyed by sf dir (the build is resumable,
so repeated calls skip completed stages)."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from ..query.refqueries import REF_QUERIES
from .build import build_index
from .datasets import pages_dataset, read_table
from .search import SearchEngine
from ..sources.fixtures import pages_from_documents_batch


def sf_pages_factory(sf_dir: str):
    def factory(columns):
        docs = read_table(sf_dir, "documents",
                          columns=["doc_id", "text", "lang"])
        ds = docs.map_batches(pages_from_documents_batch,
                              batch_format="pyarrow")
        return ds.select_columns(columns) if columns else ds
    return factory


def _corpus_fingerprint(sf_dir: str) -> str:
    """size+mtime of the documents parquet: an in-place corpus change
    yields a new index dir instead of a silent stale resume."""
    try:
        st = os.stat(os.path.join(sf_dir, "documents.parquet"))
        return f"{st.st_size}-{st.st_mtime_ns}"
    except OSError:
        return "nosrc"


def index_dir_for(sf_dir: str, root: str = "/tmp/search_engine_ray") -> str:
    key = hashlib.sha256(
        f"{sf_dir}|{_corpus_fingerprint(sf_dir)}".encode()).hexdigest()[:10]
    return os.path.join(root, f"index_{os.path.basename(sf_dir)}_{key}")


def build_sf_index(sf_dir: str, docs_per_shard: int = 2048) -> str:
    out = index_dir_for(sf_dir)
    os.makedirs(out, exist_ok=True)
    build_index(sf_pages_factory(sf_dir), out, docs_per_shard=docs_per_shard)
    return out


def run_word_queries(sf_dir: str, k: int = 10,
                     queries: list[str] | None = None,
                     use_synonyms: bool = False) -> pa.Table:
    """Flagship BM25 serving over WORD-ONLY query plans with synonym
    expansion off — the subset whose scoring is fully SQL-expressible,
    giving the flagship a hash-exact DuckDB oracle
    (functions/sql_bm25.bm25_words_sql). Returns
    (query_id, rank, score, doc_id, url, title)."""
    from ..functions.sql_bm25 import BM25_WORD_QUERIES

    index_dir = build_sf_index(sf_dir)
    eng = SearchEngine(index_dir, use_synonyms=use_synonyms)
    try:
        batches = []
        for qid, q in enumerate(queries or BM25_WORD_QUERIES):
            res = eng.search(q, k=k)
            n = res.num_rows
            batches.append(pa.table({
                "query_id": pa.array([qid] * n, pa.int64()),
                "rank": res.column("rank"),
                "score": res.column("score"),
                "doc_id": res.column("doc_id"),
                "url": res.column("url"),
                "title": res.column("title"),
            }))
        return pa.concat_tables(batches)
    finally:
        eng.close()


def run_reference_queries(sf_dir: str, k: int = 10,
                          num_searchers: int | None = None,
                          queries: list[str] | None = None) -> pa.Table:
    """Build (or resume) the index and answer the reference query set.
    Returns (query_id, query, rank, score, doc_id, url)."""
    index_dir = build_sf_index(sf_dir)
    eng = SearchEngine(index_dir, num_searchers=num_searchers)
    try:
        batches = []
        for qid, q in enumerate(queries or REF_QUERIES):
            res = eng.search(q, k=k)
            n = res.num_rows
            batches.append(pa.table({
                "query_id": pa.array([qid] * n, pa.int64()),
                "query": pa.array([q] * n, pa.string()),
                "rank": res.column("rank"),
                "score": res.column("score"),
                "doc_id": res.column("doc_id"),
                "url": res.column("url"),
            }))
        return pa.concat_tables(batches)
    finally:
        eng.close()
