"""Similarity search over the embeddings table.

- ``ann_topk``: brute-force cosine top-k — the exact baseline. The query
  matrix is broadcast once (ray.put); each batch does one float64 matmul;
  per-batch top-k partials are merged on the driver (k rows per batch cross
  the wire, not the corpus).
- ``ann_topk_lsh``: the scale path — random-hyperplane LSH bucketing; only
  candidate buckets are scanned. Recall checked against brute force in
  tests/test_ann.py.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray

from ..pipelines.datasets import read_table

K_DEFAULT = 10


def _query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    idx = t.column("vec_id").to_pylist().index(vec_id)
    return np.asarray(t.column("embedding")[idx].as_py(), dtype=np.float64)


def _batch_sims(b: pa.Table, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = b.column("vec_id").to_numpy(zero_copy_only=False)
    emb = np.asarray(b.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    qn = np.linalg.norm(q)
    sims = emb @ q / np.where(norms * qn == 0.0, 1.0, norms * qn)
    return ids, sims


def ann_topk(sf_dir: str, k: int = K_DEFAULT, query_vec_id: int = 0):
    """Exact cosine top-k; returns (rank, vec_id), rank 1-based, ties broken
    by vec_id ascending (same tiebreak as the SQL oracle)."""
    q = _query_vector(sf_dir, query_vec_id)
    q_ref = ray.put(q)

    def partial_topk(b: pa.Table) -> pa.Table:
        ids, sims = _batch_sims(b, ray.get(q_ref))
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "sim": pa.array(sims[order], pa.float64())})

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096).take_all()
    heap = [(-row["sim"], row["vec_id"]) for row in partials]
    heapq.heapify(heap)
    out_rank, out_id = [], []
    for rank in range(1, k + 1):
        if not heap:
            break
        s, vid = heapq.heappop(heap)
        out_rank.append(rank)
        out_id.append(vid)
    return pa.table({"rank": pa.array(out_rank, pa.int64()),
                     "vec_id": pa.array(out_id, pa.int64())})


SQL_ANN_TOPK = """
WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0)
SELECT CAST(row_number() OVER (
         ORDER BY list_cosine_similarity(
           list_transform(embedding, x -> CAST(x AS DOUBLE)),
           (SELECT qv FROM q)) DESC, vec_id) AS BIGINT) AS rank,
       vec_id
FROM embeddings
ORDER BY rank LIMIT 10
"""


# ---------------------------------------------------------------------------
def ann_topk_lsh(sf_dir: str, k: int = K_DEFAULT, query_vec_id: int = 0,
                 n_planes: int = 8, n_tables: int = 4, seed: int = 42):
    """LSH-bucketed ANN: random-hyperplane signatures per table; scan only
    rows sharing a bucket with the query in any table. At cluster scale the
    bucket column is the partition key (groupby bucket → per-bucket scan)."""
    q = _query_vector(sf_dir, query_vec_id)
    rng = np.random.default_rng(seed)
    dim = len(q)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    q_sigs = [(planes[t] @ q > 0).astype(np.uint8) for t in range(n_tables)]
    q_keys = {t * 256 + int(np.packbits(q_sigs[t][:8])[0])
              for t in range(n_tables)}
    planes_ref = ray.put(planes)
    q_ref = ray.put(q)

    def candidates(b: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        emb = np.asarray(b.column("embedding").to_pylist(), dtype=np.float64)
        keep = np.zeros(len(ids), dtype=bool)
        for t in range(n_tables):
            sig = (emb @ pl[t].T > 0).astype(np.uint8)
            keys = t * 256 + np.packbits(sig[:, :8], axis=1)[:, 0].astype(int)
            keep |= np.isin(keys, list(q_keys))
        if not keep.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        emb_k = emb[keep]
        ids_k = ids[keep]
        qv = ray.get(q_ref)
        norms = np.linalg.norm(emb_k, axis=1) * np.linalg.norm(qv)
        sims = emb_k @ qv / np.where(norms == 0.0, 1.0, norms)
        order = np.lexsort((ids_k, -sims))[:k]
        return pa.table({"vec_id": pa.array(ids_k[order], pa.int64()),
                         "sim": pa.array(sims[order], pa.float64())})

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(candidates, batch_format="pyarrow",
                              batch_size=4096).take_all()
    rows = sorted(partials, key=lambda r: (-r["sim"], r["vec_id"]))[:k]
    return pa.table({"rank": pa.array(range(1, len(rows) + 1), pa.int64()),
                     "vec_id": pa.array([r["vec_id"] for r in rows],
                                        pa.int64())})
