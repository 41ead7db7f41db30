"""Near-duplicate detection over the documents table.

Four detectors, all deterministic (seeded) and shaped for scale:

- MinHash + LSH: word-shingle → 64-perm minhash signature per doc
  (vectorized multiply-shift permutations) → banded LSH keys → groupby
  (band, band_hash) brings only colliding docs together → candidate pairs
  → exact Jaccard verification. The LSH groupby is the only shuffle; its
  groups are collision buckets, not the corpus.
- SimHash: 64-bit token-hash sign aggregate → 4×16-bit band buckets →
  Hamming-distance verification.
- n-gram Jaccard: the exact verifier exposed as its own operator (pairs in
  → jaccard out), used standalone on candidate pairs from any source.
- Embedding cosine near-dup: random-hyperplane buckets over the
  embeddings table → within-bucket pairwise cosine ≥ threshold.

Outputs use integer basis points (jaccard_bp / cos_bp) so results hash
deterministically. Jaccard/Hamming verification here broadcasts the
signature map (fits for ≤ ~10M docs); the documented scale path
repartitions candidate pairs by doc so each verify task reads only its
shard's shingle sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Count

from ..kernels.textutils import fnv1a_64
from ..pipelines.datasets import read_table

MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = text.lower().split()
    if len(toks) < k:
        joined = " ".join(toks)
        return np.asarray([fnv1a_64(joined.encode())], dtype=np.uint64)
    out = np.empty(len(toks) - k + 1, dtype=np.uint64)
    for i in range(len(toks) - k + 1):
        out[i] = fnv1a_64(" ".join(toks[i:i + k]).encode())
    return out


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """64-perm minhash: min over a fixed multiply-add hash family (uint64
    wraparound mixing), vectorized two-halves to keep low-bit entropy."""
    x = shingles.astype(np.uint64)
    lo = x & np.uint64(0xFFFFFFFF)
    hi = x >> np.uint64(32)
    sigs = np.empty(len(a), dtype=np.uint64)
    for i in range(len(a)):
        ai, bi = a[i], b[i]
        # (ai * x + bi) mod M using uint64 wrap as the mixing function —
        # not a true mod-M permutation, but a fixed deterministic hash
        # family is all minhash needs
        v = (ai * lo + (ai * hi << np.uint64(32)) + bi)
        sigs[i] = v.min()
    return sigs


class MinHasher:
    """Stateful per-actor minhash stage: permutation params initialized
    once (T-pattern: setup in __init__, work per batch)."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 42):
        self.a, self.b = _perm_params(n_perm, seed)
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sigs = [minhash_signature(_shingle_hashes(t, self.k),
                                  self.a, self.b).tobytes()
                for t in texts]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "sig": pa.array(sigs, pa.binary()),
        })


def _band_rows(batch: pa.Table, n_bands: int, rows_per_band: int) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("sig").to_pylist()
    o_band, o_hash, o_doc = [], [], []
    for did, sig in zip(doc_ids, sigs):
        arr = np.frombuffer(sig, dtype=np.uint64)
        for band in range(n_bands):
            chunk = arr[band * rows_per_band:(band + 1) * rows_per_band]
            o_band.append(band)
            o_hash.append(fnv1a_64(chunk.tobytes()) >> 1)
            o_doc.append(did)
    return pa.table({
        "band": pa.array(o_band, pa.int32()),
        "band_hash": pa.array(o_hash, pa.int64()),
        "doc_id": pa.array(o_doc, pa.int64()),
    })


def _candidate_pairs(grp: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(grp["doc_id"].tolist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": a, "doc_b": b})


def minhash_dedup(sf_dir: str, threshold_bp: int = 7000,
                  n_perm: int = 64, n_bands: int = 16):
    """MinHash-LSH near-dup pairs with exact Jaccard verification.
    Returns (doc_a, doc_b, jaccard_bp) for pairs ≥ threshold_bp/10000."""
    rows_per_band = n_perm // n_bands
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = docs.map_batches(MinHasher, batch_format="pyarrow",
                            concurrency=2, batch_size=1024)
    bands = sigs.map_batches(
        lambda b: _band_rows(b, n_bands, rows_per_band),
        batch_format="pyarrow")
    cands = (bands.groupby(["band", "band_hash"])
             .map_groups(lambda g: _candidate_pairs(g) if len(g) > 1
                         else pd.DataFrame({"doc_a": [], "doc_b": []}),
                         batch_format="pandas"))
    pairs = {(int(r["doc_a"]), int(r["doc_b"]))
             for r in cands.take_all()}
    # exact verification against the real shingle sets
    t = read_table(sf_dir, "documents",
                   columns=["doc_id", "text"]).to_pandas()
    shingle_map = {int(d): np.unique(_shingle_hashes(x))
                   for d, x in zip(t["doc_id"], t["text"])}
    out_a, out_b, out_j = [], [], []
    for da, db in sorted(pairs):
        sa, sb = shingle_map[da], shingle_map[db]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        bp = int(inter * 10000 // max(union, 1))
        if bp >= threshold_bp:
            out_a.append(da)
            out_b.append(db)
            out_j.append(bp)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "jaccard_bp": pa.array(out_j, pa.int64())})


# ---------------------------------------------------------------------------
def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash per doc over unigram token hashes."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        if not toks:
            out[i] = 0
            continue
        hs = np.fromiter((fnv1a_64(t.encode()) for t in set(toks)),
                         dtype=np.uint64)
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(((acc > 0).astype(np.uint64)
                            << shifts).sum(dtype=np.uint64))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "simhash": pa.array(out.view(np.int64), pa.int64()),
    })


def simhash_dedup(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs: 4×16-bit band buckets, Hamming-verified."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = docs.map_batches(simhash_batch, batch_format="pyarrow")
    t = sigs.to_pandas()
    sim = t["simhash"].to_numpy().view(np.uint64)
    ids = t["doc_id"].to_numpy()
    buckets: dict[tuple[int, int], list[int]] = {}
    for band in range(4):
        keys = (sim >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        for i, key in enumerate(keys):
            buckets.setdefault((band, int(key)), []).append(i)
    pairs = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                if int(ids[i]) != int(ids[j]):
                    pairs.add((min(int(ids[i]), int(ids[j])),
                               max(int(ids[i]), int(ids[j])),
                               int(bin(int(sim[i]) ^ int(sim[j])).count("1"))))
    out = sorted(p for p in pairs if p[2] <= max_hamming)
    return pa.table({
        "doc_a": pa.array([p[0] for p in out], pa.int64()),
        "doc_b": pa.array([p[1] for p in out], pa.int64()),
        "hamming": pa.array([p[2] for p in out], pa.int64()),
    })


# ---------------------------------------------------------------------------
def ngram_jaccard(sf_dir: str, pairs=None, k: int = 3):
    """Exact n-gram Jaccard for given (or all-LSH-candidate) doc pairs."""
    if pairs is None:
        mh = minhash_dedup(sf_dir, threshold_bp=0)
        return mh  # all verified candidates with their jaccard_bp
    t = read_table(sf_dir, "documents",
                   columns=["doc_id", "text"]).to_pandas()
    smap = {int(d): np.unique(_shingle_hashes(x, k))
            for d, x in zip(t["doc_id"], t["text"])}
    out_a, out_b, out_j = [], [], []
    for da, db in pairs:
        sa, sb = smap[da], smap[db]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        out_a.append(da)
        out_b.append(db)
        out_j.append(int(inter * 10000 // max(union, 1)))
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "jaccard_bp": pa.array(out_j, pa.int64())})


# ---------------------------------------------------------------------------
def embedding_neardup(sf_dir: str, threshold_bp: int = 9500,
                      n_planes: int = 12, seed: int = 42):
    """Embedding-cosine near-dup pairs via random-hyperplane buckets."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    unit = emb / norms[:, None]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, emb.shape[1]))
    keys = ((unit @ planes.T) > 0).astype(np.uint64)
    bucket_key = (keys << np.arange(n_planes, dtype=np.uint64)).sum(axis=1)
    pairs = set()
    buckets: dict[int, list[int]] = {}
    for i, k in enumerate(bucket_key):
        buckets.setdefault(int(k), []).append(i)
    for members in buckets.values():
        if len(members) < 2:
            continue
        sub = unit[members]
        cos = sub @ sub.T
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                bp = int(np.floor(cos[x, y] * 10000))
                if bp >= threshold_bp:
                    a, b = ids[members[x]], ids[members[y]]
                    pairs.add((min(int(a), int(b)), max(int(a), int(b)), bp))
    out = sorted(pairs)
    return pa.table({
        "vec_a": pa.array([p[0] for p in out], pa.int64()),
        "vec_b": pa.array([p[1] for p in out], pa.int64()),
        "cos_bp": pa.array([p[2] for p in out], pa.int64()),
    })
