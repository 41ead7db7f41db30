"""Index build pipeline: pages → parsed docs → doc-sharded posting-list
segments, checkpoint-resumable with a manifest.

Ray-Data-first rebuild of the reference ingest path (SURVEY.md §3.1):

    read pages (or synthesize from documents)
      → exact url-dedup (two-phase: tiny count shuffle + broadcast filter;
        only flagged duplicate urls go through a groupby — upgrades the
        reference's approximate Bloom filter, Parser.cpp:293-299)
      → map_batches(parse_pages_batch)      [M1-M5, F2/F3, stateless tasks]
      → deterministic doc ids (64-bit url fingerprint) + doc shard
      → write docs/ parquet partitioned by shard      [checkpoint 1]
      → corpus stats aggregate (N docs, avg doc length)
      → flat postings emit (term, doc_id, tf, positions) per batch
      → groupby(shard, term).map_groups(encode)  [the one big shuffle;
        shard key bounds group size = skew handling, SURVEY.md §4.3]
      → write segments/ parquet partitioned by shard  [checkpoint 2]
      → global term stats (df) via a second small groupby
      → manifest.json                                  [completion marker]

Resumability: each stage writes to a tmp dir then atomically renames; the
manifest records completed stages + the build config hash, so a re-run with
the same config skips finished stages (per-partition lineage lives in the
shard=N directory layout — a partial segment write never becomes visible).

Determinism note: doc_id = fnv1a_64(url) >> 1. At 1e12 docs a 64-bit
fingerprint would collide (birthday bound); the scale path is the same
pipeline with a 128-bit hash split into (id_hi, id_lo) — the 64-bit id here
keeps every downstream array a primitive numpy column.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..kernels.textutils import fnv1a_64
from ..stages.parse import parse_pages_batch
from ..state import segments as seg

PARSE_BATCH_SIZE = 256
EMIT_BATCH_SIZE = 512


def _fingerprint_urls(urls) -> np.ndarray:
    return np.fromiter((fnv1a_64(u.encode()) >> 1 for u in urls),
                       dtype=np.int64, count=len(urls))


# ---------------------------------------------------------------------------
# stage helpers
# ---------------------------------------------------------------------------

def dedup_pages_by_url(pages_factory) -> "rd.Dataset":
    """Exact, deterministic url dedup.

    Phase 1 shuffles ONLY the url column (pruned read) to find duplicated
    urls — at web scale a tiny fraction. Phase 2 streams the full pages:
    non-flagged urls pass through; flagged urls go through a groupby that
    keeps the copy with the smallest html fingerprint (deterministic
    regardless of block order — the reference's first-arrival Bloom rule is
    racy, SURVEY.md §2.10).
    """
    url_ds = pages_factory(["url"])
    counts = url_ds.groupby("url").aggregate(Count(alias_name="n"))
    dup_rows = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t["n"], 1)),
        batch_format="pyarrow").take_all()
    pages = pages_factory(None)
    if not dup_rows:
        return pages
    dup_ref = ray.put(frozenset(r["url"] for r in dup_rows))

    def split(keep_dups: bool):
        def fn(t: pa.Table) -> pa.Table:
            dups = ray.get(dup_ref)
            mask = np.fromiter((u in dups for u in t.column("url").to_pylist()),
                               dtype=bool, count=t.num_rows)
            return t.filter(pa.array(mask if keep_dups else ~mask))
        return fn

    uniq = pages.map_batches(split(False), batch_format="pyarrow")

    def pick_winner(g: pa.Table) -> pa.Table:
        htmls = g.column("html").to_pylist()
        fps = [fnv1a_64(h) for h in htmls]
        return g.take([int(np.argmin(fps))])

    flagged = (pages.map_batches(split(True), batch_format="pyarrow")
               .groupby("url").map_groups(pick_winner,
                                          batch_format="pyarrow"))
    return uniq.union(flagged)


def _assign_ids(num_shards: int):
    def fn(t: pa.Table) -> pa.Table:
        if "doc_id" in t.column_names:  # source-provided id; ours is the
            t = t.drop_columns(["doc_id"])  # url fingerprint
        urls = t.column("url").to_pylist()
        doc_ids = _fingerprint_urls(urls)
        shard = (doc_ids % num_shards).astype(np.int32)
        dl = (np.asarray([len(x) for x in t.column("title_terms").to_pylist()])
              + np.asarray([len(x) for x in t.column("body_terms").to_pylist()])
              ).astype(np.int32)
        t = t.append_column("doc_id", pa.array(doc_ids, pa.int64()))
        t = t.append_column("shard", pa.array(shard, pa.int32()))
        return t.append_column("dl", pa.array(dl, pa.int32()))
    return fn


def _emit_postings(t: pa.Table) -> pa.Table:
    """docs → flat (shard, term, doc_id, tf, dl, pos_bytes) rows.

    pos_bytes is the per-doc varint gap encoding (first absolute), so the
    group encoder just concatenates byte slices in doc order — positions
    never get re-materialized in the shuffle.
    """
    from ..kernels.varint import encode_varint

    # hive-partitioned reads may restore the partition column as strings
    shards = [int(s) for s in t.column("shard").to_pylist()]
    doc_ids = t.column("doc_id").to_pylist()
    dls = t.column("dl").to_pylist()
    tterms = t.column("title_terms").to_pylist()
    bterms = t.column("body_terms").to_pylist()

    o_shard, o_term, o_doc, o_tf, o_dl, o_pos = [], [], [], [], [], []
    for sh, did, dl, tt, bt in zip(shards, doc_ids, dls, tterms, bterms):
        positions: dict[str, list[int]] = {}
        for pos, term in enumerate(tt + bt):
            positions.setdefault(term, []).append(pos)
        for term, plist in positions.items():
            buf = bytearray()
            prev = None
            for p in plist:
                encode_varint(p if prev is None else p - prev, buf)
                prev = p
            o_shard.append(sh)
            o_term.append(term)
            o_doc.append(did)
            o_tf.append(len(plist))
            o_dl.append(dl)
            o_pos.append(bytes(buf))
    return pa.table({
        "shard": pa.array(o_shard, pa.int32()),
        "term": pa.array(o_term, pa.string()),
        "doc_id": pa.array(o_doc, pa.int64()),
        "tf": pa.array(o_tf, pa.int32()),
        "dl": pa.array(o_dl, pa.int32()),
        "pos_bytes": pa.array(o_pos, pa.binary()),
    })


def _encode_group(avgdl: float):
    def fn(g: pa.Table) -> pa.Table:
        doc_ids = np.asarray(g.column("doc_id").to_pylist(), dtype=np.int64)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order]
        tfs = np.asarray(g.column("tf").to_pylist(),
                         dtype=np.int64)[order]
        dls = np.asarray(g.column("dl").to_pylist(), dtype=np.int64)[order]
        pos_bytes = g.column("pos_bytes").to_pylist()
        pos_concat = b"".join(pos_bytes[i] for i in order)

        impacts = seg.bm25_impact(tfs, dls, avgdl)
        n = len(doc_ids)
        nblocks = (n + seg.BLOCK_SIZE - 1) // seg.BLOCK_SIZE
        block_last = doc_ids[np.minimum(
            np.arange(1, nblocks + 1) * seg.BLOCK_SIZE, n) - 1]
        block_max = np.array(
            [impacts[b * seg.BLOCK_SIZE:(b + 1) * seg.BLOCK_SIZE].max()
             for b in range(nblocks)], dtype=np.float32)

        from ..kernels import varint
        return pa.table({
            "shard": pa.array([int(g.column("shard")[0].as_py())],
                              pa.int32()),
            "term": g.column("term").slice(0, 1),
            "df": pa.array([n], pa.int64()),
            "cf": pa.array([int(tfs.sum())], pa.int64()),
            "doc_gaps": pa.array(
                [varint.encode_gaps(doc_ids.astype(np.uint64))], pa.binary()),
            "tfs": pa.array(
                [varint.encode_u64_stream(tfs.astype(np.uint64))], pa.binary()),
            "pos_gaps": pa.array([pos_concat], pa.binary()),
            "block_last_doc": pa.array(
                [varint.encode_gaps(block_last.astype(np.uint64))],
                pa.binary()),
            "block_max_impact": pa.array([block_max.tobytes()], pa.binary()),
        })
    return fn


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _stage_done(index_dir: str, stage: str, cfg_hash: str) -> bool:
    man = seg.read_manifest(index_dir)
    return bool(man and man.get("config_hash") == cfg_hash
                and stage in man.get("stages_done", []))


def _mark_stage(index_dir: str, stage: str, cfg_hash: str, **extra) -> dict:
    man = seg.read_manifest(index_dir) or {}
    if man.get("config_hash") != cfg_hash:
        man = {"config_hash": cfg_hash, "stages_done": [], "stats": {}}
    if stage not in man["stages_done"]:
        man["stages_done"].append(stage)
    man["stats"].update(extra)
    seg.write_manifest(index_dir, man)
    return man


def _atomic_write(ds: "rd.Dataset", out_dir: str, **kwargs) -> None:
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, **kwargs)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)


def build_index(pages_factory, index_dir: str, *, docs_per_shard: int = 4096,
                force: bool = False) -> dict:
    """Build (or resume) the sharded index under ``index_dir``.

    ``pages_factory(columns)`` returns a pages Dataset, pruning to
    ``columns`` when given (so the dedup url pass never reads html).
    Returns the manifest dict.
    """
    cfg = {"docs_per_shard": docs_per_shard, "version": 3}
    cfg_hash = hashlib.sha256(
        json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]
    os.makedirs(index_dir, exist_ok=True)
    if force:
        seg.write_manifest(index_dir, {"config_hash": "", "stages_done": [],
                                       "stats": {}})

    docs_dir = os.path.join(index_dir, "docs")
    segments_dir = os.path.join(index_dir, "segments")
    terms_path = os.path.join(index_dir, "terms")

    t0 = time.time()
    if not _stage_done(index_dir, "docs", cfg_hash):
        # shard count from the (pre-dedup) page count: metadata-only for
        # parquet sources, one cheap column pass for synthesized pages
        n_pages_estimate = pages_factory(["url"]).count()
        num_shards = max(1, -(-n_pages_estimate // docs_per_shard))
        deduped = dedup_pages_by_url(pages_factory)
        docs = deduped.map_batches(parse_pages_batch,
                                   batch_format="pyarrow",
                                   batch_size=PARSE_BATCH_SIZE)
        docs = docs.map_batches(_assign_ids(num_shards),
                                batch_format="pyarrow")
        _atomic_write(docs, docs_dir, partition_cols=["shard"])
        _mark_stage(index_dir, "docs", cfg_hash,
                    num_shards=num_shards,
                    docs_wall_s=round(time.time() - t0, 3))

    man = seg.read_manifest(index_dir)
    num_shards = man["stats"]["num_shards"]

    t1 = time.time()
    if not _stage_done(index_dir, "segments", cfg_hash):
        docs = rd.read_parquet(docs_dir,
                               columns=["doc_id", "shard", "dl",
                                        "title_terms", "body_terms"])
        stats = docs.aggregate(Count(alias_name="n_docs"),
                               Sum("dl", alias_name="total_dl"))
        n_docs = int(stats["n_docs"])
        avgdl = float(stats["total_dl"]) / max(n_docs, 1)

        docs = rd.read_parquet(docs_dir,
                               columns=["doc_id", "shard", "dl",
                                        "title_terms", "body_terms"])
        postings = docs.map_batches(_emit_postings, batch_format="pyarrow",
                                    batch_size=EMIT_BATCH_SIZE)
        segments = postings.groupby(["shard", "term"]).map_groups(
            _encode_group(avgdl), batch_format="pyarrow")
        _atomic_write(segments, segments_dir, partition_cols=["shard"])
        _mark_stage(index_dir, "segments", cfg_hash, n_docs=n_docs,
                    avgdl=avgdl, segments_wall_s=round(time.time() - t1, 3))

    t2 = time.time()
    if not _stage_done(index_dir, "terms", cfg_hash):
        segs = rd.read_parquet(segments_dir, columns=["term", "df", "cf"])
        terms = segs.groupby("term").aggregate(
            Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
        _atomic_write(terms, terms_path)
        man = _mark_stage(index_dir, "terms", cfg_hash,
                          terms_wall_s=round(time.time() - t2, 3),
                          total_wall_s=round(time.time() - t0, 3))
    return seg.read_manifest(index_dir)
