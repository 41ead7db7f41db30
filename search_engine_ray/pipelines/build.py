"""Index build pipeline: pages → parsed docs → doc-sharded posting-list
segments, checkpoint-resumable with a manifest.

Ray-Data-first rebuild of the reference ingest path (SURVEY.md §3.1):

    read pages (or synthesize from documents)
      → exact url-dedup (two-phase: 8-byte-hash count shuffle + broadcast
        filter; only flagged duplicate urls go through a groupby —
        upgrades the reference's approximate Bloom filter, Parser.cpp:293-299)
      → map_batches(parse_pages_batch)      [M1-M5, F2/F3, stateless tasks]
      → deterministic doc ids (64-bit url fingerprint) + doc shard
      → sort by shard — THE single all-to-all exchange of the build —
        and write docs/ parquet hive-partitioned by shard  [checkpoint 1]
      → corpus stats aggregate over the dl column (pruned read)
      → per-shard segment tasks: each reads docs/shard=N, builds the
        shard's posting lists in memory (emit + sort + delta-varint encode
        + 128-doc block-max), writes segments/shard=N atomically —
        embarrassingly parallel, zero further shuffle, and each completed
        shard is skipped on re-run (per-partition lineage/resume)
      → global term stats (df/cf) via a small groupby over segment rows
      → manifest.json                                  [completion marker]

Skew: the shard key bounds every segment task by docs_per_shard documents
regardless of term skew — a head term's global posting list is the
order-preserving concatenation of its per-shard lists because shards
partition the doc-id space (SURVEY.md §4.3).

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

from ..kernels.textutils import fnv1a_64, fnv1a_64_arrow
from ..stages.parse import parse_pages_batch
from ..state import segments as seg

PARSE_BATCH_SIZE = 1024
EMIT_BATCH_SIZE = 1024


def _fingerprint_urls(urls) -> np.ndarray:
    """Deterministic 64-bit url fingerprints; vectorized over an Arrow
    column when given one."""
    import pyarrow as _pa
    if isinstance(urls, (_pa.Array, _pa.ChunkedArray)):
        return (fnv1a_64_arrow(urls) >> np.uint64(1)).astype(np.int64)
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

    def to_hash(t: pa.Table) -> pa.Table:
        h = _fingerprint_urls(t.column("url"))
        return pa.table({"url_hash": pa.array(h, pa.int64())})

    # shuffle 8-byte hashes, not strings; a hash collision only routes an
    # extra url through the (url-keyed, thus still exact) groupby below.
    # Below ~50M pages the hash array fits on the driver (8B/row): collect
    # and count with numpy instead of paying a full groupby execution; the
    # groupby path engages automatically beyond that.
    hash_ds = url_ds.map_batches(to_hash, batch_format="pyarrow")
    n_est = hash_ds.count()
    if n_est <= 50_000_000:
        arrs = [b["url_hash"] for b in hash_ds.iter_batches(
            batch_size=1_048_576, batch_format="numpy")]
        all_h = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
        uniq, cnt = np.unique(all_h, return_counts=True)
        dup_hashes = uniq[cnt > 1]
    else:
        counts = hash_ds.groupby("url_hash").aggregate(Count(alias_name="n"))
        dup_rows = counts.map_batches(
            lambda t: t.filter(pa.compute.greater(t["n"], 1)),
            batch_format="pyarrow").take_all()
        dup_hashes = np.asarray([r["url_hash"] for r in dup_rows],
                                dtype=np.int64)
    pages = pages_factory(None)
    if not len(dup_hashes):
        return pages
    dup_ref = ray.put(frozenset(int(x) for x in dup_hashes))

    def split(keep_dups: bool):
        def fn(t: pa.Table) -> pa.Table:
            dups = ray.get(dup_ref)
            h = _fingerprint_urls(t.column("url"))
            mask = np.fromiter((x in dups for x in h), dtype=bool,
                               count=t.num_rows)
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
        doc_ids = _fingerprint_urls(t.column("url"))
        shard = (doc_ids % num_shards).astype(np.int32)
        # one flags byte per kept term → dl without touching the terms col
        dl = pa.compute.binary_length(t.column("flags")).cast(
            pa.int32()).to_numpy(zero_copy_only=False)
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

    shards = t.column("shard").to_pylist()
    doc_ids = t.column("doc_id").to_pylist()
    dls = t.column("dl").to_pylist()
    term_strs = t.column("terms").to_pylist()

    o_shard, o_term, o_doc, o_tf, o_dl, o_pos = [], [], [], [], [], []
    for sh, did, dl, terms_s in zip(shards, doc_ids, dls, term_strs):
        positions: dict[str, list[int]] = {}
        setdefault = positions.setdefault
        for pos, term in enumerate(terms_s.split(" ") if terms_s else ()):
            setdefault(term, []).append(pos)
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


def build_shard_segment(docs: pa.Table, shard: int, avgdl: float) -> pa.Table:
    """Build one shard's full segment table in memory, fully vectorized:
    Arrow split → lexsort run detection (stages/emit.py) → per-term
    delta-varint encode + 128-doc block-max.

    Runs inside a per-shard task over docs/shard=N (at most docs_per_shard
    docs — the explicit skew/size bound, SURVEY.md §4.3)."""
    from ..kernels import varint
    from ..stages.emit import emit_postings_columnar

    doc_ids_in = np.asarray(docs.column("doc_id").to_pylist(),
                            dtype=np.int64)
    dls_in = np.asarray(docs.column("dl").to_pylist(), dtype=np.int64)
    runs = emit_postings_columnar(doc_ids_in, dls_in, docs.column("terms"))

    terms = runs["terms"]
    doc_ids = runs["run_doc"]
    tfs = runs["run_tf"]
    dls = runs["run_dl"]
    pos_stream = runs["pos_stream"]
    byte_offs = runs["run_byte_offsets"]

    # runs arrive sorted by (term-code, doc); re-sort by term STRING so the
    # output ordering is deterministic and binary-searchable
    order = np.lexsort((doc_ids, terms))
    terms = terms[order]
    doc_ids = doc_ids[order]
    tfs = tfs[order]
    dls = dls[order]
    impacts = seg.bm25_impact(tfs, dls, avgdl).astype(np.float32)
    mv = memoryview(pos_stream)

    uniq, starts = np.unique(terms, return_index=True)
    bounds = np.append(starts, len(terms))

    o_term, o_df, o_cf = [], [], []
    o_docg, o_tfs, o_pos, o_blast, o_bmax = [], [], [], [], []
    for t_i in range(len(uniq)):
        lo, hi = bounds[t_i], bounds[t_i + 1]
        ids = doc_ids[lo:hi]
        t_tfs = tfs[lo:hi]
        imp = impacts[lo:hi]
        n = hi - lo
        nblocks = (n + seg.BLOCK_SIZE - 1) // seg.BLOCK_SIZE
        ends = np.minimum(np.arange(1, nblocks + 1) * seg.BLOCK_SIZE, n)
        block_last = ids[ends - 1]
        block_max = np.maximum.reduceat(imp, np.arange(0, n, seg.BLOCK_SIZE))
        o_term.append(uniq[t_i])
        o_df.append(n)
        o_cf.append(int(t_tfs.sum()))
        o_docg.append(varint.encode_gaps(ids.astype(np.uint64)))
        o_tfs.append(varint.encode_u64_stream(t_tfs.astype(np.uint64)))
        o_pos.append(b"".join(
            mv[byte_offs[order[j]]:byte_offs[order[j] + 1]]
            for j in range(lo, hi)))
        o_blast.append(varint.encode_gaps(block_last.astype(np.uint64)))
        o_bmax.append(block_max.astype(np.float32).tobytes())

    return pa.table({
        "shard": pa.array([shard] * len(uniq), pa.int32()),
        "term": pa.array(list(o_term), pa.string()),
        "df": pa.array(o_df, pa.int64()),
        "cf": pa.array(o_cf, pa.int64()),
        "doc_gaps": pa.array(o_docg, pa.binary()),
        "tfs": pa.array(o_tfs, pa.binary()),
        "pos_gaps": pa.array(o_pos, pa.binary()),
        "block_last_doc": pa.array(o_blast, pa.binary()),
        "block_max_impact": pa.array(o_bmax, pa.binary()),
    })


class _SegmentShardTask:
    """Per-shard segment builder: reads docs/shard=N, writes
    segments/shard=N atomically (tmp file + _SUCCESS marker). Stateless
    apart from config; runs as plain Ray Data tasks over a shard-id list.
    """

    def __init__(self, docs_dir: str, segments_dir: str, avgdl: float):
        self.docs_dir = docs_dir
        self.segments_dir = segments_dir
        self.avgdl = avgdl

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out_shards, out_terms, out_postings = [], [], []
        build_ids = (batch.column("build_id").to_pylist()
                     if "build_id" in batch.column_names
                     else [""] * batch.num_rows)
        for shard, build_id in zip(batch.column("shard").to_pylist(),
                                   build_ids):
            shard = int(shard)
            src = os.path.join(self.docs_dir, f"shard={shard}")
            dst = os.path.join(self.segments_dir, f"shard={shard}")
            docs = pq.read_table(src, columns=["doc_id", "dl", "terms"])
            segment = build_shard_segment(docs, shard, self.avgdl)
            tmp = dst + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            # the hive dir name carries the shard; keeping the column too
            # would clash with partition inference on whole-dir reads
            pq.write_table(segment.drop_columns(["shard"]),
                           os.path.join(tmp, "segment.parquet"))
            with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
                f.write(build_id)
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(tmp, dst)
            out_shards.append(shard)
            out_terms.append(segment.num_rows)
            out_postings.append(int(pa.compute.sum(
                segment.column("df")).as_py() or 0))
        return pa.table({
            "shard": pa.array(out_shards, pa.int32()),
            "n_terms": pa.array(out_terms, pa.int64()),
            "n_postings": pa.array(out_postings, pa.int64()),
        })


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
    from ray.data import DataContext
    try:  # ~10% faster map-side sort blocks for the cluster exchange
        DataContext.get_current().use_polars_sort = True
    except Exception:
        pass

    cfg = {"docs_per_shard": docs_per_shard, "version": 9}
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
    if not _stage_done(index_dir, "docs_flat", cfg_hash) \
            and not _stage_done(index_dir, "docs", cfg_hash):
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
        _atomic_write(docs, docs_dir + "_flat")
        _mark_stage(index_dir, "docs_flat", cfg_hash,
                    num_shards=num_shards,
                    parse_wall_s=round(time.time() - t0, 3))

    tc = time.time()
    if not _stage_done(index_dir, "docs", cfg_hash):
        # cluster by shard — the single all-to-all of the build. Sorting the
        # parquet checkpoint (not the live parse pipeline) matters: Ray's
        # sort samples its input by executing the upstream, which would run
        # the parser twice.
        docs = rd.read_parquet(docs_dir + "_flat")
        docs = docs.sort("shard")
        _atomic_write(docs, docs_dir, partition_cols=["shard"])
        shutil.rmtree(docs_dir + "_flat", ignore_errors=True)
        _mark_stage(index_dir, "docs", cfg_hash,
                    cluster_wall_s=round(time.time() - tc, 3),
                    docs_wall_s=round(time.time() - t0, 3),
                    docs_build_id=f"{cfg_hash}-{time.time_ns()}")

    man = seg.read_manifest(index_dir)
    num_shards = man["stats"]["num_shards"]

    t1 = time.time()
    if not _stage_done(index_dir, "segments", cfg_hash):
        stats = rd.read_parquet(docs_dir, columns=["dl"]).aggregate(
            Count(alias_name="n_docs"), Sum("dl", alias_name="total_dl"))
        n_docs = int(stats["n_docs"])
        avgdl = float(stats["total_dl"]) / max(n_docs, 1)

        os.makedirs(segments_dir, exist_ok=True)
        # a shard is done only if its _SUCCESS marker matches the CURRENT
        # docs build — markers from an older docs build are stale (e.g.
        # after force=True or a config change rebuilt the docs stage)
        build_id = man["stats"].get("docs_build_id", cfg_hash)

        def _shard_done(s: int) -> bool:
            marker = os.path.join(segments_dir, f"shard={s}", "_SUCCESS")
            try:
                with open(marker) as f:
                    return f.read().strip() == build_id
            except OSError:
                return False

        # drop shard dirs beyond the current shard count (stale layout)
        for name in os.listdir(segments_dir):
            if name.startswith("shard=") \
                    and int(name.split("=", 1)[1]) >= num_shards:
                shutil.rmtree(os.path.join(segments_dir, name),
                              ignore_errors=True)
        work = [{"shard": s, "build_id": build_id}
                for s in range(num_shards) if not _shard_done(s)]
        if work:
            # stateful actor-pool merge workers (north-rule component):
            # config held per actor, one shard merged+encoded per batch
            n_workers = max(1, min(
                len(work), int(ray.cluster_resources().get("CPU", 8))))
            shard_tasks = rd.from_items(work).map_batches(
                _SegmentShardTask,
                fn_constructor_args=(docs_dir, segments_dir, avgdl),
                batch_size=1, batch_format="pyarrow",
                concurrency=n_workers)
            shard_tasks.materialize()  # drive the per-shard workers
        _mark_stage(index_dir, "segments", cfg_hash, n_docs=n_docs,
                    avgdl=avgdl, segments_wall_s=round(time.time() - t1, 3))

    t2 = time.time()
    if not _stage_done(index_dir, "terms", cfg_hash):
        # per-shard files are already per-term-unique, so batches are
        # partial (term, df, cf) rows; merge on the driver while the vocab
        # fits (a groupby execution costs more than the data here), else
        # fall back to the distributed groupby
        segs = rd.read_parquet(segments_dir, columns=["term", "df", "cf"])
        import pandas as pd
        parts = [b for b in segs.iter_batches(batch_size=1_048_576,
                                              batch_format="pandas")]
        total_rows = sum(len(b) for b in parts)
        if total_rows <= 20_000_000:
            merged = (pd.concat(parts, ignore_index=True)
                      .groupby("term", as_index=False)[["df", "cf"]].sum())
            import pyarrow.parquet as _pq
            tmp = terms_path + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            _pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                            os.path.join(tmp, "terms.parquet"))
            shutil.rmtree(terms_path, ignore_errors=True)
            os.replace(tmp, terms_path)
        else:
            terms = segs.groupby("term").aggregate(
                Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
            _atomic_write(terms, terms_path)
        man = _mark_stage(index_dir, "terms", cfg_hash,
                          terms_wall_s=round(time.time() - t2, 3),
                          total_wall_s=round(time.time() - t0, 3))
    return seg.read_manifest(index_dir)
