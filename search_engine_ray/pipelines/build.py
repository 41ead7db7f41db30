"""Index build pipeline: pages → parsed docs → doc-sharded posting-list
segments, checkpoint-resumable with a manifest.

Ray-Data-first rebuild of the reference ingest path (SURVEY.md §3.1):

    read pages (or synthesize from documents)
      → exact url-dedup (8-byte-hash count pass + broadcast filter; only
        flagged duplicate urls go through a groupby — upgrades the
        reference's approximate Bloom filter, Parser.cpp:293-299)
      → map_batches(parse_pages_batch)      [M1-M5, F2/F3, stateless tasks]
      → deterministic doc ids (64-bit url fingerprint) + doc shard
      → write docs/gen=0 parquet, unsorted             [checkpoint 1]
      → docmeta: NARROW per-doc attribute table sorted+partitioned by
        shard for the query actors (the wide terms column never shuffles)
      → corpus stats aggregate over docmeta's dl column
      → postings exchange (pipelines/exchange.py): map side emits
        vectorized per-(term,doc) posting runs grouped by shard-group to
        tmpfs; stateful actor-pool merge workers concat+sort+encode final
        per-shard segments (delta-gap varint + 128-doc block-max), written
        atomically with build-id markers — per-partition resume; Ray
        sort/groupby appear nowhere in the postings path
      → global term stats (df/cf): driver merge under a size threshold,
        distributed groupby beyond
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
# measured (BENCH/BASELINE.md r2): the emit kernel's per-doc cost grows
# with batch size (cache locality of the run lexsort + take) — 2048 adds
# ~2s over parse-only at 800k×5KB/32cpu, 4096 adds ~9s, 16384 is 4× worse
EMIT_BATCH_SIZE = 2048

# file schema of an (empty) per-shard docmeta dir — the shard id lives in
# the hive directory name, exactly as write_parquet(partition_cols) did
_EMPTY_DOCMETA = pa.table({
    "doc_id": pa.array([], pa.int64()),
    "dl": pa.array([], pa.int32()),
    "url": pa.array([], pa.string()),
    "title": pa.array([], pa.string()),
    "word_count": pa.array([], pa.uint32()),
    "title_length": pa.array([], pa.uint32()),
    "url_length": pa.array([], pa.uint32()),
    "english": pa.array([], pa.bool_()),
    "tld": pa.array([], pa.uint8()),
})


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

def _dup_hashes_and_count(url_ds, to_hash) -> tuple[np.ndarray, int]:
    """The url-hash pass yields BOTH the duplicate set and the page count
    (the count used to be a separate full pass). count() here is
    metadata-only for parquet sources; it also sizes the path choice
    BEFORE anything is collected to the driver."""
    n = url_ds.count()
    hash_ds = url_ds.map_batches(to_hash, batch_format="pyarrow")
    if n <= 50_000_000:
        arrs = [b["url_hash"] for b in hash_ds.iter_batches(
            batch_size=1_048_576, batch_format="numpy")]
        all_h = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
        uniq, cnt = np.unique(all_h, return_counts=True)
        return uniq[cnt > 1], n
    counts = hash_ds.groupby("url_hash").aggregate(Count(alias_name="n"))
    dup_rows = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t["n"], 1)),
        batch_format="pyarrow").take_all()
    return np.asarray([r["url_hash"] for r in dup_rows],
                      dtype=np.int64), n


def dedup_pages_by_url(pages_factory) -> "rd.Dataset":
    return dedup_pages_with_count(pages_factory)[0]


def dedup_pages_with_count(pages_factory) -> tuple["rd.Dataset", int]:
    """Exact, deterministic url dedup; also returns the pre-dedup page
    count from the same hash pass.

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
    dup_hashes, n_pages = _dup_hashes_and_count(url_ds, to_hash)
    pages = pages_factory(None)
    if not len(dup_hashes):
        return pages, n_pages
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
    return uniq.union(flagged), n_pages


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


def _exchange_dir_for(index_dir: str) -> str:
    """Transient shuffle data lives on tmpfs (the single-node analogue of
    shuffling through node-local SSD/RAM); final artifacts stay on disk."""
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else index_dir
    return os.path.join(
        shm, "se_exchange_" + hashlib.sha256(
            os.path.abspath(index_dir).encode()).hexdigest()[:12])


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
    # the early-spawned merge actor pool must die on EVERY exit path —
    # an exception between spawn and merge would otherwise leak
    # num_cpus=0 actors until the driver exits
    merge_pool: list = []
    try:
        return _build_index(pages_factory, index_dir, docs_per_shard,
                            force, merge_pool)
    finally:
        for a in merge_pool:
            try:
                ray.kill(a)
            except Exception:
                pass


def _build_index(pages_factory, index_dir: str, docs_per_shard: int,
                 force: bool, merge_pool: list) -> dict:
    from ray.data import DataContext
    try:  # ~10% faster map-side sort blocks for the cluster exchange
        DataContext.get_current().use_polars_sort = True
    except Exception:
        pass

    cfg = {"docs_per_shard": docs_per_shard, "version": 19}
    cfg_hash = hashlib.sha256(
        json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]
    os.makedirs(index_dir, exist_ok=True)
    if force:
        seg.write_manifest(index_dir, {"config_hash": "", "stages_done": [],
                                       "stats": {}})

    docs_dir = os.path.join(index_dir, "docs")
    segments_dir = os.path.join(index_dir, "segments")
    terms_path = os.path.join(index_dir, "terms")

    exchange_dir = _exchange_dir_for(index_dir)

    def _spawn_merge_pool(num_shards: int, num_groups: int,
                          build_id: str) -> list:
        """Spawn the stateful merge actor pool EARLY so its process
        spin-up and imports overlap the map pass; avgdl is delivered at
        merge_groups() call time."""
        from .exchange import _GroupMergeWorker

        n_workers = max(1, min(
            num_groups, int(ray.cluster_resources().get("CPU", 8))))
        # num_cpus=0: the pool idles (holding no CPU slots) while the map
        # pass runs; by the time merge_groups() calls arrive the map is
        # done and nothing competes for cores
        actor_cls = ray.remote(num_cpus=0)(_GroupMergeWorker)
        return [actor_cls.remote(exchange_dir, segments_dir, num_shards,
                                 None, build_id,
                                 os.path.join(index_dir, "docmeta"))
                for _ in range(n_workers)]

    t0 = time.time()
    if not _stage_done(index_dir, "docs", cfg_hash):
        from .exchange import _PartialExchangeWriter

        # ONE streaming pass: dedup-filter → parse → assign ids → emit
        # postings+docmeta exchange partials (side effect, idempotent
        # filenames) → write the docs checkpoint. No re-read of the wide
        # terms column, no separate docmeta sort, no extra stage barrier.
        deduped, n_pages_estimate = dedup_pages_with_count(pages_factory)
        num_shards = max(1, -(-n_pages_estimate // docs_per_shard))
        num_groups = max(1, min(num_shards, 64))
        new_build_id = f"{cfg_hash}-{time.time_ns()}"
        shutil.rmtree(exchange_dir, ignore_errors=True)
        os.makedirs(exchange_dir, exist_ok=True)
        # merge actors spin up (process spawn + imports) while the fused
        # map pass below streams
        merge_pool[:] = _spawn_merge_pool(num_shards, num_groups,
                                          new_build_id)
        writer = _PartialExchangeWriter(exchange_dir, num_shards,
                                        num_groups, emit_meta=True,
                                        passthrough=True)
        docs = (deduped
                .map_batches(parse_pages_batch, batch_format="pyarrow",
                             batch_size=PARSE_BATCH_SIZE)
                .map_batches(_assign_ids(num_shards),
                             batch_format="pyarrow")
                .map_batches(writer.__call__, batch_size=EMIT_BATCH_SIZE,
                             batch_format="pyarrow"))
        # replace the WHOLE docs dir (a base build resets all generations)
        tmp_root = docs_dir + ".tmp"
        shutil.rmtree(tmp_root, ignore_errors=True)
        docs.write_parquet(os.path.join(tmp_root, "gen=0"))
        shutil.rmtree(docs_dir, ignore_errors=True)
        os.replace(tmp_root, docs_dir)
        _mark_stage(index_dir, "docs", cfg_hash,
                    num_shards=num_shards, generations=1,
                    parse_wall_s=round(time.time() - t0, 3),
                    docs_build_id=new_build_id)
        _mark_stage(index_dir, "exchange", cfg_hash)

    man = seg.read_manifest(index_dir)
    num_shards = man["stats"]["num_shards"]
    num_groups = max(1, min(num_shards, 64))
    build_id = man["stats"].get("docs_build_id", cfg_hash)
    docmeta_dir = os.path.join(index_dir, "docmeta")

    def _marker_ok(root: str, s: int) -> bool:
        try:
            with open(os.path.join(root, f"shard={s}", "_SUCCESS")) as f:
                return f.read().strip() == build_id
        except OSError:
            return False

    def _shard_done(s: int) -> bool:
        return _marker_ok(segments_dir, s) and _marker_ok(docmeta_dir, s)

    t1 = time.time()
    if not _stage_done(index_dir, "segments", cfg_hash):
        from .exchange import _PartialExchangeWriter

        # corpus stats: one narrow (int32 dl) columnar scan of the docs
        # checkpoint — parquet column pruning makes this cheap at scale
        stats = rd.read_parquet(docs_dir, columns=["dl"]).aggregate(
            Count(alias_name="n_docs"), Sum("dl", alias_name="total_dl"))
        n_docs = int(stats["n_docs"])
        avgdl = float(stats["total_dl"]) / max(n_docs, 1)

        os.makedirs(segments_dir, exist_ok=True)
        os.makedirs(docmeta_dir, exist_ok=True)
        # drop shard dirs beyond the current shard count (stale layout)
        for root in (segments_dir, docmeta_dir):
            for name in os.listdir(root):
                if name.startswith("shard=") \
                        and int(name.split("=", 1)[1]) >= num_shards:
                    shutil.rmtree(os.path.join(root, name),
                                  ignore_errors=True)

        missing = [s for s in range(num_shards) if not _shard_done(s)]
        if missing:
            # fallback map pass for resumes where the (tmpfs) exchange is
            # gone but the docs checkpoint survived
            if not (_stage_done(index_dir, "exchange", cfg_hash)
                    and os.path.isdir(exchange_dir)):
                shutil.rmtree(exchange_dir, ignore_errors=True)
                os.makedirs(exchange_dir, exist_ok=True)
                docs = rd.read_parquet(
                    docs_dir, columns=["doc_id", "dl", "terms", "shard",
                                       "url", "title", "word_count",
                                       "title_length", "url_length",
                                       "english", "tld"])
                writer = _PartialExchangeWriter(exchange_dir, num_shards,
                                                num_groups, emit_meta=True)
                # plain function → stateless tasks (no actor-pool startup;
                # the writer's "state" is a few config values)
                docs.map_batches(writer.__call__, batch_size=EMIT_BATCH_SIZE,
                                 batch_format="pyarrow").materialize()
                _mark_stage(index_dir, "exchange", cfg_hash,
                            exchange_wall_s=round(time.time() - t1, 3))

            # reduce side: stateful actor-pool merge workers (north-rule
            # component) — one shard-group merged+encoded per call; each
            # worker also assembles its shards' docmeta from the meta
            # partials (replacing the former docmeta Ray sort stage).
            # The pool was spawned before the map pass when possible, so
            # actor spin-up overlaps useful work.
            tmg = time.time()
            groups = sorted({s % num_groups for s in missing})
            if not merge_pool:
                merge_pool[:] = _spawn_merge_pool(num_shards, num_groups,
                                                  build_id)
            futures = [merge_pool[i % len(merge_pool)]
                       .merge_groups.remote([g], avgdl)
                       for i, g in enumerate(groups)]
            ray.get(futures)
            for a in merge_pool:
                ray.kill(a)
            merge_pool.clear()
            # shards with docs but no postings (or no docs) get an empty
            # segment/docmeta so the searcher can always open its shard
            import pyarrow.parquet as _pq
            for s_id in range(num_shards):
                for root, filename, schema in (
                        (segments_dir, "segment.parquet",
                         seg.SEGMENT_SCHEMA.empty_table()
                         .drop_columns(["shard"])),
                        (docmeta_dir, "docmeta.parquet",
                         _EMPTY_DOCMETA)):
                    if _marker_ok(root, s_id):
                        continue
                    dst = os.path.join(root, f"shard={s_id}")
                    tmp = dst + ".tmp"
                    shutil.rmtree(tmp, ignore_errors=True)
                    os.makedirs(tmp)
                    _pq.write_table(schema, os.path.join(tmp, filename))
                    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
                        f.write(build_id)
                    shutil.rmtree(dst, ignore_errors=True)
                    os.replace(tmp, dst)
            _mark_stage(index_dir, "segments", cfg_hash,
                        merge_wall_s=round(time.time() - tmg, 3))
        shutil.rmtree(exchange_dir, ignore_errors=True)
        _mark_stage(index_dir, "docmeta", cfg_hash)
        _mark_stage(index_dir, "segments", cfg_hash, n_docs=n_docs,
                    avgdl=avgdl, num_groups=num_groups,
                    wand_stale_shards=[],
                    # posting doc values are per-shard dense ordinals
                    # (v18 layout); readers/appenders refuse older
                    # fingerprint-valued indexes instead of
                    # misinterpreting them
                    posting_format="ordinal",
                    segments_wall_s=round(time.time() - t1, 3))
    for a in merge_pool:  # pool spawned but segments already done
        ray.kill(a)
    merge_pool.clear()

    t2 = time.time()
    if not _stage_done(index_dir, "terms", cfg_hash):
        # per-shard files are already per-term-unique, so batches are
        # partial (term, df, cf) rows; merge on the driver while the vocab
        # fits (a groupby execution costs more than the data here), else
        # fall back to the distributed groupby
        # per-shard vocab stats are tiny relative to the segments (the
        # binary posting columns are pruned): below ~1 GB of segment files
        # a direct pyarrow read + pandas merge on the driver beats any
        # distributed execution; beyond that, distributed groupby
        seg_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, files in os.walk(segments_dir) for f in files)
        if seg_bytes <= 1 << 30:
            import pandas as pd
            import pyarrow.parquet as _pq
            t = _pq.read_table(segments_dir, columns=["term", "df", "cf"])
            merged = (t.to_pandas()
                      .groupby("term", as_index=False)[["df", "cf"]].sum())
            tmp = terms_path + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            _pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                            os.path.join(tmp, "terms.parquet"))
            shutil.rmtree(terms_path, ignore_errors=True)
            os.replace(tmp, terms_path)
        else:
            segs = rd.read_parquet(segments_dir,
                                   columns=["term", "df", "cf"])
            terms = segs.groupby("term").aggregate(
                Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
            _atomic_write(terms, terms_path)
        man = _mark_stage(index_dir, "terms", cfg_hash,
                          terms_wall_s=round(time.time() - t2, 3),
                          total_wall_s=round(time.time() - t0, 3))
    return seg.read_manifest(index_dir)
