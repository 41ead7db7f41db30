"""Filesystem hash-exchange for the postings build — the MapReduce-style
shuffle that replaces sorting the wide docs table.

Map side (_PartialExchangeWriter, map_batches over the flat docs table):
each batch's postings are emitted vectorized (stages/emit.py), grouped by
shard-group (grp = (doc_id % num_shards) % num_groups), and written one
file per (batch, group) under exchange/grp=G/ — the reduce side reads
exactly its own directory, touching no other group's data.

Reduce side (_GroupMergeWorker, actor pool over group ids): reads a
group's partial runs, sorts them once by (term, shard, doc) — bounded by
the group's share of the corpus, the explicit skew/size bound — and
encodes final per-shard segment tables, written atomically per shard with
build-id markers (idempotent resume at shard granularity; already-valid
shards are skipped so their files/mtimes are untouched).

A (term, doc) run is never split across partials because each doc lives in
exactly one batch, so the merge is pure concatenation + sort, no
re-aggregation.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels import varint
from ..stages.emit import emit_postings_columnar
from ..state import bloom
from ..state import segments as seg


DOCMETA_COLUMNS = ["doc_id", "shard", "dl", "url", "title", "word_count",
                   "title_length", "url_length", "english", "tld"]

# Partial-run file format. "ipc" (default): uncompressed Arrow IPC
# stream — raw buffer writes on the map side, ZERO-COPY memory-mapped
# reads on the merge side (no decompression pass, no parquet
# decode/encode memcpys); the partials are transient intra-build spill,
# so parquet's compression/compat advantages buy nothing here. "parquet"
# keeps the former snappy-parquet partials (smaller bytes on disk —
# useful when the exchange dir is on slow real storage, not tmpfs).
EXCHANGE_FORMAT = os.environ.get("SE_EXCHANGE_FORMAT", "ipc")
_EXT = {"ipc": ".arrow", "parquet": ".parquet"}


def _atomic_write(tab: pa.Table, path: str) -> None:
    """Write-then-rename with a UNIQUE tmp name: concurrent duplicate
    executions of the same task race only on the atomic os.replace (last
    wins, identical content), never on the file bytes."""
    tmp = f"{path}.{os.getpid()}.{id(tab) & 0xffffff:x}.tmp"
    if path.endswith(".arrow"):
        with pa.OSFile(tmp, "wb") as f, \
                pa.ipc.new_stream(f, tab.schema) as w:
            w.write_table(tab)
    else:
        pq.write_table(tab, tmp)
    os.replace(tmp, path)


def _write_byte_bounded(tab: pa.Table, path: str,
                        target_bytes: int = 128 << 10,
                        max_rows: int = 2048) -> None:
    """Write ``tab`` with BYTE-bounded row groups: split wherever the
    cumulative binary payload passes ~target_bytes (a single fat row gets
    its own group), so a lazy per-row read never decompresses more than
    ~target_bytes no matter how skewed the row sizes are."""
    import pyarrow.compute as pc
    w = np.zeros(tab.num_rows, dtype=np.int64)
    for field in tab.schema:
        if pa.types.is_binary(field.type) \
                or pa.types.is_large_binary(field.type) \
                or pa.types.is_string(field.type):
            w += pc.binary_length(tab.column(field.name)).cast(
                pa.int64()).to_numpy(zero_copy_only=False)
    # boundary scan iterates GROUPS (≈ total_bytes/target), not rows:
    # greedy farthest-cut via searchsorted on the cumulative weights
    cum = np.concatenate([[0], np.cumsum(w)])
    n = tab.num_rows
    with pq.ParquetWriter(path, tab.schema,
                          write_statistics=False) as writer:
        if n == 0:
            writer.write_table(tab)
        i = 0
        while i < n:
            j = int(np.searchsorted(cum, cum[i] + target_bytes,
                                    side="right")) - 1
            j = min(max(j, i + 1), i + max_rows, n)
            writer.write_table(tab.slice(i, j - i))
            i = j


def _read_partials(files: list[str]) -> pa.Table | None:
    """Concat partial runs; IPC files read zero-copy via mmap (Arrow
    buffers reference the mapping, which stays alive with them)."""
    if not files:
        return None
    tabs = []
    for f in files:
        if f.endswith(".arrow"):
            tabs.append(pa.ipc.open_stream(pa.memory_map(f)).read_all())
        else:
            tabs.append(pq.read_table(f))
    return pa.concat_tables(tabs, promote_options="default") \
        if len(tabs) > 1 else tabs[0]


class _PartialExchangeWriter:
    """Map side of the exchange. ``emit_meta`` also writes per-group
    docmeta partials (meta_*.parquet) so the reduce side can produce the
    per-shard docmeta WITHOUT a Ray sort over the docs table;
    ``passthrough`` returns the input batch unchanged so the writer can
    sit inside the fused parse→emit→write-docs chain."""

    def __init__(self, exchange_dir: str, num_shards: int, num_groups: int,
                 emit_meta: bool = False, passthrough: bool = False):
        self.exchange_dir = exchange_dir
        self.num_shards = num_shards
        self.num_groups = num_groups
        self.emit_meta = emit_meta
        self.passthrough = passthrough
        os.makedirs(exchange_dir, exist_ok=True)

    def _write_groups(self, tab: pa.Table, grp_sorted: np.ndarray,
                      prefix: str, part_id: str) -> None:
        uniq, starts = np.unique(grp_sorted, return_index=True)
        bounds = np.append(starts, len(grp_sorted))
        ext = _EXT.get(EXCHANGE_FORMAT, ".arrow")
        for gi in range(len(uniq)):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            d = os.path.join(self.exchange_dir, f"grp={int(uniq[gi])}")
            os.makedirs(d, exist_ok=True)
            _atomic_write(tab.slice(lo, hi - lo),
                          os.path.join(d, f"{prefix}_{part_id}{ext}"))

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        dls = t.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        # deterministic part id from the batch's doc set: a retried task
        # re-emits the SAME filenames, so partially-written groups are
        # overwritten (os.replace) instead of duplicated, keeping df/cf
        # exact under Ray task retry
        part_id = hashlib.sha1(doc_ids.tobytes()).hexdigest()[:20]

        if self.emit_meta and len(doc_ids):
            doc_grp = ((doc_ids % self.num_shards)
                       % self.num_groups).astype(np.int32)
            m_order = np.argsort(doc_grp, kind="stable")
            meta = t.select(DOCMETA_COLUMNS).take(
                pa.array(m_order.astype(np.int64)))
            self._write_groups(meta, doc_grp[m_order], "meta", part_id)

        runs = emit_postings_columnar(doc_ids, dls, t.column("terms"))
        n = len(runs["terms"])
        if n == 0:
            return t if self.passthrough else pa.table(
                {"n_runs": pa.array([0], pa.int64())})
        shard = (runs["run_doc"] % self.num_shards).astype(np.int32)
        grp = (shard % self.num_groups).astype(np.int32)
        order = np.argsort(grp, kind="stable")

        # zero-copy binary column over the varint position stream
        offs32 = runs["run_byte_offsets"].astype(np.int32)
        pos_arr = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offs32.tobytes()),
             pa.py_buffer(runs["pos_stream"])])
        # one table, one grp-sort take; per-group outputs are zero-copy
        # slices (object-array slicing per group was the map-side hotspot)
        tab = pa.table({
            "shard": pa.array(shard, pa.int32()),
            "term": pa.array(runs["terms"], pa.string()),
            "doc_id": pa.array(runs["run_doc"], pa.int64()),
            "tf": pa.array(runs["run_tf"].astype(np.int32), pa.int32()),
            "dl": pa.array(runs["run_dl"].astype(np.int32), pa.int32()),
            "pos": pos_arr,
        }).take(pa.array(order.astype(np.int64)))

        self._write_groups(tab, grp[order], "part", part_id)
        return t if self.passthrough else pa.table(
            {"n_runs": pa.array([n], pa.int64())})


class _GroupMergeWorker:
    """Stateful merge worker: merges one shard-group's partial runs into
    final per-shard segments (encode + block-max), atomically. With
    ``docmeta_dir`` set it also assembles each shard's docmeta from the
    map-side meta partials — replacing the former docmeta Ray sort."""

    def __init__(self, exchange_dir: str, segments_dir: str,
                 num_shards: int, avgdl: float | None, build_id: str,
                 docmeta_dir: str | None = None):
        self.exchange_dir = exchange_dir
        self.segments_dir = segments_dir
        self.num_shards = num_shards
        self.avgdl = avgdl  # may arrive later via merge_groups()
        self.build_id = build_id
        self.docmeta_dir = docmeta_dir

    def ready(self) -> bool:
        return True

    def merge_groups(self, groups: list[int], avgdl: float | None = None
                     ) -> int:
        """Explicit actor-pool entry point: lets build_index spawn the
        merge actors EARLY (their process spin-up + imports overlap the
        map pass) and deliver avgdl at call time, once known."""
        if avgdl is not None:
            self.avgdl = avgdl
        out = self(pa.table({"grp": pa.array(groups, pa.int32())}))
        return out.num_rows

    def _marker_ok(self, root: str, s: int) -> bool:
        marker = os.path.join(root, f"shard={s}", "_SUCCESS")
        try:
            with open(marker) as f:
                return f.read().strip() == self.build_id
        except OSError:
            return False

    def _shard_done(self, s: int) -> bool:
        if not self._marker_ok(self.segments_dir, s):
            return False
        return self.docmeta_dir is None \
            or self._marker_ok(self.docmeta_dir, s)

    def _write_shard_dir(self, root: str, s: int, tab: pa.Table,
                         filename: str,
                         extra_files: dict[str, bytes] | None = None,
                         row_group_size: int = 0) -> None:
        dst = os.path.join(root, f"shard={s}")
        tmp = f"{dst}.{os.getpid()}.tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        # small row groups: the serving actor reads only metadata
        # columns at init and pages heavy columns (posting/position
        # bytes, urls/titles) in PER ROW GROUP on first touch — at
        # 100 TB a shard's segment is GBs and actor cold-start must not
        # materialize it all (ShardIndex, pipelines/search.py).
        # Segment rows are wildly size-skewed (a head term's posting
        # bytes dwarf thousands of tail terms), so groups are BYTE-
        # bounded (~512 KB; a single fat row gets its own group) —
        # row_group_size>0 overrides with a fixed row count for
        # uniform-thin-row tables (docmeta). Statistics are off — the
        # readers binary-search the term column themselves and min/max
        # over MB binary cells is pure write-side memcpy.
        path = os.path.join(tmp, filename)
        if row_group_size:
            pq.write_table(tab, path, row_group_size=row_group_size,
                           write_statistics=False)
        else:
            _write_byte_bounded(tab, path)
        for name, payload in (extra_files or {}).items():
            with open(os.path.join(tmp, name), "wb") as f:
                f.write(payload)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write(self.build_id)
        shutil.rmtree(dst, ignore_errors=True)
        os.replace(tmp, dst)

    def _emit_docmeta(self, meta: pa.Table) -> None:
        """Split this group's concatenated meta partials per shard, write
        docmeta/shard=S (skipping shards already done)."""
        if meta.num_rows == 0:
            return
        shards = meta.column("shard").to_numpy(zero_copy_only=False)
        order = np.argsort(shards, kind="stable")
        meta = meta.take(pa.array(order.astype(np.int64)))
        shards_s = shards[order]
        uniq, starts = np.unique(shards_s, return_index=True)
        bounds = np.append(starts, len(shards_s))
        for si in range(len(uniq)):
            s = int(uniq[si])
            if self._marker_ok(self.docmeta_dir, s):
                continue
            lo, hi = int(bounds[si]), int(bounds[si + 1])
            # the shard column lives in the hive dir name, as with
            # write_parquet(partition_cols=["shard"])
            self._write_shard_dir(
                self.docmeta_dir, s,
                meta.slice(lo, hi - lo).drop_columns(["shard"]),
                "docmeta.parquet", row_group_size=4096)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time
        timing = bool(os.environ.get("SE_MERGE_TIMING"))
        out_shard, out_terms = [], []
        for g in batch.column("grp").to_pylist():
            g = int(g)
            gdir = os.path.join(self.exchange_dir, f"grp={g}")
            if not os.path.isdir(gdir):
                continue
            _t0 = _time.time()
            # explicit extension filter: a crash between write and
            # os.replace can leave a truncated *.tmp, which the readers
            # would otherwise try to parse
            names = sorted(os.listdir(gdir))
            exts = (".parquet", ".arrow")
            files = [os.path.join(gdir, f) for f in names
                     if f.endswith(exts) and f.startswith("part_")]
            meta_files = [os.path.join(gdir, f) for f in names
                          if f.endswith(exts) and f.startswith("meta_")]
            meta = _read_partials(meta_files)
            if self.docmeta_dir is not None and meta is not None:
                self._emit_docmeta(meta)
            # per-shard doc universe (sorted unique doc ids, recomputed
            # by LOCAL shard id from doc_id so shifted append metas work):
            # postings store ORDINALS into this universe — the position
            # of the doc in the shard's doc_id-sorted docmeta — so doc
            # gaps varint in 1-2 bytes instead of the ~9 bytes a 63-bit
            # fingerprint delta costs, and the searcher's dense paths
            # index docmeta arrays directly
            uni: dict[int, np.ndarray] = {}
            if meta is not None and meta.num_rows:
                m_ids = meta.column("doc_id").to_numpy(
                    zero_copy_only=False).astype(np.int64)
                m_sh = (m_ids % self.num_shards).astype(np.int64)
                mo = np.argsort(m_sh, kind="stable")
                msh_s, mid_s = m_sh[mo], m_ids[mo]
                u_sh, u_starts = np.unique(msh_s, return_index=True)
                u_bounds = np.append(u_starts, len(msh_s))
                for si in range(len(u_sh)):
                    uni[int(u_sh[si])] = np.unique(
                        mid_s[u_bounds[si]:u_bounds[si + 1]])
            _t1 = _time.time()
            if not files:
                continue
            part = _read_partials(files)
            _t2 = _time.time()
            if part.num_rows == 0:
                continue
            terms_arr = part.column("term")
            codes_a = terms_arr.combine_chunks().dictionary_encode()
            codes = codes_a.indices.to_numpy(zero_copy_only=False).astype(
                np.int64)
            vocab = np.asarray(codes_a.dictionary.to_pylist(), dtype=object)
            docs = part.column("doc_id").to_numpy(zero_copy_only=False)
            tfs = part.column("tf").to_numpy(zero_copy_only=False).astype(
                np.int64)
            dls = part.column("dl").to_numpy(zero_copy_only=False).astype(
                np.int64)
            shards = part.column("shard").to_numpy(zero_copy_only=False)

            _t3 = _time.time()
            order = np.lexsort((docs, codes, shards))
            # reorder the pos binary column ONCE; per-run blobs are then
            # contiguous (offset, data) buffer slices — no python bytes
            # large_binary (int64 offsets) so a merge group whose
            # concatenated position data exceeds 2 GiB doesn't raise
            # ArrowCapacityError on combine_chunks
            pos_sorted = part.column("pos").cast(
                pa.large_binary()).combine_chunks().take(
                pa.array(order.astype(np.int64)))
            assert pos_sorted.offset == 0
            pos_offs = np.frombuffer(pos_sorted.buffers()[1],
                                     dtype=np.int64)[:len(order) + 1]
            _pd_buf = pos_sorted.buffers()[2]
            pos_data = (np.frombuffer(_pd_buf, dtype=np.uint8)
                        if _pd_buf is not None
                        else np.empty(0, dtype=np.uint8))
            codes = codes[order]
            docs_s = docs[order]
            tfs_s = tfs[order]
            dls_s = dls[order]
            shards_s = shards[order]
            impacts = seg.bm25_impact(tfs_s, dls_s,
                                      self.avgdl).astype(np.float32)

            # map doc ids → per-shard dense ordinals (monotone within a
            # shard, so the (shard, term, doc) sort order is preserved)
            ords = np.empty(len(docs_s), dtype=np.int64)
            sh_u, sh_starts = np.unique(shards_s, return_index=True)
            sh_bounds = np.append(sh_starts, len(shards_s))
            for si in range(len(sh_u)):
                slo, shi = int(sh_bounds[si]), int(sh_bounds[si + 1])
                u = uni.get(int(sh_u[si]))
                if u is None:
                    raise RuntimeError(
                        f"exchange meta partials missing for shard "
                        f"{int(sh_u[si])} in grp={g}")
                o_slice = np.searchsorted(u, docs_s[slo:shi])
                if not np.array_equal(u[o_slice], docs_s[slo:shi]):
                    raise RuntimeError(
                        f"posting doc id outside the shard universe "
                        f"(shard {int(sh_u[si])}, grp={g})")
                ords[slo:shi] = o_slice
            docs_s = ords

            # (shard, term) run boundaries
            change = np.empty(len(codes), dtype=bool)
            change[0] = True
            change[1:] = ((shards_s[1:] != shards_s[:-1])
                          | (codes[1:] != codes[:-1]))
            rstarts = np.nonzero(change)[0]
            rbounds = np.append(rstarts, len(codes))

            _t4 = _time.time()
            # vectorized per-group encoding: ONE varint stream per column
            # with per-row byte offsets, so each posting list is a bytes
            # slice instead of a per-run encode call (the per-run python
            # loop was ~0.5 s/group at 350k rows)
            from ..stages.emit import _varint_stream_with_offsets

            n_rows = len(codes)
            run_len = np.diff(rbounds)
            ds64 = docs_s.astype(np.uint64)
            deltas = np.empty(n_rows, np.uint64)
            deltas[0] = ds64[0]
            np.subtract(ds64[1:], ds64[:-1], out=deltas[1:])
            deltas[rstarts] = ds64[rstarts]  # absolute at run starts
            doc_stream, doc_offs = _varint_stream_with_offsets(deltas)
            tf_stream, tf_offs = _varint_stream_with_offsets(
                tfs_s.astype(np.uint64))
            run_cf = np.add.reduceat(tfs_s, rstarts)
            run_max = np.maximum.reduceat(impacts, rstarts)
            # single-block runs' block_last_doc is the varint of the last
            # absolute doc id (== encode_gaps of a 1-element array)
            last_ids = ds64[rbounds[1:] - 1]
            last_stream, last_offs = _varint_stream_with_offsets(last_ids)
            run_max_f32 = run_max.astype(np.float32)

            # shard boundaries over the runs
            per_shard: dict[int, dict[str, list]] = {}
            for ri in range(len(rstarts)):
                lo, hi = int(rbounds[ri]), int(rbounds[ri + 1])
                sh = int(shards_s[lo])
                if self._shard_done(sh):
                    continue
                n = hi - lo
                r = per_shard.setdefault(sh, {
                    "term": [], "df": [], "cf": [], "doc_gaps": [],
                    "tfs": [], "pos_gaps": [], "block_last_doc": [],
                    "block_max_impact": [], "block_offs": []})
                r["term"].append(vocab[codes[lo]])
                r["df"].append(n)
                r["cf"].append(int(run_cf[ri]))
                r["doc_gaps"].append(doc_stream[doc_offs[lo]:doc_offs[hi]])
                r["tfs"].append(tf_stream[tf_offs[lo]:tf_offs[hi]])
                r["pos_gaps"].append(
                    pos_data[pos_offs[lo]:pos_offs[hi]].tobytes())
                # per-block byte offsets into the three run streams (the
                # block-lazy seek table, state/segments.py LazyPostings)
                bstarts = lo + np.arange(0, n, seg.BLOCK_SIZE,
                                         dtype=np.int64)
                r["block_offs"].append(np.stack([
                    doc_offs[bstarts] - doc_offs[lo],
                    tf_offs[bstarts] - tf_offs[lo],
                    pos_offs[bstarts] - pos_offs[lo]],
                    axis=1).astype(np.int64).tobytes())
                if n <= seg.BLOCK_SIZE:
                    r["block_last_doc"].append(
                        last_stream[last_offs[ri]:last_offs[ri + 1]])
                    r["block_max_impact"].append(run_max_f32[ri].tobytes())
                else:
                    ids = docs_s[lo:hi]
                    imp = impacts[lo:hi]
                    nblocks = (n + seg.BLOCK_SIZE - 1) // seg.BLOCK_SIZE
                    ends = np.minimum(
                        np.arange(1, nblocks + 1) * seg.BLOCK_SIZE, n)
                    r["block_last_doc"].append(
                        varint.encode_gaps(ids[ends - 1].astype(np.uint64)))
                    r["block_max_impact"].append(np.maximum.reduceat(
                        imp, np.arange(0, n, seg.BLOCK_SIZE)
                    ).astype(np.float32).tobytes())

            for sh, r in per_shard.items():
                # rows arrive sorted by term code; re-sort by term string
                # for deterministic, binary-searchable segment files
                t_order = np.argsort(np.asarray(r["term"], dtype=object))
                tab = pa.table({
                    "term": pa.array(
                        [r["term"][i] for i in t_order], pa.string()),
                    "df": pa.array(
                        [r["df"][i] for i in t_order], pa.int64()),
                    "cf": pa.array(
                        [r["cf"][i] for i in t_order], pa.int64()),
                    "doc_gaps": pa.array(
                        [r["doc_gaps"][i] for i in t_order], pa.binary()),
                    "tfs": pa.array(
                        [r["tfs"][i] for i in t_order], pa.binary()),
                    "pos_gaps": pa.array(
                        [r["pos_gaps"][i] for i in t_order], pa.binary()),
                    "block_last_doc": pa.array(
                        [r["block_last_doc"][i] for i in t_order],
                        pa.binary()),
                    "block_max_impact": pa.array(
                        [r["block_max_impact"][i] for i in t_order],
                        pa.binary()),
                    "block_offs": pa.array(
                        [r["block_offs"][i] for i in t_order],
                        pa.binary()),
                })
                # vocab bloom alongside the segment (atomic with it):
                # the engine prunes query fan-out with it — an actor
                # whose shards can't contain any plan term is never
                # RPC'd (state/bloom.py)
                self._write_shard_dir(
                    self.segments_dir, sh, tab, "segment.parquet",
                    extra_files={"_vocab.bloom": bloom.build(
                        tab.column("term"))})
                out_shard.append(sh)
                out_terms.append(tab.num_rows)
            if timing:
                _t6 = _time.time()
                print(f"[merge-timing] grp={g} files={len(files)} "
                      f"rows={part.num_rows} "
                      f"meta={_t1 - _t0:.2f} read={_t2 - _t1:.2f} "
                      f"decode={_t3 - _t2:.2f} sort={_t4 - _t3:.2f} "
                      f"runs+write={_t6 - _t4:.2f}",
                      flush=True)
        return pa.table({
            "shard": pa.array(out_shard, pa.int32()),
            "n_terms": pa.array(out_terms, pa.int64()),
        })
