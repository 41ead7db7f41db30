"""Query serving: an actor pool over memory-mapped index segments.

Mirrors the reference csolver topology (SURVEY.md §3.2/§3.3) Ray-natively:
each SegmentSearcher actor owns a set of document shards, loads their
segment + docmeta parquet once in __init__ (T3), evaluates the boolean plan
against its shards, scores candidates with BM25 and returns a per-actor
top-k; the driver merges descending (R6 semantics: csolver.cpp:94-121).

Scoring is BM25 (k1=1.2, b=0.75 — documented choice; the reference defines
no BM25 constants, SURVEY.md preamble) with Lucene-style idf
ln(1 + (N - df + 0.5)/(df + 0.5)). Global df/N/avgdl come from the build
manifest + terms table; idf is computed on the driver and shipped with the
query, so actors never need the global vocabulary.

Boolean semantics (engine mode):
- AND/OR/SynOr → sorted-array intersection/union (J6, I3-I5)
- PHRASE → doc intersection + consecutive-position verification (I7) over
  within-doc positions (reference location semantics minus the global base)
- NOT: the reference csolver cannot serve NOT (live assert on a null
  excluded stream — see query/compile.py); this engine implements the
  documented intent: AND(a, NOT(b)) = a ∖ b; a bare/OR-side NOT
  contributes the empty set (J7).

Synonym terms (SynOr right subtrees) score with weight SYN_WEIGHT=0.4,
mirroring the reference ranker's synonym blend factor (Ranker.hpp:110).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..query import compile as qc
from ..state import bloom as sb
from ..state import segments as seg

SYN_WEIGHT = 0.4  # Ranker.hpp:110


# ---------------------------------------------------------------------------
# plan flattening (collectTerms analogue, Indexer.hpp:621-628, isr.cpp)
# ---------------------------------------------------------------------------

def flatten_terms(node, synonym=False, out=None, seen=None):
    """(term, is_synonym) in left-to-right traversal order, deduped by term
    string — first occurrence wins (ISR_Tree::getFlattenedTerms)."""
    if out is None:
        out, seen = [], set()
    if node is None:
        return out
    if isinstance(node, qc.Word):
        if node.stem_ not in seen:
            seen.add(node.stem_)
            out.append((node.stem_, synonym))
    elif isinstance(node, qc.Phrase):
        for s in node.stems:
            if s and s not in seen:
                seen.add(s)
                out.append((s, synonym))
    elif isinstance(node, qc.SynOr):
        flatten_terms(node.left, synonym, out, seen)
        flatten_terms(node.rest, True, out, seen)
    elif isinstance(node, (qc.And, qc.Or)):
        flatten_terms(node.left, synonym, out, seen)
        flatten_terms(node.right, synonym, out, seen)
    elif isinstance(node, qc.Not):
        flatten_terms(node.child, synonym, out, seen)  # included side only
    return out


def scoring_terms(node):
    """Terms that contribute BM25 score: flattened terms excluding NOT
    subtrees (the negated side must not add relevance)."""
    out, seen = [], set()

    def walk(n, synonym):
        if n is None:
            return
        if isinstance(n, qc.Word):
            if n.stem_ and n.stem_ not in seen:
                seen.add(n.stem_)
                out.append((n.stem_, synonym))
        elif isinstance(n, qc.Phrase):
            for s in n.stems:
                if s and s not in seen:
                    seen.add(s)
                    out.append((s, synonym))
        elif isinstance(n, qc.SynOr):
            walk(n.left, synonym)
            walk(n.rest, True)
        elif isinstance(n, (qc.And, qc.Or)):
            walk(n.left, synonym)
            walk(n.right, synonym)
        elif isinstance(n, qc.Not):
            pass
    walk(node, False)
    return out


def pure_disjunction_terms(node, idf: dict[str, float],
                           synonym: bool = False):
    """If the plan is a pure disjunction of words (Or/SynOr over Word
    leaves only), return [(term, idf*weight)] for the WAND path; else
    None. Duplicate terms keep their first weight (flatten semantics)."""
    out: list[tuple[str, float]] = []
    seen: set[str] = set()

    def walk(n, syn) -> bool:
        if n is None:
            return True
        if isinstance(n, qc.Word):
            if n.stem_ and n.stem_ not in seen:
                seen.add(n.stem_)
                w = idf.get(n.stem_, 0.0) * (SYN_WEIGHT if syn else 1.0)
                out.append((n.stem_, w))
            return True
        if isinstance(n, qc.Or):
            return walk(n.left, syn) and walk(n.right, syn)
        if isinstance(n, qc.SynOr):
            return walk(n.left, syn) and walk(n.rest, True)
        return False

    return out if walk(node, synonym) else None


def conjunctive_word_terms(node):
    """If the plan is a pure conjunction of words (And tree over Word
    leaves only), return the deduped stems in left-to-right order (the
    same order scoring_terms yields, so float accumulation matches the
    generic path bit-for-bit); else None."""
    out: list[str] = []
    seen: set[str] = set()

    def walk(n) -> bool:
        if isinstance(n, qc.And):
            return walk(n.left) and walk(n.right)
        if isinstance(n, qc.Word):
            if not n.stem_:
                return False
            if n.stem_ not in seen:
                seen.add(n.stem_)
                out.append(n.stem_)
            return True
        return False

    return out if (node is not None and walk(node)) else None


# ---------------------------------------------------------------------------
# per-shard evaluation
# ---------------------------------------------------------------------------

_EMPTY = np.empty(0, dtype=np.int64)


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted-unique arrays by probing the larger
    with the smaller — O(min log max), no concatenate-and-sort."""
    if len(a) > len(b):
        a, b = b, a
    if not len(a) or not len(b):
        return a[:0]
    ix = np.searchsorted(b, a)
    ix[ix == len(b)] = 0
    return a[b[ix] == a]


def _topk_tie_aware(docs: np.ndarray, scores: np.ndarray, k: int
                    ) -> np.ndarray:
    """Indices of the lexicographic (-score, doc_id) top-k in O(n):
    argpartition picks strict winners, boundary ties fill with the
    smallest doc_ids, final order by (-score, doc_id)."""
    n = len(docs)
    if n > k:
        kth = -np.partition(-scores, k - 1)[k - 1]
        win = np.nonzero(scores > kth)[0]
        tie = np.nonzero(scores == kth)[0]
        need = k - len(win)
        if need > 0 and len(tie) > need:
            tie = tie[np.argpartition(docs[tie], need - 1)[:need]]
        top = np.concatenate([win, tie[:max(need, 0)]])
    else:
        top = np.arange(n)
    return top[np.lexsort((docs[top], -scores[top]))][:k]


class ShardIndex:
    """One document shard: lazy-decoded posting lists + doc attributes.

    Parquet files are opened memory-mapped; term rows decode on first use
    and are cached (mirrors the csolver mmap+read-on-demand, main.cpp:59-108).

    Doc values inside posting lists are per-shard dense ORDINALS — the
    doc's position in the shard's doc_id-sorted docmeta (assigned at
    merge time, pipelines/exchange.py). Ordinals are monotone in doc_id,
    so all sorted-set algebra, tie-breaking and block metadata work
    unchanged; dense scoring indexes the docmeta arrays directly, and
    results map back to real doc ids only at output time.
    """

    def __init__(self, index_dir: str, shard: int, wand_ok: bool = True):
        # wand_ok=False when this shard's block-max bounds were computed
        # with a stale avgdl (after append_to_index, before
        # refresh_block_max) — exact exhaustive scoring is used instead
        self.wand_ok = wand_ok
        seg_path = os.path.join(index_dir, "segments", f"shard={shard}")
        doc_path = os.path.join(index_dir, "docmeta", f"shard={shard}")
        # COLD-START IS METADATA-ONLY: posting/position byte columns are
        # ~96% of a segment's size but only touched terms ever need
        # them, so init reads just the light columns (term, df, cf,
        # block metadata — measured 90× cheaper) and heavy cells page in
        # PER ROW GROUP on first touch (segments are written with
        # 512-row groups, pipelines/exchange.py). At 100 TB an actor
        # hosting GB-scale shards boots in metadata time and its
        # resident set tracks the queried vocabulary, not the corpus.
        self._rg_cache: dict[tuple[int, int, str], pa.ChunkedArray] = {}
        self._seg_pf, self._rg_starts, self._seg_full = \
            self._open_lazy(seg_path)
        if self._seg_pf is not None:
            schema_names = self._seg_pf.schema_arrow.names
            self._has_block_offs = "block_offs" in schema_names
            light = ["term", "df", "cf", "block_last_doc",
                     "block_max_impact"]
            if self._has_block_offs:
                light.append("block_offs")
            t = self._seg_pf.read(columns=light)
        else:  # multi-file shard dir (e.g. append-written): eager read
            t = self._seg_full
            self._has_block_offs = "block_offs" in t.column_names
        # segment rows are written term-sorted: lookups binary-search the
        # Arrow column directly (O(log n) probes, cached) instead of
        # materializing a python dict of every term at actor startup.
        # The string column's (offsets, data) buffers are kept as numpy
        # views so each probe compares raw bytes — no per-probe .as_py()
        # string materialization.
        self._terms = t.column("term").combine_chunks()
        _b = self._terms.buffers()
        _off = self._terms.offset
        self._term_offs = np.frombuffer(_b[1], dtype=np.int32)[
            _off:_off + len(self._terms) + 1]
        self._term_data = (np.frombuffer(_b[2], dtype=np.uint8)
                           if _b[2] is not None
                           else np.empty(0, dtype=np.uint8))
        self._table = t
        self._cache: dict[str, seg.TermPostings] = {}
        self._lazy: dict[str, seg.LazyPostings] = {}
        self._phrase_cache: dict[tuple, np.ndarray] = {}
        # docmeta: scoring needs doc_id+dl for every doc; url/title only
        # for the ≤k result rows per query — paged in per row group too
        self._doc_pf, self._doc_rg_starts, self._doc_full = \
            self._open_lazy(doc_path)
        d = (self._doc_pf.read(columns=["doc_id", "dl"])
             if self._doc_pf is not None else self._doc_full)
        order = np.argsort(d.column("doc_id").to_numpy())
        self.doc_ids = d.column("doc_id").to_numpy()[order]
        self.dls = d.column("dl").to_numpy(zero_copy_only=False)[order]
        self._doc_order = order  # ordinal → on-disk row

    @staticmethod
    def _open_lazy(dirpath: str):
        """(ParquetFile, row-group starts, None) for a single-file shard
        dir — the merge writer's layout — or (None, None, full table)
        for multi-file dirs (e.g. Ray-written append docmeta), where
        eager reading is the compatible path."""
        files = [f for f in sorted(os.listdir(dirpath))
                 if f.endswith(".parquet")]
        if len(files) == 1:
            pf = pq.ParquetFile(os.path.join(dirpath, files[0]),
                                memory_map=True)
            starts = np.cumsum(
                [0] + [pf.metadata.row_group(g).num_rows
                       for g in range(pf.metadata.num_row_groups)])[:-1]
            return pf, starts, None
        return None, None, pq.read_table(dirpath, memory_map=True)

    def _cell(self, pf, rg_starts, full, i: int, col: str):
        """One cell of a heavy column, paging in its 512-row group on
        first touch (bounded LRU); falls back to the eager table."""
        if pf is None:
            return full.column(col)[i].as_py()
        g = int(np.searchsorted(rg_starts, i, side="right") - 1)
        key = (id(pf), g, col)
        arr = self._rg_cache.pop(key, None)
        if arr is None:
            # use_threads=False: the default thread-pool dispatch costs
            # ~12 ms per small read vs ~0.9 ms single-threaded
            arr = pf.read_row_group(g, columns=[col],
                                    use_threads=False).column(col)
            if len(self._rg_cache) >= 256:
                self._rg_cache.pop(next(iter(self._rg_cache)))
        # pop + reinsert = move-to-end: eviction order is true LRU, not
        # FIFO insertion order (a hot metadata group must never be
        # evicted while cold ones sit in the map)
        self._rg_cache[key] = arr
        return arr[i - int(rg_starts[g])].as_py()

    def _seg_cell(self, i: int, col: str):
        return self._cell(self._seg_pf, self._rg_starts, self._seg_full,
                          i, col)

    def vocab(self) -> list[str]:
        """All terms in this shard (testing/diagnostics)."""
        return self._terms.to_pylist()

    def _find_row(self, term: str) -> int | None:
        key = term.encode()
        offs, data = self._term_offs, self._term_data
        lo, hi = 0, len(self._terms)
        while lo < hi:
            mid = (lo + hi) // 2
            if data[offs[mid]:offs[mid + 1]].tobytes() < key:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(self._terms) \
                and data[offs[lo]:offs[lo + 1]].tobytes() == key:
            return lo
        return None

    _MISS = object()

    def lookup(self, term: str) -> seg.TermPostings | None:
        tp = self._cache.get(term, ShardIndex._MISS)
        if tp is not ShardIndex._MISS:
            return tp
        i = self._find_row(term)
        if i is None:
            self._cache[term] = None  # negative cache
            return None
        row = {name: self._table.column(name)[i].as_py()
               for name in ("df", "cf", "block_last_doc",
                            "block_max_impact")}
        for name in ("doc_gaps", "tfs", "pos_gaps"):
            row[name] = self._seg_cell(i, name)
        tp = seg.TermPostings(row)
        self._cache[term] = tp
        return tp

    def lookup_lazy(self, term: str, positions: bool = False
                    ) -> "seg.LazyPostings | None":
        """Block-lazy postings view (no full decode): only the O(df/128)
        block metadata materializes; doc/tf (and, with ``positions``,
        position) blocks decode on first probe through the block_offs
        seek table. The pos byte stream — the largest column — is only
        materialized when ``positions`` is requested (phrase plans)."""
        lz = self._lazy.get(term)
        if lz is not None and not (positions and not len(lz._pos_bytes)
                                   and lz.cf):
            return lz
        i = self._find_row(term)
        if i is None:
            return None
        row = {name: self._table.column(name)[i].as_py()
               for name in ("df", "cf", "block_last_doc",
                            "block_max_impact", "block_offs")}
        heavy = ["doc_gaps", "tfs"] + (["pos_gaps"] if positions else [])
        for name in heavy:
            row[name] = self._seg_cell(i, name)
        lz = seg.LazyPostings(row)
        if len(self._lazy) >= 1024:
            self._lazy.pop(next(iter(self._lazy)))
        self._lazy[term] = lz
        return lz

    def doc_meta(self, ordinal: int) -> tuple[str, str]:
        """(url, title) of a doc by its shard ordinal — paged in per
        row group (only the ≤k result rows per query ever need them);
        both columns fetch in ONE group read."""
        i = int(self._doc_order[ordinal])
        if self._doc_pf is None:
            return (self._doc_full.column("url")[i].as_py(),
                    self._doc_full.column("title")[i].as_py())
        g = int(np.searchsorted(self._doc_rg_starts, i,
                                side="right") - 1)
        key = (id(self._doc_pf), g, "url+title")
        tab = self._rg_cache.get(key)
        if tab is None:
            tab = self._doc_pf.read_row_group(
                g, columns=["url", "title"], use_threads=False)
            if len(self._rg_cache) >= 256:
                self._rg_cache.pop(next(iter(self._rg_cache)))
            self._rg_cache[key] = tab
        loc = i - int(self._doc_rg_starts[g])
        return (tab.column("url")[loc].as_py(),
                tab.column("title")[loc].as_py())

    def doc_id_of(self, ordinals: np.ndarray) -> np.ndarray:
        """Map shard ordinals to real doc ids (output boundary only)."""
        return self.doc_ids[ordinals]

    def doc_dl(self, cand: np.ndarray) -> np.ndarray:
        """dl per doc ordinal — direct index into the docmeta order."""
        return self.dls[cand]

    # -- boolean algebra ----------------------------------------------------
    def eval(self, node) -> np.ndarray:
        if node is None:
            return _EMPTY
        if isinstance(node, qc.Word):
            tp = self.lookup(node.stem_)
            return tp.doc_ids if tp is not None else _EMPTY
        if isinstance(node, qc.Phrase):
            return self._eval_phrase([s for s in node.stems if s])
        if isinstance(node, qc.And):
            l, r = node.left, node.right
            if isinstance(r, qc.Not):
                return np.setdiff1d(self.eval(l), self.eval(r.child),
                                    assume_unique=True)
            if isinstance(l, qc.Not):
                return np.setdiff1d(self.eval(r), self.eval(l.child),
                                    assume_unique=True)
            return np.intersect1d(self.eval(l), self.eval(r),
                                  assume_unique=True)
        if isinstance(node, (qc.Or, qc.SynOr)):
            # word-only disjunction subtrees union in one shot (62-term
            # synonym chains would otherwise do 62 pairwise union1d passes)
            leaves: list[str] = []
            if self._collect_or_words(node, leaves):
                arrs = [tp.doc_ids for tp in
                        (self.lookup(t) for t in leaves) if tp is not None]
                if not arrs:
                    return _EMPTY
                return np.unique(np.concatenate(arrs))
            if isinstance(node, qc.Or):
                return np.union1d(self.eval(node.left),
                                  self.eval(node.right))
            return np.union1d(self.eval(node.left), self.eval(node.rest))
        if isinstance(node, qc.Not):
            return _EMPTY
        raise TypeError(type(node))

    def _eval_mask(self, node) -> np.ndarray:
        """Dense-bitmap twin of eval(): same result set as a bool mask
        over the shard's dense doc order. Set algebra becomes bitwise
        AND/OR/ANDNOT over n_docs bools — no sorts, no merges — with
        leaf membership filled from the cached dense posting positions.
        Used by score_topk when the plan's leaf postings are a sizable
        fraction of the shard (the sorted-array algebra wins for highly
        selective plans on big shards)."""
        n = len(self.doc_ids)
        if node is None:
            return np.zeros(n, dtype=bool)
        if isinstance(node, qc.Word):
            m = np.zeros(n, dtype=bool)
            tp = self.lookup(node.stem_)
            if tp is not None:
                m[tp.doc_ids] = True  # postings ARE dense positions
            return m
        if isinstance(node, qc.Phrase):
            docs = self._eval_phrase([s for s in node.stems if s])
            m = np.zeros(n, dtype=bool)
            if len(docs):
                m[docs] = True
            return m
        if isinstance(node, qc.And):
            l, r = node.left, node.right
            if isinstance(r, qc.Not):
                m = self._eval_mask(l)
                m &= ~self._eval_mask(r.child)
                return m
            if isinstance(l, qc.Not):
                m = self._eval_mask(r)
                m &= ~self._eval_mask(l.child)
                return m
            m = self._eval_mask(l)
            m &= self._eval_mask(r)
            return m
        if isinstance(node, (qc.Or, qc.SynOr)):
            leaves: list[str] = []
            if self._collect_or_words(node, leaves):
                m = np.zeros(n, dtype=bool)
                for t in leaves:
                    tp = self.lookup(t)
                    if tp is not None:
                        m[tp.doc_ids] = True
                return m
            rest = node.right if isinstance(node, qc.Or) else node.rest
            m = self._eval_mask(node.left)
            m |= self._eval_mask(rest)
            return m
        if isinstance(node, qc.Not):
            return np.zeros(n, dtype=bool)
        raise TypeError(type(node))

    @staticmethod
    def _collect_or_words(node, out: list[str]) -> bool:
        if node is None:
            return True
        if isinstance(node, qc.Word):
            out.append(node.stem_)
            return True
        if isinstance(node, qc.Or):
            return (ShardIndex._collect_or_words(node.left, out)
                    and ShardIndex._collect_or_words(node.right, out))
        if isinstance(node, qc.SynOr):
            return (ShardIndex._collect_or_words(node.left, out)
                    and ShardIndex._collect_or_words(node.rest, out))
        return False

    def _eval_phrase(self, terms: list[str]) -> np.ndarray:
        if not terms:
            return _EMPTY
        key = tuple(terms)
        hit = self._phrase_cache.get(key)
        if hit is not None:
            return hit
        out = self._eval_phrase_uncached(terms)
        if len(self._phrase_cache) >= 512:  # bounded (index immutable)
            self._phrase_cache.pop(next(iter(self._phrase_cache)))
        self._phrase_cache[key] = out
        return out

    def _eval_phrase_uncached(self, terms: list[str]) -> np.ndarray:
        # skewed phrases (one rare word + frequent companions — the
        # common shape: "the WALRUS said") go block-lazy: the frequent
        # terms decode only the candidate blocks, docs AND positions
        # (the reference's skip table serves phrase ISR seeks the same
        # way, Posts.hpp:448-473). Same engage gates as _conjunctive_topk.
        if self._has_block_offs and len(terms) >= 2:
            rows = [self._find_row(t) for t in terms]
            if any(i is None for i in rows):
                return _EMPTY
            dfs = [int(self._table.column("df")[i].as_py())
                   for i in rows]
            if max(dfs) >= self.CONJ_SKEW * max(min(dfs), 1) \
                    and max(dfs) >= self.CONJ_MIN_DF \
                    and min(dfs) * self.CONJ_BLOCK_COST <= max(dfs):
                return self._eval_phrase_lazy(terms, dfs)
        tps = []
        for t in terms:
            tp = self.lookup(t)
            if tp is None:
                return _EMPTY
            tps.append(tp)
        cand = tps[0].doc_ids
        for tp in tps[1:]:
            cand = _intersect_sorted(cand, tp.doc_ids)
            if not len(cand):
                return _EMPTY
        # vectorized adjacency check across ALL candidates at once: pack
        # (candidate ordinal, shifted position) into one sorted uint64
        # key per term occurrence and intersect the key sets — no
        # per-candidate Python loop (a frequent pair used to cost ~10 µs
        # × candidates × terms here)
        idxs = [np.searchsorted(tp.doc_ids, cand) for tp in tps]

        def flat_keys(tp, idx: np.ndarray, shift: int,
                      ords_out: np.ndarray | None = None) -> np.ndarray:
            starts = tp.pos_offsets[idx]
            ln = tp.pos_offsets[idx + 1] - starts
            total = int(ln.sum())
            if total == 0:
                return np.empty(0, dtype=np.int64)
            base = np.repeat(starts, ln)
            offs = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(ln) - ln, ln)
            pos = tp.positions[base + offs] - shift
            src = (np.arange(len(idx), dtype=np.int64)
                   if ords_out is None else ords_out)
            ords = np.repeat(src, ln)
            keep = pos >= 0
            return (ords[keep] << np.int64(32)) | pos[keep]

        keys = flat_keys(tps[0], idxs[0], 0)
        for i in range(1, len(tps)):
            if not len(keys):
                return _EMPTY
            # only ordinals still alive in `keys` can survive the next
            # intersection — build the next term's keys for those docs
            # only (ordinal values preserved, so the merge stays valid)
            ords = keys >> np.int64(32)
            alive = ords[np.concatenate(([True],
                                         ords[1:] != ords[:-1]))]
            nxt = flat_keys(tps[i], idxs[i][alive], i, ords_out=alive)
            # flat_keys output is sorted (ordinals ascend, positions
            # ascend within each ordinal): merge-probe, never re-sort
            keys = _intersect_sorted(keys, nxt)
        if not len(keys):
            return _EMPTY
        ords = keys >> np.int64(32)  # nondecreasing
        first = np.concatenate(([True], ords[1:] != ords[:-1]))
        return cand[ords[first]]

    def _eval_phrase_lazy(self, terms: list[str],
                          dfs: list[int]) -> np.ndarray:
        """Phrase docs without fully decoding the frequent terms: the
        rarest term seeds the candidate set (eager decode — its
        positions are needed anyway); every other term intersects and
        position-verifies block-lazily via gather/gather_positions.
        Bit-identical to the eager path (same candidate set, same
        (ordinal, shifted-position) key intersection; pinned by
        tests/test_conjunctive.py)."""
        seed_j = int(np.argmin(dfs))
        tp0 = self.lookup(terms[seed_j])
        if tp0 is None or not len(tp0.doc_ids):
            return _EMPTY
        cand = tp0.doc_ids
        lzs: dict[int, "seg.LazyPostings"] = {}
        for j in sorted(range(len(terms)), key=lambda j: dfs[j]):
            if j == seed_j:
                continue
            lz = self.lookup_lazy(terms[j], positions=True)
            if lz is None:
                return _EMPTY
            lzs[j] = lz
            hit, _ = lz.gather(cand)
            cand = cand[hit]
            if not len(cand):
                return _EMPTY
        # adjacency: intersect (candidate ordinal, position - i) key
        # sets in term order — exactly the eager flat_keys semantics
        keys: np.ndarray | None = None
        for i, t in enumerate(terms):
            if i == seed_j:
                idx = np.searchsorted(tp0.doc_ids, cand)
                starts = tp0.pos_offsets[idx]
                ln = tp0.pos_offsets[idx + 1] - starts
                total = int(ln.sum())
                base = np.repeat(starts, ln)
                within = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(ln) - ln, ln)
                pos = tp0.positions[base + within]
                ords = np.repeat(np.arange(len(cand), dtype=np.int64),
                                 ln)
            else:
                hit, pos, counts = lzs[i].gather_positions(cand)
                # cand was intersected through every term already
                ords = np.repeat(np.arange(len(cand), dtype=np.int64),
                                 counts)
            p = pos - i
            keep = p >= 0
            k_i = (ords[keep] << np.int64(32)) | p[keep]
            keys = k_i if keys is None else _intersect_sorted(keys, k_i)
            if not len(keys):
                return _EMPTY
        ords = keys >> np.int64(32)
        first = np.concatenate(([True], ords[1:] != ords[:-1]))
        return cand[ords[first]]

    def exhaustive_topk(self, weighted_terms: list[tuple[str, float]],
                        k: int, avgdl: float) -> list[tuple[float, int]]:
        """Vectorized exhaustive union-scorer for a weighted term list —
        the no-skip baseline wand_topk is measured against (bench) and
        must match exactly (tests). Returns (score, doc ORDINAL), like
        wand_topk."""
        tws = [(tp, w) for tp, w in
               ((self.lookup(t), w) for t, w in weighted_terms)
               if tp is not None and w > 0 and len(tp.doc_ids)]
        if not tws:
            return []
        cand = np.unique(np.concatenate([tp.doc_ids for tp, _ in tws]))
        dls = self.doc_dl(cand)
        scores = np.zeros(len(cand), dtype=np.float64)
        for tp, w in tws:
            pos = np.searchsorted(tp.doc_ids, cand)
            np.clip(pos, 0, len(tp.doc_ids) - 1, out=pos)
            hit = tp.doc_ids[pos] == cand
            scores[hit] += w * seg.bm25_impact(tp.tfs[pos[hit]],
                                               dls[hit], avgdl)
        order = _topk_tie_aware(cand, scores, k)
        return [(float(scores[i]), int(cand[i])) for i in order]

    # -- vectorized block-max WAND (pure-disjunction top-k, scale path) -----
    _WAND_BATCH = 32  # intervals scored per vector pass

    def wand_topk(self, weighted_terms: list[tuple[str, float]], k: int,
                  avgdl: float) -> list[tuple[float, int]]:
        """Vectorized block-max WAND (skip idea of Broder'03 / Ding &
        Suel'11; the reference's analogue is the posting skip table,
        Posts.hpp:353-369), reformulated block-at-a-time so every step is
        a numpy kernel instead of a per-doc cursor loop:

        1. Overlay all terms' 128-doc block boundaries into ELEMENTARY
           INTERVALS of the doc-id axis; each interval's upper bound is
           the sum of the covering blocks' max impacts (one sort +
           cumsum over ≤ 2·Σblocks boundary events).
        2. Visit intervals best-bound-first in batches; score each
           batch's docs with the same vectorized BM25 kernel as the
           exhaustive path (ragged searchsorted gather per term).
        3. Stop when the next interval's bound is strictly below the
           current k-th score — remaining docs can neither beat nor tie
           it. Ties at the boundary therefore match the exhaustive
           path's smallest-doc-id rule exactly (same float-add order,
           same lexicographic (-score, doc_id) selection).
        """
        # with a block_offs seek table the whole WAND runs over
        # LazyPostings: the interval overlay needs only block metadata,
        # and the score loop decodes just the visited intervals' blocks
        # — a frequent term whose low-impact blocks are pruned is never
        # decoded there (the eager path remains for pre-seek-table
        # indexes)
        lazy = self._has_block_offs
        tws = []
        for term, w in weighted_terms:
            tp = (self.lookup_lazy(term) if lazy else self.lookup(term))
            if tp is not None and w > 0 and tp.df:
                tws.append((tp, w))
        if not tws:
            return []
        # interval overlay: +ub at block start, -ub past block end;
        # nextafter guards the float32 round-down of the stored per-block
        # max (a bound a hair too low could skip a genuine tie)
        xs, deltas = [], []
        for tp, w in tws:
            ub = np.nextafter(
                tp.block_max_impact.astype(np.float64), np.inf) * w
            lasts = tp.block_last_doc
            starts = np.empty_like(lasts)
            starts[0] = (tp.block_docs(0)[0] if lazy
                         else tp.doc_ids[0])
            starts[1:] = lasts[:-1] + 1
            xs.append(starts)
            deltas.append(ub)
            xs.append(lasts + 1)
            deltas.append(-ub)
        x = np.concatenate(xs)
        d = np.concatenate(deltas)
        ev = np.argsort(x, kind="stable")
        env = np.cumsum(d[ev])
        ux, first = np.unique(x[ev], return_index=True)
        env_u = env[np.concatenate((first[1:], [len(x)])) - 1]
        lo, hi, ub_int = ux[:-1], ux[1:], env_u[:-1]
        live = ub_int > 0
        lo, hi, ub_int = lo[live], hi[live], ub_int[live]
        visit = np.argsort(-ub_int, kind="stable")

        best_docs = np.empty(0, np.int64)
        best_scores = np.empty(0, np.float64)
        thresh = -np.inf
        i = 0
        batch = self._WAND_BATCH
        done = False
        while i < len(visit) and not done:
            take = visit[i:i + batch]
            i += len(take)
            # geometric growth: when pruning isn't biting (flat envelope,
            # e.g. several frequent terms over hash-uniform doc ids) the
            # pass count stays O(log intervals), bounding the overhead vs
            # the exhaustive scan to ~one extra partial pass
            batch *= 4
            if len(best_docs) >= k:
                # keep only intervals still able to beat OR TIE the kth;
                # everything past the cut is below it too (ub-descending)
                cut = int(np.searchsorted(-ub_int[take], -thresh,
                                          side="right"))
                if cut == 0:
                    break
                if cut < len(take):
                    take, done = take[:cut], True
            docs_l, imp_l = [], []
            for tp, w in tws:
                if lazy:
                    # every interval lies inside ONE block of this term
                    # (its own block edges are interval boundaries):
                    # decode only the touched blocks; their ascending
                    # concatenation is sorted, so the same global
                    # searchsorted gather applies
                    blk = np.searchsorted(tp.block_last_doc, lo[take])
                    need = np.unique(blk[blk < tp.nblocks])
                    if not len(need):
                        continue
                    tp.ensure_blocks(need)
                    # accessors, not the raw caches: block 0's docs may
                    # have been decoded alone for the overlay's first
                    # boundary, leaving its tfs to decode on demand here
                    t_docs = np.concatenate(
                        [tp.block_docs(int(x)) for x in need])
                    t_tfs = np.concatenate(
                        [tp.block_tfs(int(x)) for x in need])
                else:
                    t_docs, t_tfs = tp.doc_ids, tp.tfs
                a = np.searchsorted(t_docs, lo[take])
                b = np.searchsorted(t_docs, hi[take])
                cnt = b - a
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                ends = np.cumsum(cnt)
                fi = (np.arange(tot, dtype=np.int64)
                      - np.repeat(ends - cnt, cnt) + np.repeat(a, cnt))
                dsub = t_docs[fi]
                imp = w * seg.bm25_impact(t_tfs[fi], self.doc_dl(dsub),
                                          avgdl)
                docs_l.append(dsub)
                imp_l.append(imp)
            if docs_l:
                alldocs = np.concatenate(docs_l)
                allimp = np.concatenate(imp_l)
                o2 = np.argsort(alldocs, kind="stable")  # term order kept
                sd, si = alldocs[o2], allimp[o2]
                bnd = np.flatnonzero(
                    np.concatenate(([True], sd[1:] != sd[:-1])))
                docs = sd[bnd]
                scores = np.add.reduceat(si, bnd)
                if len(docs) > k:  # O(n) local reduce before the merge
                    keep = _topk_tie_aware(docs, scores, k)
                    docs, scores = docs[keep], scores[keep]
                bd = np.concatenate((best_docs, docs))
                bs = np.concatenate((best_scores, scores))
                sel = np.lexsort((bd, -bs))[:k]
                best_docs, best_scores = bd[sel], bs[sel]
                if len(best_docs) >= k:
                    thresh = best_scores[-1]
        return [(float(s), int(dd))
                for s, dd in zip(best_scores, best_docs)]

    # -- conjunctive skipping (block-lazy AND, scale path) -------------------
    CONJ_SKEW = 4      # engage when max_df ≥ CONJ_SKEW × min_df
    CONJ_MIN_DF = 4096  # ... and the frequent list is worth skipping
    # ... and candidates are sparse enough in the frequent list's blocks
    # (each candidate can force one block decode). With the batched
    # block decode (LazyPostings.ensure_blocks: ONE varint call for all
    # touched blocks) the skip path beats the generic full decode even
    # when candidates touch half the blocks — measured 6.3 ms vs 10.7 ms
    # at min_df=10k/max_df=157k — so only the degenerate min_df≈max_df
    # case (already skew-gated) is excluded.
    CONJ_BLOCK_COST = 1

    def _conjunctive_topk(self, terms: list[str], k: int,
                          idf: dict[str, float], avgdl: float
                          ) -> "list[tuple[float, int, str, str]] | None":
        """Top-k for a pure AND-of-words plan without ever fully
        decoding the frequent terms: the rarest term's postings seed the
        candidate set; every other term is probed block-lazily (only the
        128-doc blocks the candidates land in decode — the Ray-side
        SeekDocumentPost, Posts.hpp:448-473). Returns None when the dfs
        are balanced (no skipping to be had — the generic path's single
        full decode is then the cheaper constant). Results are
        bit-identical to the generic path (same candidate set, same
        float accumulation order; pinned by tests/test_conjunctive.py)."""
        infos: list[tuple[str, int]] = []
        for t in terms:
            i = self._find_row(t)
            if i is None:
                return []  # AND with an absent term matches nothing
            infos.append((t, int(self._table.column("df")[i].as_py())))
        dfs = [d for _, d in infos]
        # engage only when (a) dfs are skewed (otherwise nothing to
        # skip), (b) the frequent list is big enough that avoiding its
        # full decode beats the per-block bookkeeping (same 4096 floor
        # as the WAND gate, measured on small shards), and (c) the
        # candidate set is small relative to the frequent term's block
        # count — min_df candidates touch ≤ min_df blocks, each decoding
        # BLOCK_SIZE postings, so past min_df ≈ max_df/BLOCK_SIZE the
        # skip path re-decodes most of the list anyway and the generic
        # single-pass decode has the better constant
        if max(dfs) < self.CONJ_SKEW * max(min(dfs), 1) \
                or max(dfs) < self.CONJ_MIN_DF \
                or min(dfs) * self.CONJ_BLOCK_COST > max(dfs):
            return None
        order = sorted(range(len(infos)), key=lambda j: dfs[j])
        seed = infos[order[0]][0]
        tp0 = self.lookup(seed)  # full decode of the RARE term only
        cand = tp0.doc_ids
        for j in order[1:]:
            if not len(cand):
                return []
            hit, _ = self.lookup_lazy(infos[j][0]).gather(cand)
            cand = cand[hit]
        if not len(cand):
            return []
        dls = self.doc_dl(cand)
        scores = np.zeros(len(cand), dtype=np.float64)
        for t, _df in infos:  # plan order == scoring_terms order
            w = idf.get(t)
            if w is None:
                continue
            if t == seed:
                tfs = tp0.tfs[np.searchsorted(tp0.doc_ids, cand)]
            else:  # blocks already cached by the intersection pass
                _hit, tfs = self.lookup_lazy(t).gather(cand)
            scores += w * seg.bm25_impact(tfs, dls, avgdl)
        top = _topk_tie_aware(cand, scores, k)
        out = []
        for i in top:
            url, title = self.doc_meta(int(cand[i]))
            out.append((float(scores[i]),
                        int(self.doc_ids[cand[i]]), url, title))
        return out

    # -- scoring ------------------------------------------------------------
    def score_topk(self, plan, k: int, idf: dict[str, float],
                   avgdl: float) -> list[tuple[float, int, str, str]]:
        # pure disjunctions take the vectorized block-max WAND path (no
        # full-candidate materialization; whole intervals that cannot
        # reach the top-k are never decoded). Very large synonym
        # expansions overlay too many block boundaries to pay off — cap;
        # and below a few thousand matching postings the interval
        # overlay costs more than just scoring everything (measured:
        # 0.3 ms vs 0.15 ms on a 2k-doc shard, but 4.6× the other way
        # on a 64k-doc shard), so small lookups stay exhaustive.
        wand_terms = (pure_disjunction_terms(plan, idf)
                      if self.wand_ok else None)
        if wand_terms is not None and len(wand_terms) > 32:
            wand_terms = None
        if wand_terms is not None:
            # df from the light metadata table — probing the gate must
            # not decode (or page in) any posting bytes
            total_df = 0
            for t, _ in wand_terms:
                i = self._find_row(t)
                if i is not None:
                    total_df += int(self._table.column("df")[i].as_py())
            if total_df < 4096 * max(1, len(wand_terms)):
                wand_terms = None
        if wand_terms is not None:
            out = []
            for score, ordinal in self.wand_topk(wand_terms, k, avgdl):
                url, title = self.doc_meta(ordinal)
                out.append((score, int(self.doc_ids[ordinal]), url,
                            title))
            return out
        # pure AND-of-words plans with skewed dfs skip through the
        # frequent terms block-lazily instead of fully decoding them
        and_terms = conjunctive_word_terms(plan)
        if and_terms is not None and len(and_terms) >= 2 \
                and self._has_block_offs:
            res = self._conjunctive_topk(and_terms, k, idf, avgdl)
            if res is not None:
                return res
        # heavy plans (leaf postings a sizable fraction of the shard)
        # evaluate as dense bitmaps; selective plans keep the
        # sorted-array algebra (identical result sets either way)
        total_df = 0
        for t, _ in flatten_terms(plan):
            tp = self.lookup(t)
            if tp is not None:
                total_df += tp.df
        dense = False
        if 4 * total_df >= len(self.doc_ids):
            cand = np.flatnonzero(self._eval_mask(plan))
            dense = True
        else:
            cand = self.eval(plan)
        if not len(cand):
            return []
        if dense or len(self.doc_ids) <= 4 * len(cand):
            # dense path: when the candidate set is a sizable fraction
            # of the shard, accumulate every term's impacts into ONE
            # full-shard score vector — posting ordinals ARE the dense
            # positions, zero probes per term — then gather the
            # candidates' scores. Bounded alloc: n_docs float64
            # ≤ 4 × |cand| × 8 B.
            full = np.zeros(len(self.doc_ids), dtype=np.float64)
            for term, is_syn in scoring_terms(plan):
                tp = self.lookup(term)
                w = idf.get(term)
                if tp is None or w is None:
                    continue
                di = tp.doc_ids
                imp = seg.bm25_impact(tp.tfs, self.dls[di], avgdl)
                full[di] += (SYN_WEIGHT if is_syn else 1.0) * w * imp
            scores = full[cand]
            order = _topk_tie_aware(cand, scores, k)
            out = []
            for i in order:
                url, title = self.doc_meta(int(cand[i]))
                out.append((float(scores[i]),
                            int(self.doc_ids[cand[i]]), url, title))
            return out
        dls = self.doc_dl(cand)
        scores = np.zeros(len(cand), dtype=np.float64)
        for term, is_syn in scoring_terms(plan):
            tp = self.lookup(term)
            w = idf.get(term)
            if tp is None or w is None:
                continue
            if len(tp.doc_ids) < len(cand):
                # rare term: probe the candidate array with the postings
                # (O(df log C)) instead of the other way round — both
                # sides are unique+sorted so the hit positions are
                # unique and fancy-index += is exact
                pos = np.searchsorted(cand, tp.doc_ids)
                np.clip(pos, 0, len(cand) - 1, out=pos)
                hit = cand[pos] == tp.doc_ids
                if not hit.any():
                    continue
                ci = pos[hit]
                imp = seg.bm25_impact(tp.tfs[hit], dls[ci], avgdl)
                scores[ci] += (SYN_WEIGHT if is_syn else 1.0) * w * imp
            else:
                pos = np.searchsorted(tp.doc_ids, cand)
                np.clip(pos, 0, len(tp.doc_ids) - 1, out=pos)
                hit = tp.doc_ids[pos] == cand
                if not hit.any():
                    continue
                tfs = tp.tfs[pos[hit]]
                imp = seg.bm25_impact(tfs, dls[hit], avgdl)
                scores[hit] += (SYN_WEIGHT if is_syn else 1.0) * w * imp
        # tie-aware O(n) top-k (argpartition alone picks an arbitrary
        # subset among ties at the k-th boundary; a full lexsort costs
        # O(n log n) per query)
        order = _topk_tie_aware(cand, scores, k)
        out = []
        for i in order:
            url, title = self.doc_meta(int(cand[i]))
            out.append((float(scores[i]),
                        int(self.doc_ids[cand[i]]), url, title))
        return out


@ray.remote
class SegmentSearcher:
    """Actor owning several shards (T3: state loaded once in __init__)."""

    def __init__(self, index_dir: str, shards: list[int],
                 wand_ok_shards: set[int] | None = None):
        ok = wand_ok_shards
        self.shards = [ShardIndex(index_dir, s,
                                  wand_ok=(ok is None or s in ok))
                       for s in shards]

    def ready(self) -> bool:
        return True

    def search(self, plan, k: int, idf: dict[str, float],
               avgdl: float) -> list[tuple[float, int, str, str]]:
        results: list[tuple[float, int, str, str]] = []
        for sh in self.shards:
            results.extend(sh.score_topk(plan, k, idf, avgdl))
        results.sort(key=lambda r: (-r[0], r[1]))
        return results[:k]

    def search_many(self, plans: list, k: int, idfs: list[dict],
                    avgdl: float) -> list[list[tuple]]:
        """Batch serving: many queries in ONE RPC. Driver fan-out cost
        becomes O(actors) per batch instead of O(actors × queries) —
        the throughput-mode analogue of the reference csolver reading a
        socket stream of queries per node."""
        return [self.search(p, k, i, avgdl)
                for p, i in zip(plans, idfs)]


# ---------------------------------------------------------------------------
# driver-side engine
# ---------------------------------------------------------------------------

class SearchEngine:
    """Compile queries, fan out to the searcher pool, merge top-k."""

    def __init__(self, index_dir: str, num_searchers: int | None = None,
                 use_synonyms: bool = True, cache_size: int = 0,
                 use_wand: bool = True, actors: list | None = None,
                 profile: str = "latency",
                 actor_shards: list[list[int]] | None = None,
                 use_directory: bool = True, dir_pool=None):
        # use_wand=True (round-3 default): the block-max path is now
        # vectorized block-at-a-time (interval overlay + batched numpy
        # scoring, see ShardIndex.wand_topk), so its per-doc constant
        # matches the exhaustive scorer's while skipping whole 128-doc
        # blocks that cannot reach the top-k — the round-2 per-doc
        # Python cursor loop that lost ~200× is gone. Equivalence is
        # pinned by tests/test_wand.py; opt out with use_wand=False.
        man = seg.read_manifest(index_dir)
        if man is None or "terms" not in man.get("stages_done", []):
            raise FileNotFoundError(f"no complete index at {index_dir}")
        if man["stats"].get("posting_format") != "ordinal":
            # pre-v18 indexes store raw 63-bit doc fingerprints in the
            # posting lists; interpreting them as dense ordinals would
            # IndexError (or worse, mis-score) at query time — fail loud
            raise ValueError(
                f"index at {index_dir} predates the ordinal posting "
                "layout (v18); rebuild it with build_index(force=True)")
        self.n_docs = man["stats"]["n_docs"]
        self.avgdl = man["stats"]["avgdl"]
        num_shards = man["stats"]["num_shards"]
        t = pq.read_table(os.path.join(index_dir, "terms"))
        self._df = dict(zip(t.column("term").to_pylist(),
                            t.column("df").to_pylist()))
        self.synsets = qc.get_default_synsets() if use_synonyms else None
        if actors is not None:
            # share an existing searcher pool (frontend tier): this
            # engine only compiles, fans out and merges. actor_shards
            # (parallel to actors) enables bloom fan-out pruning.
            self.actors = list(actors)
            self._owns_actors = False
            self._cache_size = cache_size
            self._cache = {}
            self._actor_shards = ([list(sh) for sh in actor_shards]
                                  if actor_shards is not None else None)
            self._load_blooms(index_dir)
            self._setup_directory(index_dir, man["stats"],
                                  use_directory, dir_pool)
            return
        self._owns_actors = True
        if num_searchers is None:
            # pool size balances two costs: per-query latency is bounded
            # by the slowest actor's SERIAL shard loop (wants more
            # actors — measured p50 104 → 76 ms at 3.2M docs going
            # cpus/2 → cpus), but every actor adds ~0.3 ms of driver
            # fan-out RPC overhead (wants fewer — measured p50 19.5 →
            # 14.7 ms at 98 shards going 32 → 16 actors). Target ≈ 8
            # shards per actor, clamped to [cpus/2, cpus].
            cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
            if profile == "throughput":
                # one searcher per core: maximizes aggregate qps when
                # queries arrive concurrently (e.g. behind a
                # FrontendPool) — per-query fan-out overhead is paid by
                # the frontends, not a single driver loop
                num_searchers = min(num_shards, cpus)
            else:
                num_searchers = min(num_shards, cpus,
                                    max(cpus // 2, -(-num_shards // 8),
                                        1))
        stale = set(man["stats"].get("wand_stale_shards", []))
        wand_ok = ({s for s in range(num_shards) if s not in stale}
                   if use_wand else set())
        assign: list[list[int]] = [[] for _ in range(num_searchers)]
        for s in range(num_shards):
            assign[s % num_searchers].append(s)
        self.actors = [SegmentSearcher.remote(index_dir, sh,
                                              wand_ok & set(sh))
                       for sh in assign if sh]
        self._actor_shards = [sh for sh in assign if sh]
        self._load_blooms(index_dir)
        self._setup_directory(index_dir, man["stats"],
                              use_directory, dir_pool)
        ray.get([a.ready.remote() for a in self.actors])
        # optional per-engine result LRU (the reference ships an unused
        # LRU cache template, lib/cache.h — T5); off by default so latency
        # benchmarks stay honest
        self._cache_size = cache_size
        self._cache: dict[tuple[str, int], pa.Table] = {}

    def _setup_directory(self, index_dir: str, stats: dict,
                         use_directory: bool, dir_pool) -> None:
        """Exact two-hop fan-out routing (state/term_directory.py):
        adopt a shared DirectoryPool, or spin one up when the on-disk
        directory matches the live manifest. Never required — absent or
        stale directories fall back to Bloom pruning."""
        from ..state import term_directory as td
        self._dir_pool = dir_pool
        self._owns_dir_pool = False
        if dir_pool is not None or not use_directory \
                or not self._owns_actors:
            # shared-searcher engines (frontend tier) only ADOPT a pool:
            # spinning one per frontend would multiply directory actors
            return
        meta = td.directory_matches(index_dir, stats)
        if meta is not None and self._actor_shards is not None:
            self._dir_pool = td.DirectoryPool(index_dir,
                                              meta["n_buckets"])
            self._owns_dir_pool = True

    def _load_blooms(self, index_dir: str) -> None:
        """Per-shard vocab blooms (KBs each, written at merge time):
        fan-out pruning skips actors whose shards can't contain any
        plan term — see state/bloom.py for the 10^5-shard scale path."""
        self._blooms: dict[int, bytes] = {}
        if self._actor_shards is None:
            return
        for sh in self._actor_shards:
            for s in sh:
                p = os.path.join(index_dir, "segments", f"shard={s}",
                                 "_vocab.bloom")
                try:
                    with open(p, "rb") as f:
                        self._blooms[s] = f.read()
                except OSError:
                    pass  # pre-bloom index: no pruning for this shard

    def _actor_mask(self, plan) -> "list | None":
        """Actors whose shards may contain at least one plan term.
        Directory routing when available (EXACT: a rare term RPCs only
        the actors owning its shards; an absent term RPCs nobody), else
        the per-shard Bloom test (false-positive-only). None = no
        pruning possible."""
        if self._actor_shards is None:
            return None
        terms = [t for t, _ in flatten_terms(plan)]
        if not terms:
            return None
        if self._dir_pool is not None:
            shard_map = self._dir_pool.shards_for(terms)
            want = {int(s) for arr in shard_map.values() for s in arr}
            if not want:
                return []
            return [a for a, shards in zip(self.actors,
                                           self._actor_shards)
                    if any(s in want for s in shards)]
        if not self._blooms:
            return None
        hashes = sb.hash_terms(terms)  # hash once, test per blob
        live = []
        for a, shards in zip(self.actors, self._actor_shards):
            for s in shards:
                blob = self._blooms.get(s)
                if blob is None or sb.contains_any_hashed(blob, hashes):
                    live.append(a)
                    break
        return live

    def idf(self, term: str) -> float:
        df = self._df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def compile(self, query: str):
        # engine mode fixes the title decoration so '@' terms match the
        # index vocabulary (the compat path keeps the reference quirk)
        return qc.compile_query(query, self.synsets, title_stem_fix=True)

    def search(self, query: str, k: int = 10) -> pa.Table:
        if self._cache_size:
            hit = self._cache.get((query, k))
            if hit is not None:
                return hit
        plan = self.compile(query)
        merged = []
        if plan is not None:
            # bloom fan-out pruning: actors whose shards can't contain
            # any plan term are never RPC'd (empty list = provably no
            # matches anywhere)
            targets = self._actor_mask(plan)
            if targets is None:
                targets = self.actors
            idf = {t: self.idf(t) for t, _ in flatten_terms(plan)}
            # ray.put once: the plan+idf payload is serialized a single
            # time per query instead of once per actor in the fan-out
            plan_ref, idf_ref = ray.put(plan), ray.put(idf)
            parts = ray.get([a.search.remote(plan_ref, k, idf_ref,
                                             self.avgdl)
                             for a in targets])
            merged = sorted((r for p in parts for r in p),
                            key=lambda r: (-r[0], r[1]))[:k]
        result = self._table_from_merged(merged)
        if self._cache_size:
            if len(self._cache) >= self._cache_size:
                self._cache.pop(next(iter(self._cache)))
            self._cache[(query, k)] = result
        return result

    def _table_from_merged(self, merged) -> pa.Table:
        cols = {"rank": [], "score": [], "doc_id": [], "url": [],
                "title": []}
        for rank, (score, doc_id, url, title) in enumerate(merged, 1):
            cols["rank"].append(rank)
            cols["score"].append(score)
            cols["doc_id"].append(doc_id)
            cols["url"].append(url)
            cols["title"].append(title)
        return pa.table({
            "rank": pa.array(cols["rank"], pa.int64()),
            "score": pa.array(cols["score"], pa.float64()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "url": pa.array(cols["url"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
        })

    def search_batch(self, queries: list[str], k: int = 10
                     ) -> list[pa.Table]:
        """Batch serving: one search_many RPC per actor for the whole
        query list (results identical to per-query search; pinned by
        tests/test_build_search.py)."""
        plans = [self.compile(q) for q in queries]
        live = [(qi, p) for qi, p in enumerate(plans) if p is not None]
        out: list[pa.Table] = [self._table_from_merged([])
                               for _ in queries]
        if not live:
            return out
        # bloom fan-out pruning per query: each actor evaluates only the
        # sublist of queries its shards can match (results identical —
        # a pruned actor would have returned [] for those queries)
        masks = [self._actor_mask(p) for _, p in live]
        actor_qs: list[list[int]] = [[] for _ in self.actors]
        actor_pos = {id(a): ai for ai, a in enumerate(self.actors)}
        for j, m in enumerate(masks):
            for a in (self.actors if m is None else m):
                actor_qs[actor_pos[id(a)]].append(j)
        idfs = [{t: self.idf(t) for t, _ in flatten_terms(p)}
                for _, p in live]
        sub_plans = [p for _, p in live]
        futs, fut_qs = [], []
        put_cache: dict[tuple, tuple] = {}  # identical sublists (the
        # no-pruning common case) serialize once, not once per actor
        for ai, qjs in enumerate(actor_qs):
            if not qjs:
                continue
            key = tuple(qjs)
            refs = put_cache.get(key)
            if refs is None:
                refs = (ray.put([sub_plans[j] for j in qjs]),
                        ray.put([idfs[j] for j in qjs]))
                put_cache[key] = refs
            futs.append(self.actors[ai].search_many.remote(
                refs[0], k, refs[1], self.avgdl))
            fut_qs.append(qjs)
        per_query: list[list] = [[] for _ in live]
        for parts, qjs in zip(ray.get(futs), fut_qs):
            for local, j in enumerate(qjs):
                per_query[j].extend(parts[local])
        for j, (qi, _) in enumerate(live):
            merged = sorted(per_query[j],
                            key=lambda r: (-r[0], r[1]))[:k]
            out[qi] = self._table_from_merged(merged)
        return out

    def close(self) -> None:
        if self._owns_actors:
            for a in self.actors:
                ray.kill(a)
        self.actors = []
        if getattr(self, "_owns_dir_pool", False) \
                and self._dir_pool is not None:
            self._dir_pool.close()
        self._dir_pool = None


# ---------------------------------------------------------------------------
# frontend tier: N query coordinators over ONE shared searcher pool
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0)
class _FrontendActor:
    """A query front-end: compiles, fans out to the shared searcher
    pool and merges — inside an actor, so the per-query Python work
    (compile + ray.put + merge, ~2-6 ms) runs in parallel across
    frontends instead of serializing on one driver loop (the reference
    runs one csolver *driver* per front-end machine for the same
    reason, csolver/main.cpp). num_cpus=0: frontends spend their time
    blocked in ray.get on searcher RPCs; on a multi-node cluster give
    them a fractional CPU + SPREAD scheduling instead."""

    def __init__(self, index_dir: str, actors: list,
                 use_synonyms: bool = True, use_wand: bool = True,
                 actor_shards: list | None = None, dir_pool=None):
        self.eng = SearchEngine(index_dir, use_synonyms=use_synonyms,
                                use_wand=use_wand, actors=actors,
                                actor_shards=actor_shards,
                                dir_pool=dir_pool)

    def ready(self) -> bool:
        return True

    def search_many(self, queries: list[str], k: int = 10
                    ) -> list[pa.Table]:
        return [self.eng.search(q, k) for q in queries]


class FrontendPool:
    """Interactive serving through ``n_frontends`` coordinator actors
    sharing one searcher pool. ``search_stream`` keeps every frontend
    busy with bounded in-flight chunks and returns results in input
    order — the multi-frontend topology VERDICT r3 asked to demonstrate
    (one driver's Python loop was the interactive scaling floor)."""

    def __init__(self, index_dir: str, actors: list,
                 n_frontends: int = 4, use_synonyms: bool = True,
                 use_wand: bool = True,
                 actor_shards: list | None = None, dir_pool=None):
        # one shared DirectoryPool handle set: frontends route through
        # the same directory actors (each keeps its own term cache)
        self.frontends = [
            _FrontendActor.remote(index_dir, list(actors),
                                  use_synonyms=use_synonyms,
                                  use_wand=use_wand,
                                  actor_shards=actor_shards,
                                  dir_pool=dir_pool)
            for _ in range(n_frontends)]
        ray.get([f.ready.remote() for f in self.frontends])

    def search_stream(self, queries: list[str], k: int = 10,
                      chunk: int = 4, depth: int = 2) -> list[pa.Table]:
        """Bounded in-flight serving: at most ``depth`` chunks queued
        per frontend; each completion hands the NEXT chunk to whichever
        frontend freed up (ray.wait), so one slow frontend slows only
        its in-flight work instead of serializing a static share."""
        chunks = [(ci, queries[i:i + chunk])
                  for ci, i in enumerate(range(0, len(queries), chunk))]
        parts: list[list[pa.Table] | None] = [None] * len(chunks)
        pending: dict = {}  # future -> (chunk_index, frontend)
        nxt = 0
        for f in self.frontends * depth:
            if nxt >= len(chunks):
                break
            ci, qs = chunks[nxt]
            pending[f.search_many.remote(qs, k)] = (ci, f)
            nxt += 1
        while pending:
            done, _ = ray.wait(list(pending), num_returns=1)
            ci, f = pending.pop(done[0])
            parts[ci] = ray.get(done[0])
            if nxt < len(chunks):
                cj, qs = chunks[nxt]
                pending[f.search_many.remote(qs, k)] = (cj, f)
                nxt += 1
        out: list[pa.Table] = []
        for part in parts:
            out.extend(part or [])
        return out

    def close(self) -> None:
        for f in self.frontends:
            ray.kill(f)
        self.frontends = []
