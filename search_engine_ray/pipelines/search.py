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


# ---------------------------------------------------------------------------
# per-shard evaluation
# ---------------------------------------------------------------------------

_EMPTY = np.empty(0, dtype=np.int64)


class ShardIndex:
    """One document shard: lazy-decoded posting lists + doc attributes.

    Parquet files are opened memory-mapped; term rows decode on first use
    and are cached (mirrors the csolver mmap+read-on-demand, main.cpp:59-108).
    """

    def __init__(self, index_dir: str, shard: int, wand_ok: bool = True):
        # wand_ok=False when this shard's block-max bounds were computed
        # with a stale avgdl (after append_to_index, before
        # refresh_block_max) — exact exhaustive scoring is used instead
        self.wand_ok = wand_ok
        seg_path = os.path.join(index_dir, "segments", f"shard={shard}")
        doc_path = os.path.join(index_dir, "docmeta", f"shard={shard}")
        t = pq.read_table(seg_path, memory_map=True)
        # segment rows are written term-sorted: lookups binary-search the
        # Arrow column directly (O(log n) probes, cached) instead of
        # materializing a python dict of every term at actor startup
        self._terms = t.column("term").combine_chunks()
        self._table = t
        self._cache: dict[str, seg.TermPostings] = {}
        d = pq.read_table(doc_path, memory_map=True,
                          columns=["doc_id", "url", "title", "dl"])
        order = np.argsort(d.column("doc_id").to_numpy())
        self.doc_ids = d.column("doc_id").to_numpy()[order]
        self.dls = d.column("dl").to_numpy(zero_copy_only=False)[order]
        self._urls = d.column("url").take(pa.array(order))
        self._titles = d.column("title").take(pa.array(order))

    def vocab(self) -> list[str]:
        """All terms in this shard (testing/diagnostics)."""
        return self._terms.to_pylist()

    def _find_row(self, term: str) -> int | None:
        lo, hi = 0, len(self._terms)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._terms[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(self._terms) and self._terms[lo].as_py() == term:
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
               for name in ("df", "cf", "doc_gaps", "tfs", "pos_gaps",
                            "block_last_doc", "block_max_impact")}
        tp = seg.TermPostings(row)
        self._cache[term] = tp
        return tp

    def doc_meta(self, doc_id: int) -> tuple[str, str]:
        i = int(np.searchsorted(self.doc_ids, doc_id))
        return self._urls[i].as_py(), self._titles[i].as_py()

    def doc_dl(self, cand: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.doc_ids, cand)
        return self.dls[idx]

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
        tps = []
        for t in terms:
            tp = self.lookup(t)
            if tp is None:
                return _EMPTY
            tps.append(tp)
        cand = tps[0].doc_ids
        for tp in tps[1:]:
            cand = np.intersect1d(cand, tp.doc_ids, assume_unique=True)
            if not len(cand):
                return _EMPTY
        # vectorized adjacency check across ALL candidates at once: pack
        # (candidate ordinal, shifted position) into one sorted uint64
        # key per term occurrence and intersect the key sets — no
        # per-candidate Python loop (a frequent pair used to cost ~10 µs
        # × candidates × terms here)
        idxs = [np.searchsorted(tp.doc_ids, cand) for tp in tps]

        def flat_keys(tp, idx: np.ndarray, shift: int) -> np.ndarray:
            starts = tp.pos_offsets[idx]
            ln = tp.pos_offsets[idx + 1] - starts
            total = int(ln.sum())
            if total == 0:
                return np.empty(0, dtype=np.int64)
            base = np.repeat(starts, ln)
            offs = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(ln) - ln, ln)
            pos = tp.positions[base + offs] - shift
            ords = np.repeat(np.arange(len(idx), dtype=np.int64), ln)
            keep = pos >= 0
            return (ords[keep] << np.int64(32)) | pos[keep]

        keys = flat_keys(tps[0], idxs[0], 0)
        for i in range(1, len(tps)):
            if not len(keys):
                return _EMPTY
            keys = np.intersect1d(keys, flat_keys(tps[i], idxs[i], i),
                                  assume_unique=True)
        if not len(keys):
            return _EMPTY
        return cand[np.unique(keys >> np.int64(32))]

    # -- block-max WAND (pure-disjunction top-k, the scale path) ------------
    def wand_topk(self, weighted_terms: list[tuple[str, float]], k: int,
                  avgdl: float) -> list[tuple[float, int]]:
        """Block-max WAND (Broder et al. 2003 / Ding & Suel 2011) over this
        shard: per-term cursors with per-128-doc block max impacts skip
        documents that cannot enter the current top-k. Returns (score,
        doc_id) descending; exact same scores as exhaustive evaluation."""
        import heapq

        cursors = []
        for term, w in weighted_terms:
            tp = self.lookup(term)
            if tp is not None and w > 0:
                ub = float(tp.block_max_impact.max()) * w
                cursors.append({"tp": tp, "w": w, "i": 0, "ub": ub})
        if not cursors:
            return []
        INF = np.iinfo(np.int64).max
        heap: list[tuple[float, int]] = []  # min-heap of (score, doc_id)

        def cur_doc(c):
            tp = c["tp"]
            return int(tp.doc_ids[c["i"]]) if c["i"] < len(tp.doc_ids) \
                else INF

        def block_ub(c, doc):
            tp = c["tp"]
            b = int(np.searchsorted(tp.block_last_doc, doc))
            if b >= len(tp.block_max_impact):
                return 0.0
            return float(tp.block_max_impact[b]) * c["w"]

        while True:
            cursors.sort(key=cur_doc)
            threshold = heap[0][0] if len(heap) >= k else 0.0
            acc = 0.0
            pivot = -1
            for idx, c in enumerate(cursors):
                if cur_doc(c) == INF:
                    break
                acc += c["ub"]
                # >= : a doc whose score exactly TIES the heap minimum
                # must be evaluated — under the (-score, doc) order a
                # smaller doc_id wins the tie (heap replace is tie-aware)
                if acc >= threshold:
                    pivot = idx
                    break
            if pivot == -1:
                break
            pivot_doc = cur_doc(cursors[pivot])
            if pivot_doc == INF:
                break
            # block-max refinement: tighter bound from current blocks
            bm_acc = sum(block_ub(c, pivot_doc)
                         for c in cursors[:pivot + 1])
            # strict < : equality may still tie the heap minimum
            if len(heap) >= k and bm_acc < threshold:
                # BMW-safe skip: no doc in [pivot_doc, d_next) can beat the
                # threshold, where d_next is the nearest block boundary of
                # the leading cursors, capped by the next cursor's doc
                d_next = INF
                for c in cursors[:pivot + 1]:
                    tp = c["tp"]
                    b = int(np.searchsorted(tp.block_last_doc, pivot_doc))
                    if b < len(tp.block_last_doc):
                        d_next = min(d_next, int(tp.block_last_doc[b]) + 1)
                if pivot + 1 < len(cursors):
                    nxt_doc = cur_doc(cursors[pivot + 1])
                    if nxt_doc != INF:
                        d_next = min(d_next, nxt_doc)
                d_next = max(d_next, pivot_doc + 1)
                for c in cursors[:pivot + 1]:
                    if cur_doc(c) < d_next:
                        tp = c["tp"]
                        c["i"] += int(np.searchsorted(
                            tp.doc_ids[c["i"]:], d_next))
                continue
            if cur_doc(cursors[0]) == pivot_doc:
                # fully evaluate pivot_doc
                dl = float(self.doc_dl(np.asarray([pivot_doc]))[0])
                score = 0.0
                for c in cursors:
                    if cur_doc(c) == pivot_doc:
                        tp = c["tp"]
                        tf = float(tp.tfs[c["i"]])
                        score += c["w"] * (tf / (tf + seg.K1 * (
                            1 - seg.B + seg.B * dl / avgdl)))
                        c["i"] += 1
                if len(heap) < k:
                    heapq.heappush(heap, (score, -pivot_doc))
                elif (score, -pivot_doc) > heap[0]:
                    heapq.heapreplace(heap, (score, -pivot_doc))
            else:
                # advance the largest-ub cursor that is strictly before the
                # pivot doc (choosing one already AT pivot_doc would make
                # no progress → livelock)
                behind = [c for c in cursors[:pivot + 1]
                          if cur_doc(c) < pivot_doc]
                lead = max(behind, key=lambda c: c["ub"])
                tp = lead["tp"]
                lead["i"] += int(np.searchsorted(
                    tp.doc_ids[lead["i"]:], pivot_doc))
        out = sorted(((s, -nd) for s, nd in heap),
                     key=lambda x: (-x[0], x[1]))
        return [(s, d) for s, d in out]

    # -- scoring ------------------------------------------------------------
    def score_topk(self, plan, k: int, idf: dict[str, float],
                   avgdl: float) -> list[tuple[float, int, str, str]]:
        # pure disjunctions take the block-max WAND path (no candidate
        # materialization; docs that cannot reach the top-k are skipped).
        # With many cursors (large synonym expansions) the per-doc Python
        # loop loses to the vectorized exhaustive path — cap it.
        wand_terms = (pure_disjunction_terms(plan, idf)
                      if self.wand_ok else None)
        if wand_terms is not None and len(wand_terms) > 12:
            wand_terms = None
        if wand_terms is not None:
            out = []
            for score, doc_id in self.wand_topk(wand_terms, k, avgdl):
                url, title = self.doc_meta(doc_id)
                out.append((score, doc_id, url, title))
            return out
        cand = self.eval(plan)
        if not len(cand):
            return []
        dls = self.doc_dl(cand)
        scores = np.zeros(len(cand), dtype=np.float64)
        for term, is_syn in scoring_terms(plan):
            tp = self.lookup(term)
            w = idf.get(term)
            if tp is None or w is None:
                continue
            pos = np.searchsorted(tp.doc_ids, cand)
            np.clip(pos, 0, len(tp.doc_ids) - 1, out=pos)
            hit = tp.doc_ids[pos] == cand
            if not hit.any():
                continue
            tfs = tp.tfs[pos[hit]]
            imp = seg.bm25_impact(tfs, dls[hit], avgdl)
            scores[hit] += (SYN_WEIGHT if is_syn else 1.0) * w * imp
        # tie-aware O(n) top-k: argpartition alone picks an arbitrary
        # subset among ties at the k-th boundary (diverging from WAND's
        # tie-aware heap), a full lexsort costs O(n log n) per query —
        # instead select strict winners, then fill the remaining slots
        # with the smallest doc_ids among the exact boundary ties
        if len(cand) > k:
            kth = -np.partition(-scores, k - 1)[k - 1]
            win = np.nonzero(scores > kth)[0]
            tie = np.nonzero(scores == kth)[0]
            need = k - len(win)
            if need > 0 and len(tie) > need:
                tie = tie[np.argpartition(cand[tie], need - 1)[:need]]
            top = np.concatenate([win, tie[:max(need, 0)]])
        else:
            top = np.arange(len(cand))
        order = top[np.lexsort((cand[top], -scores[top]))][:k]
        out = []
        for i in order:
            url, title = self.doc_meta(int(cand[i]))
            out.append((float(scores[i]), int(cand[i]), url, title))
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


# ---------------------------------------------------------------------------
# driver-side engine
# ---------------------------------------------------------------------------

class SearchEngine:
    """Compile queries, fan out to the searcher pool, merge top-k."""

    def __init__(self, index_dir: str, num_searchers: int | None = None,
                 use_synonyms: bool = True, cache_size: int = 0,
                 use_wand: bool = False):
        # use_wand=False by default: measured on this corpus the per-doc
        # Python WAND constant (~9 µs) is ~200× the vectorized scorer's
        # per-doc cost (~50 ns), so skipping can never pay for itself —
        # a frequent single term costs 15 ms/shard via WAND vs 0.22 ms
        # exhaustive (BENCH/BASELINE.md r2). Block-max WAND stays fully
        # implemented + equivalence-tested (tests/test_wand.py) and wins
        # once cursors run at C speed; opt in with use_wand=True.
        man = seg.read_manifest(index_dir)
        if man is None or "terms" not in man.get("stages_done", []):
            raise FileNotFoundError(f"no complete index at {index_dir}")
        self.n_docs = man["stats"]["n_docs"]
        self.avgdl = man["stats"]["avgdl"]
        num_shards = man["stats"]["num_shards"]
        t = pq.read_table(os.path.join(index_dir, "terms"))
        self._df = dict(zip(t.column("term").to_pylist(),
                            t.column("df").to_pylist()))
        self.synsets = qc.get_default_synsets() if use_synonyms else None
        if num_searchers is None:
            # one searcher per CPU: per-query latency is bounded by the
            # slowest actor's SERIAL loop over its shards, so fewer
            # shards per actor wins (measured: p50 104 → 76 ms at 3.2M
            # docs going from cpus/2 to cpus actors)
            num_searchers = min(num_shards, max(1, int(
                ray.cluster_resources().get("CPU", 4))))
        stale = set(man["stats"].get("wand_stale_shards", []))
        wand_ok = ({s for s in range(num_shards) if s not in stale}
                   if use_wand else set())
        assign: list[list[int]] = [[] for _ in range(num_searchers)]
        for s in range(num_shards):
            assign[s % num_searchers].append(s)
        self.actors = [SegmentSearcher.remote(index_dir, sh,
                                              wand_ok & set(sh))
                       for sh in assign if sh]
        ray.get([a.ready.remote() for a in self.actors])
        # optional per-engine result LRU (the reference ships an unused
        # LRU cache template, lib/cache.h — T5); off by default so latency
        # benchmarks stay honest
        self._cache_size = cache_size
        self._cache: dict[tuple[str, int], pa.Table] = {}

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
        cols = {"rank": [], "score": [], "doc_id": [], "url": [], "title": []}
        if plan is not None:
            idf = {t: self.idf(t) for t, _ in flatten_terms(plan)}
            parts = ray.get([a.search.remote(plan, k, idf, self.avgdl)
                             for a in self.actors])
            merged = sorted((r for p in parts for r in p),
                            key=lambda r: (-r[0], r[1]))[:k]
            for rank, (score, doc_id, url, title) in enumerate(merged, 1):
                cols["rank"].append(rank)
                cols["score"].append(score)
                cols["doc_id"].append(doc_id)
                cols["url"].append(url)
                cols["title"].append(title)
        result = pa.table({
            "rank": pa.array(cols["rank"], pa.int64()),
            "score": pa.array(cols["score"], pa.float64()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "url": pa.array(cols["url"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
        })
        if self._cache_size:
            if len(self._cache) >= self._cache_size:
                self._cache.pop(next(iter(self._cache)))
            self._cache[(query, k)] = result
        return result

    def close(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
