"""Index build + BM25 search: end-to-end over the adversarial fixture
corpus (includes duplicate urls and oversized-title rejects), with a
brute-force BM25 cross-check and resume semantics."""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.sources.fixtures import gen_pages
from search_engine_ray.kernels.htmlparser import HtmlParser
from search_engine_ray.kernels.stemmer import stem
from search_engine_ray.state import segments as seg


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    import ray.data as rd
    from search_engine_ray.pipelines.build import build_index

    root = tmp_path_factory.mktemp("idx")
    pages_path = str(root / "pages")
    os.makedirs(pages_path)
    pq.write_table(gen_pages(300), os.path.join(pages_path, "part0.parquet"))

    def factory(columns):
        return rd.read_parquet(pages_path, columns=columns)

    out = str(root / "index")
    man = build_index(factory, out, docs_per_shard=64)
    return out, man, pages_path


def brute_force_docs(pages_path):
    """Independent reimplementation: parse every unique page, index terms."""
    t = pq.read_table(pages_path)
    seen = {}
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        if url in seen:
            continue
        p = HtmlParser(html)
        if len(p.title_words) >= 40:
            seen[url] = None
            continue
        terms = []
        for w in p.title_words:
            s = stem(w.decode("utf-8", "ignore"))
            if s:
                terms.append("@" + s)
        for w, _ in p.words_flags:
            s = stem(w.decode("utf-8", "ignore"))
            if s:
                terms.append(s)
        seen[url] = terms
    return {u: t for u, t in seen.items() if t is not None}


def test_build_stats(index_dir):
    out, man, pages_path = index_dir
    docs = brute_force_docs(pages_path)
    assert man["stats"]["n_docs"] == len(docs)
    expect_avgdl = sum(len(t) for t in docs.values()) / len(docs)
    assert abs(man["stats"]["avgdl"] - expect_avgdl) < 1e-9
    assert man["stats"]["num_shards"] >= 2
    assert {"docs", "segments", "terms"} <= set(man["stages_done"])


def test_dedup_exactly_once(index_dir):
    out, man, pages_path = index_dir
    d = pq.read_table(os.path.join(out, "docs"), columns=["url"])
    urls = d.column("url").to_pylist()
    assert len(urls) == len(set(urls))


def test_terms_df_matches_bruteforce(index_dir):
    out, man, pages_path = index_dir
    docs = brute_force_docs(pages_path)
    df = {}
    for terms in docs.values():
        for term in set(terms):
            df[term] = df.get(term, 0) + 1
    t = pq.read_table(os.path.join(out, "terms"))
    got = dict(zip(t.column("term").to_pylist(), t.column("df").to_pylist()))
    assert got == df


def test_bm25_search_matches_bruteforce(index_dir, ray_session):
    from search_engine_ray.pipelines.search import SearchEngine
    from search_engine_ray.kernels.textutils import fnv1a_64

    out, man, pages_path = index_dir
    docs = brute_force_docs(pages_path)
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs

    eng = SearchEngine(out, num_searchers=2, use_synonyms=False)
    try:
        for query in ["running", "children & data", "word1 | word2"]:
            res = eng.search(query, k=10)
            # brute force: same candidate + scoring semantics
            qterms = [stem(w) for w in
                      query.replace("&", " ").replace("|", " ").split()]
            qterms = [t for t in qterms if t]
            is_and = "&" in query
            df = {}
            for terms in docs.values():
                for t in set(terms):
                    df[t] = df.get(t, 0) + 1
            scores = {}
            for url, terms in docs.items():
                # candidates per engine semantics incl. '@' decoration OR
                hits = [t for t in qterms
                        if t in terms or ("@" + t) in terms]
                ok = (len(hits) == len(qterms)) if is_and else bool(hits)
                if not ok:
                    continue
                dl = len(terms)
                s = 0.0
                for t in qterms:
                    for key in ("@" + t, t):
                        tf = terms.count(key)
                        if tf:
                            idf = math.log(
                                1 + (n_docs - df.get(key, 0) + 0.5)
                                / (df.get(key, 0) + 0.5))
                            s += idf * (tf / (tf + seg.K1 * (
                                1 - seg.B + seg.B * dl / avgdl)))
                scores[url] = s
            expect = sorted(scores.items(),
                            key=lambda kv: (-kv[1],
                                            fnv1a_64(kv[0].encode()) >> 1))
            got_urls = res.column("url").to_pylist()
            got_scores = res.column("score").to_pylist()
            assert got_urls == [u for u, _ in expect[:len(got_urls)]], query
            for g, (_, e) in zip(got_scores, expect):
                assert abs(g - e) < 1e-9, query
    finally:
        eng.close()


def test_candidate_semantics_and_not_phrase(index_dir, ray_session):
    from search_engine_ray.pipelines.search import SearchEngine

    out, man, pages_path = index_dir
    docs = brute_force_docs(pages_path)
    eng = SearchEngine(out, num_searchers=2, use_synonyms=False)
    try:
        # AND-NOT: no result doc may contain the negated term
        res = eng.search("running & -children", k=50)
        for url in res.column("url").to_pylist():
            terms = docs[url]
            assert "run" in terms or "@run" in terms
            # body-side 'child' must be excluded; title-side '@child' is NOT
            # excluded because the word path stems '@children' (the @-stem
            # asymmetry quirk, query.cpp:91 vs Indexer.hpp:355-357)
            assert "child" not in terms
        # bare NOT matches nothing (reference csolver cannot serve NOT)
        assert eng.search("-running", k=10).num_rows == 0
        # stopword-only query compiles to invalid → empty
        assert eng.search("the", k=10).num_rows == 0
        # phrase results must show the exact consecutive kept-term sequence
        res = eng.search('"word1 word2"', k=50)
        for url in res.column("url").to_pylist():
            terms = docs[url]
            body = [t for t in terms if not t.startswith("@")]
            title = [t for t in terms if t.startswith("@")]
            seqs = [body, [t[1:] for t in title]]
            found = any(
                s[i] == "word1" and s[i + 1] == "word2"
                for s in seqs for i in range(len(s) - 1))
            # positions span title++body contiguously; also allow boundary
            full = [t[1:] for t in title] + body
            assert found or any(
                full[i] == "word1" and full[i + 1] == "word2"
                for i in range(len(full) - 1)), url
    finally:
        eng.close()


def test_resume_noop_and_stage_redo(index_dir, ray_session):
    import ray.data as rd
    from search_engine_ray.pipelines.build import build_index

    out, man, pages_path = index_dir

    def factory(columns):
        return rd.read_parquet(pages_path, columns=columns)

    import time
    t0 = time.time()
    man2 = build_index(factory, out, docs_per_shard=64)
    assert time.time() - t0 < 2.0  # all stages skipped
    assert man2["stats"]["n_docs"] == man["stats"]["n_docs"]

    # different config → full rebuild with a different shard count
    man3 = build_index(factory, out, docs_per_shard=128)
    assert man3["stats"]["n_docs"] == man["stats"]["n_docs"]
    assert man3["stats"]["num_shards"] != man["stats"]["num_shards"]


def test_segment_blockmax_bounds_scores(index_dir):
    """block_max_impact must upper-bound every impact in its block."""
    out, man, pages_path = index_dir
    t = pq.read_table(os.path.join(out, "segments"))
    # read stats from disk: an earlier test in this module rebuilds the
    # fixture index with a different shard count
    cur_man = seg.read_manifest(out)
    avgdl = cur_man["stats"]["avgdl"]
    # per-shard dl arrays in doc_id-sorted (= ordinal) order: posting
    # doc values are ordinals into the shard's sorted docmeta
    shard_dls = {}
    for name in os.listdir(os.path.join(out, "docmeta")):
        if not name.startswith("shard="):
            continue
        s = int(name.split("=", 1)[1])
        d = pq.read_table(os.path.join(out, "docmeta", name),
                          columns=["doc_id", "dl"])
        o = np.argsort(d.column("doc_id").to_numpy())
        shard_dls[s] = d.column("dl").to_numpy(
            zero_copy_only=False)[o].astype(np.int64)
    for i in range(min(t.num_rows, 200)):
        row = {name: t.column(name)[i].as_py()
               for name in ("df", "cf", "doc_gaps", "tfs", "pos_gaps",
                            "block_last_doc", "block_max_impact")}
        tp = seg.TermPostings(row)
        dls = shard_dls[int(t.column("shard")[i].as_py())][tp.doc_ids]
        imps = seg.bm25_impact(tp.tfs, dls, avgdl)
        for b in range(len(tp.block_max_impact)):
            blk = imps[b * seg.BLOCK_SIZE:(b + 1) * seg.BLOCK_SIZE]
            assert blk.max() <= tp.block_max_impact[b] + 1e-6
            assert tp.block_last_doc[b] == tp.doc_ids[
                min((b + 1) * seg.BLOCK_SIZE, len(tp.doc_ids)) - 1]


def test_search_batch_matches_per_query(index_dir, ray_session):
    from search_engine_ray.pipelines.search import SearchEngine

    out, _, _ = index_dir
    eng = SearchEngine(out, num_searchers=2)
    try:
        queries = ["running", "children & data", "word1 | word2",
                   '"some phrase"', "~nosuchwordatall", ""]
        batched = eng.search_batch(queries, k=10)
        for q, bt in zip(queries, batched):
            assert bt.equals(eng.search(q, k=10)), q
    finally:
        eng.close()


def test_frontend_pool_matches_engine(index_dir, ray_session):
    """FrontendPool (N coordinator actors over the shared searcher
    pool) returns exactly what the driver-side engine returns, in
    input order."""
    from search_engine_ray.pipelines.search import (FrontendPool,
                                                    SearchEngine)

    out, _, _ = index_dir
    eng = SearchEngine(out, num_searchers=2)
    fp = FrontendPool(out, eng.actors, n_frontends=3)
    try:
        queries = ["running", "children & data", "word1 | word2",
                   '"some phrase"', "~nosuchwordatall", ""] * 3
        got = fp.search_stream(queries, k=10, chunk=2)
        assert len(got) == len(queries)
        for q, t in zip(queries, got):
            assert t.equals(eng.search(q, k=10)), q
    finally:
        fp.close()
        eng.close()
        # shared pool must survive a frontend close: closing the engine
        # after the pool killed its frontends still worked above


def test_row_group_cache_is_lru():
    """_cell's bounded cache must evict least-recently-USED (move-to-end
    on hit), not insertion order: touch key 0 after filling, insert one
    more, and key 0 must survive while key 1 is evicted."""
    import types

    import pyarrow as pa

    from search_engine_ray.pipelines import search as S

    reads = []

    class FakePF:
        def read_row_group(self, g, columns=None, use_threads=False):
            reads.append(g)
            return pa.table({columns[0]: pa.array([f"v{g}"])})

    obj = types.SimpleNamespace(_rg_cache={})
    pf = FakePF()
    starts = __import__("numpy").arange(0, 300)  # 1 row per group
    cell = lambda i: S.ShardIndex._cell(obj, pf, starts, None, i, "c")
    for i in range(256):       # fill to capacity
        cell(i)
    assert cell(0) == "v0" and reads.count(0) == 1  # hit, moved to end
    cell(256)                  # evicts LRU = group 1, NOT group 0
    assert (id(pf), 0, "c") in obj._rg_cache
    assert (id(pf), 1, "c") not in obj._rg_cache
    assert cell(0) == "v0" and reads.count(0) == 1  # still cached
