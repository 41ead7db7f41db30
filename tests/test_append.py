"""Incremental append: add a second generation of pages to a built index
without touching existing shards; search correctness over the union corpus
(brute-force cross-check); WAND re-enabled after refresh_block_max."""

from __future__ import annotations

import math
import os

import pyarrow.parquet as pq
import pytest

from search_engine_ray.kernels.textutils import fnv1a_64
from search_engine_ray.sources.fixtures import gen_pages
from search_engine_ray.state import segments as seg
from tests.test_build_search import brute_force_docs


@pytest.fixture(scope="module")
def appended(ray_session, tmp_path_factory):
    import ray.data as rd

    from search_engine_ray.pipelines.append import append_to_index
    from search_engine_ray.pipelines.build import build_index

    root = tmp_path_factory.mktemp("append")
    base_pages = str(root / "base")
    new_pages = str(root / "new")
    os.makedirs(base_pages)
    os.makedirs(new_pages)
    import pyarrow as pa

    t1 = gen_pages(200, seed=42)
    # second corpus overlaps the first (seed 42 prefix) → dedup must drop;
    # it also contains duplicate urls WITHIN itself (ADVICE r1: append
    # must apply the same within-batch url dedup as the base build)
    fresh = gen_pages(300, seed=42).slice(150, 150)
    t2 = pa.concat_tables([fresh, fresh.slice(0, 30)])
    pq.write_table(t1, os.path.join(base_pages, "p.parquet"))
    pq.write_table(t2, os.path.join(new_pages, "p.parquet"))

    def f1(columns):
        return rd.read_parquet(base_pages, columns=columns)

    def f2(columns):
        return rd.read_parquet(new_pages, columns=columns)

    out = str(root / "index")
    build_index(f1, out, docs_per_shard=64)
    man0 = seg.read_manifest(out)
    mtimes = {}
    for s in range(man0["stats"]["num_shards"]):
        p = os.path.join(out, "segments", f"shard={s}", "segment.parquet")
        mtimes[s] = os.path.getmtime(p)
    man = append_to_index(f2, out, docs_per_shard=64)
    return out, man0, man, mtimes, base_pages, new_pages


def union_docs(base_pages, new_pages):
    docs = brute_force_docs(base_pages)
    for url, terms in brute_force_docs(new_pages).items():
        docs.setdefault(url, terms)
    return docs


def test_append_stats_and_untouched_shards(appended):
    out, man0, man, mtimes, base_pages, new_pages = appended
    docs = union_docs(base_pages, new_pages)
    assert man["stats"]["n_docs"] == len(docs)
    assert man["stats"]["num_shards"] > man0["stats"]["num_shards"]
    expect_avgdl = sum(len(t) for t in docs.values()) / len(docs)
    assert abs(man["stats"]["avgdl"] - expect_avgdl) < 1e-9
    # old shard files untouched
    for s, mt in mtimes.items():
        p = os.path.join(out, "segments", f"shard={s}", "segment.parquet")
        assert os.path.getmtime(p) == mt, f"shard {s} touched by append"


def test_append_df_and_search(appended, ray_session):
    from search_engine_ray.pipelines.search import SearchEngine

    out, man0, man, mtimes, base_pages, new_pages = appended
    docs = union_docs(base_pages, new_pages)
    df = {}
    for terms in docs.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    got = dict(zip(
        pq.read_table(os.path.join(out, "terms")).column("term").to_pylist(),
        pq.read_table(os.path.join(out, "terms")).column("df").to_pylist()))
    assert got == df

    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    eng = SearchEngine(out, num_searchers=2, use_synonyms=False)
    try:
        for query in ["running", "word1 | word2"]:
            res = eng.search(query, k=10)
            qterms = [t for t in
                      (s for s in query.replace("|", " ").split()) if t]
            from search_engine_ray.kernels.stemmer import stem
            qstems = [stem(t) for t in qterms if stem(t)]
            scores = {}
            for url, terms in docs.items():
                s_val = 0.0
                hit = False
                for t in qstems:
                    for key in ("@" + t, t):
                        tf = terms.count(key)
                        if tf:
                            hit = True
                            idf = math.log(1 + (n_docs - df[key] + 0.5)
                                           / (df[key] + 0.5))
                            s_val += idf * (tf / (tf + seg.K1 * (
                                1 - seg.B + seg.B * len(terms) / avgdl)))
                if hit:
                    scores[url] = s_val
            expect = sorted(scores.items(),
                            key=lambda kv: (-kv[1],
                                            fnv1a_64(kv[0].encode()) >> 1))
            got_urls = res.column("url").to_pylist()
            assert got_urls == [u for u, _ in expect[:len(got_urls)]], query
    finally:
        eng.close()


def test_refresh_block_max_reenables_wand(appended, ray_session):
    from search_engine_ray.pipelines.append import refresh_block_max
    from search_engine_ray.pipelines.search import SearchEngine

    out, man0, man, mtimes, base_pages, new_pages = appended
    stale = man["stats"]["wand_stale_shards"]
    assert stale, "append must leave old shards' bounds stale"

    eng = SearchEngine(out, num_searchers=2, use_synonyms=False)
    before = eng.search("running | children", k=10)
    eng.close()

    n = refresh_block_max(out)
    assert n == len(stale)
    man2 = seg.read_manifest(out)
    assert man2["stats"]["wand_stale_shards"] == []

    eng = SearchEngine(out, num_searchers=2, use_synonyms=False)
    after = eng.search("running | children", k=10)
    eng.close()
    assert before.column("url").to_pylist() == after.column("url").to_pylist()
    assert before.column("score").to_pylist() == \
        after.column("score").to_pylist()
