"""Two-hop term→shard directory: exact routing (a rare term RPCs only
the actors owning its shards; an absent term RPCs nobody), results
pinned identical to the Bloom-pruned and unpruned fan-outs, and the
stale-directory guard."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq


def _build(tmp_path, docs_per_shard=64):
    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.sources.fixtures import gen_pages

    pages_path = str(tmp_path / "pages")
    os.makedirs(pages_path)
    pq.write_table(gen_pages(400), os.path.join(pages_path, "p.parquet"))

    def factory(columns):
        return rd.read_parquet(pages_path, columns=columns)

    out = str(tmp_path / "index")
    build_index(factory, out, docs_per_shard=docs_per_shard)
    return out


def test_directory_exact_routing_and_identical_results(ray_session,
                                                       tmp_path):
    import search_engine_ray.query.compile as qc
    from search_engine_ray.pipelines.search import SearchEngine
    from search_engine_ray.state.term_directory import (
        build_term_directory, read_meta)

    out = _build(tmp_path)
    build_term_directory(out, n_buckets=8)
    assert read_meta(out)["n_buckets"] == 8

    eng = SearchEngine(out, num_searchers=4)
    assert eng._dir_pool is not None, "engine must adopt the directory"
    try:
        # ground truth shard set per term, straight from the segments
        def shards_of(term: str) -> set[int]:
            hit = set()
            for sh_dir in os.listdir(os.path.join(out, "segments")):
                t = pq.read_table(
                    os.path.join(out, "segments", sh_dir),
                    columns=["term"])
                if term in set(t.column("term").to_pylist()):
                    hit.add(int(sh_dir.split("=")[1]))
            return hit

        seg0 = pq.read_table(os.path.join(out, "segments", "shard=0"),
                             columns=["term"]).column("term").to_pylist()
        rare = min(seg0, key=lambda t: len(shards_of(t)))
        want = shards_of(rare)
        assert len(want) < 4, "fixture should have a shard-local term"

        # exact fan-out: ONLY the actors owning the term's shards
        plan = qc.Word(rare, rare)
        live = eng._actor_mask(plan)
        expect = [a for a, sh in zip(eng.actors, eng._actor_shards)
                  if set(sh) & want]
        assert [id(a) for a in live] == [id(a) for a in expect]
        assert len(live) <= len(want)

        # provably-absent term: zero RPCs, empty result
        absent_plan = qc.Word("zzabsent9", "zzabsent9")
        assert eng._actor_mask(absent_plan) == []
        assert eng.search("zzabsent9").num_rows == 0

        # directory-routed results identical to bloom-pruned and to the
        # unpruned fan-out across plan shapes
        queries = [rare, f"{rare} | word1", f"{rare} & word2",
                   "running & children", ""]
        for q in queries:
            routed = eng.search(q, k=10)
            pool, eng._dir_pool = eng._dir_pool, None
            try:
                bloomed = eng.search(q, k=10)
                blooms, eng._blooms = eng._blooms, {}
                try:
                    full = eng.search(q, k=10)
                finally:
                    eng._blooms = blooms
            finally:
                eng._dir_pool = pool
            assert routed.equals(bloomed), q
            assert routed.equals(full), q
    finally:
        eng.close()


def test_stale_directory_is_ignored(ray_session, tmp_path):
    import json

    from search_engine_ray.pipelines.search import SearchEngine
    from search_engine_ray.state.term_directory import (
        build_term_directory, directory_matches)
    from search_engine_ray.state import segments as seg

    out = _build(tmp_path)
    build_term_directory(out, n_buckets=4)
    man = seg.read_manifest(out)
    assert directory_matches(out, man["stats"]) is not None

    # simulate an append generation: manifest gains shards the
    # directory has never seen — exactness would break, so the engine
    # must fall back to blooms
    meta_path = os.path.join(out, "term_dir", "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["num_shards"] -= 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    assert directory_matches(out, man["stats"]) is None
    eng = SearchEngine(out, num_searchers=2)
    try:
        assert eng._dir_pool is None
        assert eng._blooms  # bloom pruning still active
    finally:
        eng.close()


def test_frontend_pool_shares_directory(ray_session, tmp_path):
    """FrontendPool with a shared DirectoryPool: routed results through
    frontend actors identical to the driver-side engine."""
    from search_engine_ray.pipelines.search import (FrontendPool,
                                                    SearchEngine)
    from search_engine_ray.state.term_directory import (DirectoryPool,
                                                        build_term_directory,
                                                        read_meta)

    out = _build(tmp_path)
    build_term_directory(out, n_buckets=4)
    eng = SearchEngine(out, num_searchers=2, use_directory=False)
    pool = DirectoryPool(out, read_meta(out)["n_buckets"], n_actors=2)
    fp = FrontendPool(out, eng.actors, n_frontends=2,
                      actor_shards=eng._actor_shards, dir_pool=pool)
    try:
        queries = ["running", "running & children", "zzabsent9", ""]
        got = fp.search_stream(queries, k=10, chunk=1)
        for q, t in zip(queries, got):
            assert t.equals(eng.search(q, k=10)), q
    finally:
        fp.close()
        pool.close()
        eng.close()
