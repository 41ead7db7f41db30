"""Block-max WAND correctness: top-k identical to exhaustive BM25 over
every shard, on real fixture segments and on randomized term sets."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_ray.state import segments as seg


@pytest.fixture(scope="module")
def shard_indexes(ray_session, tmp_path_factory):
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.search import ShardIndex
    from search_engine_ray.sources.fixtures import gen_pages

    root = tmp_path_factory.mktemp("wand")
    pages_path = str(root / "pages")
    os.makedirs(pages_path)
    pq.write_table(gen_pages(400), os.path.join(pages_path, "p.parquet"))

    def factory(columns):
        return rd.read_parquet(pages_path, columns=columns)

    out = str(root / "index")
    man = build_index(factory, out, docs_per_shard=96)
    shards = [ShardIndex(out, s) for s in range(man["stats"]["num_shards"])]
    return shards, man["stats"]["avgdl"]


def exhaustive_topk(shard, weighted_terms, k, avgdl):
    """Reference: score every doc containing any term, sort."""
    scores: dict[int, float] = {}
    for term, w in weighted_terms:
        tp = shard.lookup(term)
        if tp is None or w <= 0:
            continue
        dls = shard.doc_dl(tp.doc_ids)
        imps = seg.bm25_impact(tp.tfs, dls, avgdl)
        for d, imp in zip(tp.doc_ids, imps):
            scores[int(d)] = scores.get(int(d), 0.0) + w * float(imp)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


@pytest.mark.parametrize("terms", [
    [("run", 1.7)],
    [("run", 1.7), ("child", 2.1)],
    [("word1", 1.0), ("word2", 1.1), ("word3", 0.9), ("data", 2.0)],
    [("@run", 1.2), ("run", 1.7), ("inform", 0.4)],
    [("nonexistentterm", 1.0)],
])
def test_wand_equals_exhaustive(shard_indexes, terms):
    shards, avgdl = shard_indexes
    checked = 0
    for shard in shards:
        for k in (3, 10):
            got = shard.wand_topk(terms, k, avgdl)
            expect = exhaustive_topk(shard, terms, k, avgdl)
            assert [d for _, d in got] == [d for d, _ in expect], (k, terms)
            for (gs, _), (_, es) in zip(got, expect):
                assert abs(gs - es) < 1e-9
            checked += 1
    assert checked


def test_wand_randomized(shard_indexes):
    rng = np.random.default_rng(7)
    shards, avgdl = shard_indexes
    # pull a real vocabulary sample from the first shard
    vocab = shards[0].vocab()
    for trial in range(15):
        n_terms = int(rng.integers(1, 6))
        terms = [(vocab[int(rng.integers(0, len(vocab)))],
                  float(rng.uniform(0.1, 3.0))) for _ in range(n_terms)]
        shard = shards[int(rng.integers(0, len(shards)))]
        k = int(rng.integers(1, 15))
        got = shard.wand_topk(terms, k, avgdl)
        expect = exhaustive_topk(shard, terms, k, avgdl)
        assert [d for _, d in got] == [d for d, _ in expect], (terms, k)


@pytest.fixture(scope="module")
def tied_shards(ray_session, tmp_path_factory):
    """An index of IDENTICAL documents (distinct urls): every doc scores
    exactly the same, so the k-th boundary is all ties."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.search import ShardIndex

    root = tmp_path_factory.mktemp("ties")
    pages_path = str(root / "pages")
    os.makedirs(pages_path)
    html = (b"<html><head><title>tie page</title></head>"
            b"<body>alpha beta gamma alpha</body></html>")
    pq.write_table(pa.table({
        "url": pa.array([f"http://tie{i}.com/" for i in range(60)]),
        "html": pa.array([html] * 60, pa.binary()),
    }), os.path.join(pages_path, "p.parquet"))

    def factory(columns):
        return rd.read_parquet(pages_path, columns=columns)

    out = str(root / "index")
    man = build_index(factory, out, docs_per_shard=30)
    shards = [ShardIndex(out, s) for s in range(man["stats"]["num_shards"])]
    return shards, man["stats"]["avgdl"]


def test_tied_topk_wand_equals_exhaustive(tied_shards):
    """ADVICE r1: tied scores at the k-th boundary must resolve to the
    same docs (smallest doc_id wins) on BOTH scoring paths."""
    from search_engine_ray.query.compile import Word

    terms = [("alpha", 1.3)]
    for shard, avgdl in [(s, tied_shards[1]) for s in tied_shards[0]]:
        tp = shard.lookup("alpha")
        if tp is None or len(tp.doc_ids) < 5:
            continue
        k = max(2, len(tp.doc_ids) // 2)
        got_wand = shard.wand_topk(terms, k, avgdl)
        expect = exhaustive_topk(shard, terms, k, avgdl)
        assert [d for _, d in got_wand] == [d for d, _ in expect]
        # the winners are exactly the k smallest doc_ids (scores all tie)
        assert [d for _, d in got_wand] == sorted(
            int(d) for d in tp.doc_ids)[:k]
        # exhaustive engine path (score_topk without WAND) agrees too
        idf = {"alpha": 1.3}
        plan = Word("alpha")
        shard.wand_ok = False
        try:
            got_exh = shard.score_topk(plan, k, idf, avgdl)
        finally:
            shard.wand_ok = True
        # score_topk outputs REAL doc ids; wand_topk speaks ordinals
        assert [d for _, d, _, _ in got_exh] == \
            [int(shard.doc_ids[d]) for _, d in got_wand]


def test_exhaustive_topk_method_matches(shard_indexes):
    """ShardIndex.exhaustive_topk (the bench baseline) must agree with
    both the dict-based reference and wand_topk."""
    shards, avgdl = shard_indexes
    terms = [("run", 1.7), ("child", 2.1), ("data", 1.1)]
    for shard in shards:
        got = shard.exhaustive_topk(terms, 10, avgdl)
        expect = exhaustive_topk(shard, terms, 10, avgdl)
        assert [d for _, d in got] == [d for d, _ in expect]
        wand = shard.wand_topk(terms, 10, avgdl)
        assert [d for _, d in wand] == [d for _, d in got]

