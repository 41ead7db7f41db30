"""Per-shard vocab blooms + query fan-out pruning: no false negatives,
sane false-positive rate, and pruned search results identical to the
unpruned fan-out."""

from __future__ import annotations

import numpy as np

from search_engine_ray.state import bloom


def test_bloom_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(9)
    vocab = [f"term{i:05d}" for i in range(5000)]
    blob = bloom.build(vocab)
    assert bloom.contains(blob, vocab).all()  # zero false negatives
    probes = [f"absent{i:06d}" for i in range(20000)]
    fp = bloom.contains(blob, probes).mean()
    assert fp < 0.05, fp  # k=2, 16 bits/term → ~1.4% expected
    assert len(blob) - 16 == 16384  # 2^17 bits for 5000 terms


def test_bloom_empty_vocab():
    blob = bloom.build([])
    assert not bloom.contains_any(blob, ["anything"])
    assert not bloom.contains_any(blob, [])


def test_engine_prunes_and_matches_unpruned(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.search import SearchEngine
    from search_engine_ray.sources.fixtures import gen_pages

    pages_path = str(tmp_path / "pages")
    os.makedirs(pages_path)
    pq.write_table(gen_pages(400), os.path.join(pages_path, "p.parquet"))

    def factory(columns):
        return rd.read_parquet(pages_path, columns=columns)

    out = str(tmp_path / "index")
    build_index(factory, out, docs_per_shard=64)  # many shards

    eng = SearchEngine(out, num_searchers=4)
    assert eng._blooms, "merge must have written vocab blooms"
    try:
        # a term that exists in few shards: take any shard's segment
        # vocab and find one absent from most other blooms
        seg0 = pq.read_table(os.path.join(out, "segments", "shard=0"),
                             columns=["term"])
        cand_terms = seg0.column("term").to_pylist()
        import search_engine_ray.query.compile as qc
        rare = None
        for t in cand_terms:
            n_hit = sum(bool(bloom.contains_any(b, [t]))
                        for b in eng._blooms.values())
            if n_hit <= len(eng._blooms) // 2:
                rare = t
                break
        assert rare is not None, "fixture has no shard-local term"
        plan = qc.Word(rare, rare)
        live = eng._actor_mask(plan)
        assert live is not None and len(live) < len(eng.actors)
        # pruned vs unpruned: identical results across query shapes,
        # for BOTH the interactive and the batch path
        queries = [rare, f"{rare} | word1", f"{rare} & word2",
                   "absentterm12345", ""]
        batched = eng.search_batch(queries, k=10)
        for q, bt in zip(queries, batched):
            pruned = eng.search(q, k=10)
            assert bt.equals(pruned), q
            blooms, eng._blooms = eng._blooms, {}
            try:
                full = eng.search(q, k=10)
                full_b = eng.search_batch([q], k=10)[0]
            finally:
                eng._blooms = blooms
            assert pruned.equals(full), q
            assert bt.equals(full_b), q
        # provably-absent term: zero RPCs (empty actor list), empty result
        none_plan = qc.Word("qqzzabsent", "qqzzabsent")
        assert eng._actor_mask(none_plan) == [] or \
            len(eng._actor_mask(none_plan)) <= 2  # bloom fp tolerance
    finally:
        eng.close()
