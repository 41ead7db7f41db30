"""PageRank on a known tiny graph + the top_terms exactness guard."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_pagerank_known_graph(ray_session):
    """Absorbing star: b,c → a and a → a. Mass accumulates monotonically
    at `a`; b and c keep only the base rank (tie broken by url)."""
    import ray.data as rd

    from search_engine_ray.functions.links import pagerank_from_edges

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["b", "c", "a"], pa.string()),
        "dst": pa.array(["a", "a", "a"], pa.string()),
    }))
    out = pagerank_from_edges(edges, n_iter=10, k=3)
    urls = out.column("url").to_pylist()
    ranks = out.column("rank_nano").to_pylist()
    assert urls == ["a", "b", "c"]
    assert ranks[0] > ranks[1] == ranks[2] > 0
    # total retained mass never exceeds 1.0 (dangling mass is dropped)
    assert sum(ranks) <= 1_000_000_000
    # determinism (integer arithmetic end to end)
    again = pagerank_from_edges(edges, n_iter=10, k=3)
    assert again.equals(out)


def test_top_terms_exactness_guard(ray_session, sf_dir):
    """capacity=1 cannot prove any top-25 exact on a real vocabulary —
    the operator must refuse rather than silently approximate."""
    from search_engine_ray.functions.sketches import top_terms

    with pytest.raises(ValueError, match="grow capacity"):
        top_terms(sf_dir, k=25, capacity=1)


def test_top_terms_matches_bruteforce(ray_session, sf_dir):
    import os
    from collections import Counter

    import pyarrow.parquet as pq

    from search_engine_ray.functions.sketches import top_terms

    got = top_terms(sf_dir, k=25)
    texts = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["text"]).column("text").to_pylist()
    c: Counter = Counter()
    for t in texts:
        c.update(t.strip().lower().split())
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert list(zip(got.column("term").to_pylist(),
                    got.column("n").to_pylist())) == expect
