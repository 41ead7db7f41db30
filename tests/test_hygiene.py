"""Corpus-hygiene gates: planted-contamination recall/precision for
decontaminate, planted-cluster correctness for dedup_clusters, and a
DuckDB cross-check of both oracles on the planted table (the sf-dir
oracle ride-along lives in tests/test_oracles.py)."""

from __future__ import annotations

import os
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(d, ids, texts):
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["s"] * len(ids), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def contam_sf_dir(tmp_path_factory):
    """Held-out docs are doc_id % 97 == 0 (ids 0, 97, 194). Planted:
    - doc 1 copies a 5-token span from holdout doc 0  → contaminated
    - doc 2 copies 4 tokens of that span, then diverges → clean
    - doc 3 is the first 3 tokens of holdout doc 97 (< 5 tokens, no
      window) → clean
    - remaining docs are random filler over a disjoint vocabulary."""
    rng = random.Random(7)
    hold0 = [f"bench{i}" for i in range(40)]
    hold97 = [f"eval{i}" for i in range(30)]
    span = hold0[10:15]
    ids = [0, 97, 1, 2, 3]
    texts = [
        " ".join(hold0),
        " ".join(hold97),
        "filler one two " + " ".join(span) + " tail tokens here",
        "filler three four " + " ".join(span[:4]) + " divergent tail",
        " ".join(hold97[:3]),
    ]
    vocab = [f"tok{i}" for i in range(500)]
    for i in range(4, 60):
        ids.append(i)
        texts.append(" ".join(rng.choice(vocab) for _ in range(30)))
    return _write_docs(tmp_path_factory.mktemp("contam"), ids, texts)


def test_decontaminate_planted(ray_session, contam_sf_dir):
    from search_engine_ray.functions.hygiene import decontaminate

    out = decontaminate(contam_sf_dir).to_pandas()
    flags = dict(zip(out["doc_id"], out["contaminated"]))
    assert 0 not in flags and 97 not in flags  # holdout excluded
    assert flags[1] == 1          # shares a full 5-gram
    assert flags[2] == 0          # only a 4-token prefix
    assert flags[3] == 0          # < 5 tokens: no window
    assert sum(flags.values()) == 1  # no false positives in the filler


def test_decontaminate_oracle_planted(ray_session, contam_sf_dir):
    from search_engine_ray.functions.hygiene import decontaminate
    from search_engine_ray.functions.sql_hash import decontaminate_sql

    out = (decontaminate(contam_sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{contam_sf_dir}/documents.parquet')")
    o = con.execute(decontaminate_sql()).df()
    assert out["doc_id"].tolist() == o["doc_id"].tolist()
    assert out["contaminated"].tolist() == o["contaminated"].tolist()


@pytest.fixture(scope="module")
def cluster_sf_dir(tmp_path_factory):
    """Planted duplicate CHAIN a-b-c where a~b and b~c are near-dups but
    a and c differ enough that they only join through b — the case a
    pairwise-only dedup misses and connected components must catch."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(3000)]
    base = [rng.choice(vocab) for _ in range(100)]
    mid = list(base)
    for i in range(4):
        mid[i * 24] = rng.choice(vocab)
    far = list(mid)
    for i in range(4):
        far[i * 24 + 11] = rng.choice(vocab)
    ids = [10, 11, 12]
    texts = [" ".join(base), " ".join(mid), " ".join(far)]
    # an exact-duplicate pair
    dup = " ".join(rng.choice(vocab) for _ in range(60))
    ids += [20, 21]
    texts += [dup, dup]
    # singletons
    for i in range(30, 60):
        ids.append(i)
        texts.append(" ".join(rng.choice(vocab) for _ in range(50)))
    return _write_docs(tmp_path_factory.mktemp("clusters"), ids, texts)


def test_dedup_clusters_planted(ray_session, cluster_sf_dir):
    from search_engine_ray.functions.dedup import minhash_dedup
    from search_engine_ray.functions.hygiene import dedup_clusters

    # transitivity is genuinely exercised: 10-12 must not be a direct
    # verified pair, only reachable through 11
    pairs = minhash_dedup(cluster_sf_dir)
    pset = set(zip(pairs.column("doc_a").to_pylist(),
                   pairs.column("doc_b").to_pylist()))
    assert (10, 11) in pset and (11, 12) in pset
    assert (10, 12) not in pset

    out = dedup_clusters(cluster_sf_dir).to_pandas()
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    keep = dict(zip(out["doc_id"], out["keep"]))
    # the chain collapses to one cluster labeled by its min member
    assert lab[10] == lab[11] == lab[12] == 10
    assert keep[10] == 1 and keep[11] == 0 and keep[12] == 0
    assert lab[20] == lab[21] == 20
    # singletons keep themselves
    for i in range(30, 60):
        assert lab[i] == i and keep[i] == 1
    # post-dedup corpus = one representative per cluster
    assert int(out["keep"].sum()) == len(out) - 3


def test_connected_components_empty_pairs(ray_session, cluster_sf_dir):
    import ray.data as rd

    from search_engine_ray.functions.hygiene import connected_components
    from search_engine_ray.pipelines.datasets import read_table

    pairs = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    nodes = read_table(cluster_sf_dir, "documents", columns=["doc_id"])
    out = connected_components(pairs, nodes).to_pandas()
    assert (out["doc_id"] == out["cluster_id"]).all()
    assert (out["keep"] == 1).all()
    assert isinstance(rd.from_arrow(pairs), rd.Dataset)  # sanity


def test_dedup_clusters_oracle_planted(ray_session, cluster_sf_dir):
    from search_engine_ray.functions.hygiene import dedup_clusters
    from search_engine_ray.functions.sql_hash import dedup_clusters_sql

    out = (dedup_clusters(cluster_sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{cluster_sf_dir}/documents.parquet')")
    o = con.execute(dedup_clusters_sql()).df()
    for c in ("doc_id", "cluster_id", "keep"):
        assert out[c].tolist() == o[c].tolist()


def test_corpus_prep_nondefault_args_match_oracle(ray_session):
    """k/holdout_mod plumb through BOTH sides of the composed pipeline."""
    import duckdb

    from search_engine_ray.functions.hygiene import (corpus_prep,
                                                     corpus_prep_sql)

    sf = "/root/testdata/sf0.001"
    mine = corpus_prep(sf, min_quality_bp=4400, k=4,
                       holdout_mod=50).to_pandas()
    mine = mine.sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    ora = con.execute(corpus_prep_sql(min_quality_bp=4400, k=4,
                                      holdout_mod=50)).fetchdf()
    assert len(mine) == len(ora) > 0
    for c in ("doc_id", "n_tokens", "quality_bp"):
        assert (mine[c].astype("int64").values
                == ora[c].astype("int64").values).all(), c
