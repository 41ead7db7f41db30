"""ANN: brute-force baseline vs the persisted bucket-partitioned LSH
index — recall, determinism, and actual sub-linear scan."""

from __future__ import annotations

import os

import pyarrow.parquet as pq


def test_lsh_matches_on_the_fly_and_recalls(ray_session, sf_dir):
    from search_engine_ray.functions.ann import ann_topk, ann_topk_lsh

    exact = ann_topk(sf_dir, k=10)
    lsh = ann_topk_lsh(sf_dir, k=10)
    # rank-1 is the query vector itself (cos=1) and must always survive
    assert lsh.column("vec_id")[0].as_py() == \
        exact.column("vec_id")[0].as_py()
    # bucket recall@10 vs exact
    overlap = set(lsh.column("vec_id").to_pylist()) & \
        set(exact.column("vec_id").to_pylist())
    assert len(overlap) >= 3, overlap
    # determinism (cached index path)
    again = ann_topk_lsh(sf_dir, k=10)
    assert again.equals(lsh)


def test_lsh_index_is_sublinear(ray_session, sf_dir):
    from search_engine_ray.functions.ann import (build_ann_lsh_index,
                                                 _lsh_keys, _lsh_planes,
                                                 _query_vector)

    index_dir = build_ann_lsh_index(sf_dir)
    total = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id"]).num_rows
    q = _query_vector(sf_dir, 0)
    planes = _lsh_planes(4, 8, len(q), 42)
    q_keys = set(_lsh_keys(q[None, :], planes)[0].tolist())
    scanned = 0
    for key in q_keys:
        p = os.path.join(index_dir, f"key={key}")
        if os.path.isdir(p):
            scanned += sum(
                pq.read_metadata(os.path.join(p, f)).num_rows
                for f in os.listdir(p) if f.endswith(".parquet"))
    # 4 tables × (≈1/256 of the corpus each) — far below a full scan
    assert 0 < scanned < total // 2, (scanned, total)


def test_ivf_recall_and_determinism(ray_session, sf_dir):
    from search_engine_ray.functions.ann import ann_topk, ann_topk_ivf

    exact = ann_topk(sf_dir, k=10)
    ivf = ann_topk_ivf(sf_dir, k=10)
    # the query vector itself always survives (its own centroid is probed)
    assert ivf.column("vec_id")[0].as_py() == \
        exact.column("vec_id")[0].as_py()
    overlap = set(ivf.column("vec_id").to_pylist()) & \
        set(exact.column("vec_id").to_pylist())
    assert len(overlap) >= 5, overlap
    assert ann_topk_ivf(sf_dir, k=10).equals(ivf)  # cached + deterministic


def test_ivfpq_recall_compression_determinism(ray_session, sf_dir):
    import os

    import pyarrow.parquet as pq

    from search_engine_ray.functions.ann import (ann_topk, ann_topk_ivfpq,
                                                 build_ann_ivfpq_index)

    exact = ann_topk(sf_dir, k=10)
    pq10 = ann_topk_ivfpq(sf_dir, k=10)
    e = set(exact.column("vec_id").to_pylist())
    overlap = e & set(pq10.column("vec_id").to_pylist())
    assert len(overlap) >= 9, overlap
    # widening the rerank pool recovers any ADC approximation loss
    wide = ann_topk_ivfpq(sf_dir, k=10, nprobe=16, rerank=200)
    assert len(e & set(wide.column("vec_id").to_pylist())) >= 9
    # cached index + deterministic query
    assert ann_topk_ivfpq(sf_dir, k=10).equals(pq10)
    # the ADC scan's columns are genuinely small: code columns together
    # must be far below the raw embedding column (the 100-TB story is
    # that the hot scan reads 8 uint8 columns, not the float vectors)
    idx = build_ann_ivfpq_index(sf_dir)
    code_bytes = emb_bytes = 0
    for cid_dir in os.listdir(idx):
        if not cid_dir.startswith("cid="):
            continue
        for f in os.listdir(os.path.join(idx, cid_dir)):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(idx, cid_dir, f))
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    sz = col.total_compressed_size
                    if col.path_in_schema.startswith("c"):
                        code_bytes += sz
                    elif col.path_in_schema.startswith("embedding"):
                        emb_bytes += sz
    assert code_bytes * 5 < emb_bytes, (code_bytes, emb_bytes)
