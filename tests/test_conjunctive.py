"""Block-lazy conjunctive skipping: AND-of-words top-k identical to the
generic (full-decode) path, and the frequent term's posting list is never
fully decoded (only the candidate blocks are)."""

from __future__ import annotations

import numpy as np
import pytest

from search_engine_ray.query import compile as qc
from search_engine_ray.state import segments as seg


@pytest.fixture(scope="module")
def shard_setup(ray_session, tmp_path_factory):
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.search import ShardIndex
    from search_engine_ray.sources.fixtures import gen_pages

    root = tmp_path_factory.mktemp("conj")
    pages_path = str(root / "pages")
    os.makedirs(pages_path)
    pq.write_table(gen_pages(600), os.path.join(pages_path, "p.parquet"))

    def factory(columns):
        return rd.read_parquet(pages_path, columns=columns)

    out = str(root / "index")
    man = build_index(factory, out, docs_per_shard=600)
    return out, man


def _and_plan(terms):
    # vocab terms are already stems — pass stem_ explicitly so the plan
    # probes the exact index vocabulary
    plan = qc.Word(terms[0], terms[0])
    for t in terms[1:]:
        plan = qc.And(plan, qc.Word(t, t))
    return plan


def _df_sorted_vocab(sh):
    import pyarrow.parquet as pq  # noqa: F401
    terms = sh._table.column("term").to_pylist()
    dfs = sh._table.column("df").to_pylist()
    return sorted(zip(terms, dfs), key=lambda x: -x[1])


def test_conjunctive_matches_generic(shard_setup):
    from search_engine_ray.pipelines.search import (ShardIndex,
                                                    flatten_terms)

    out, man = shard_setup
    avgdl = man["stats"]["avgdl"]
    sh_skip = ShardIndex(out, 0)
    sh_skip.CONJ_MIN_DF = 1  # fixture corpus is small — exercise skipping
    sh_skip.CONJ_BLOCK_COST = 0
    sh_gen = ShardIndex(out, 0)
    sh_gen._has_block_offs = False  # force the generic path
    vocab = _df_sorted_vocab(sh_skip)
    rng = np.random.default_rng(11)
    idf_stub = {t: 1.0 + (hash(t) % 97) / 50.0 for t, _ in vocab}
    checked = 0
    for trial in range(25):
        n = int(rng.integers(2, 5))
        # mix: one frequent head term + rare tail terms (the skew case)
        picks = [vocab[int(rng.integers(0, 5))][0]] + [
            vocab[int(rng.integers(len(vocab) // 2, len(vocab)))][0]
            for _ in range(n - 1)]
        plan = _and_plan(picks)
        idf = {t: idf_stub[t] for t, _ in flatten_terms(plan)}
        got = sh_skip.score_topk(plan, 10, idf, avgdl)
        want = sh_gen.score_topk(plan, 10, idf, avgdl)
        assert [(d, round(s, 12)) for s, d, _, _ in got] == \
               [(d, round(s, 12)) for s, d, _, _ in want], picks
        checked += 1
    assert checked == 25


def test_conjunctive_skips_decoding(shard_setup):
    from search_engine_ray.pipelines.search import ShardIndex

    out, man = shard_setup
    avgdl = man["stats"]["avgdl"]
    sh = ShardIndex(out, 0)
    sh.CONJ_MIN_DF = 1
    sh.CONJ_BLOCK_COST = 0
    vocab = _df_sorted_vocab(sh)
    freq_term, freq_df = vocab[0]
    # a rare term co-occurring with the frequent one (same corpus)
    rare_term = next(t for t, d in reversed(vocab) if d >= 1)
    assert freq_df >= 4 * 1
    plan = _and_plan([freq_term, rare_term])
    idf = {freq_term: 1.1, rare_term: 2.3}
    res = sh.score_topk(plan, 10, idf, avgdl)
    # the frequent term must have gone through the lazy path: never
    # fully decoded (not in the eager cache), and only a bounded number
    # of its blocks touched
    assert freq_term not in sh._cache
    lz = sh._lazy[freq_term]
    rare_df = dict(vocab)[rare_term]
    assert lz.blocks_decoded <= min(lz.nblocks, rare_df)
    # sanity: result still matches the generic path
    sh2 = ShardIndex(out, 0)
    sh2._has_block_offs = False
    want = sh2.score_topk(plan, 10, idf, avgdl)
    assert [(d, s) for s, d, _, _ in res] == [(d, s)
                                              for s, d, _, _ in want]


def test_lazy_postings_block_decode_equals_eager(shard_setup):
    """LazyPostings.block_docs/tfs reassemble exactly the eager decode,
    block by block, for every term in the shard."""
    from search_engine_ray.pipelines.search import ShardIndex

    out, _ = shard_setup
    sh = ShardIndex(out, 0)
    for term in sh.vocab()[:200]:
        tp = sh.lookup(term)
        lz = sh.lookup_lazy(term)
        docs = np.concatenate([lz.block_docs(b)
                               for b in range(lz.nblocks)])
        tfs = np.concatenate([lz.block_tfs(b)
                              for b in range(lz.nblocks)])
        np.testing.assert_array_equal(docs, tp.doc_ids)
        np.testing.assert_array_equal(tfs, tp.tfs)


def test_gather_random_subsets(shard_setup):
    from search_engine_ray.pipelines.search import ShardIndex

    out, _ = shard_setup
    sh = ShardIndex(out, 0)
    rng = np.random.default_rng(3)
    all_docs = sh.doc_ids
    for term in sh.vocab()[:40]:
        tp = sh.lookup(term)
        lz = sh.lookup_lazy(term)
        cand = np.unique(rng.choice(all_docs,
                                    size=min(50, len(all_docs)),
                                    replace=False))
        hit, tfs = lz.gather(cand)
        expect_pos = np.searchsorted(tp.doc_ids,
                                     np.clip(cand, tp.doc_ids.min(),
                                             tp.doc_ids.max()))
        np.clip(expect_pos, 0, len(tp.doc_ids) - 1, out=expect_pos)
        expect_hit = tp.doc_ids[expect_pos] == cand
        np.testing.assert_array_equal(hit, expect_hit)
        np.testing.assert_array_equal(
            tfs, tp.tfs[expect_pos[expect_hit]])


def test_phrase_lazy_matches_eager(shard_setup):
    """The block-lazy phrase path returns exactly the eager path's doc
    set, across random vocab bigrams/trigrams (incl. empty results)."""
    from search_engine_ray.pipelines.search import ShardIndex

    out, man = shard_setup
    sh_lazy = ShardIndex(out, 0)
    sh_lazy.CONJ_MIN_DF = 1
    sh_lazy.CONJ_BLOCK_COST = 0
    sh_eager = ShardIndex(out, 0)
    sh_eager._has_block_offs = False  # force the eager path
    vocab = [t for t, _ in _df_sorted_vocab(sh_lazy)]
    rng = np.random.default_rng(5)
    # real adjacent bigrams/trigrams, reconstructed from one document's
    # position lists (guaranteed non-empty phrase results)
    doc0 = int(sh_eager.lookup(vocab[0]).doc_ids[0])
    seq: dict[int, str] = {}
    for t in vocab:
        tp = sh_eager.lookup(t)
        j = int(np.searchsorted(tp.doc_ids, doc0))
        if j < len(tp.doc_ids) and tp.doc_ids[j] == doc0:
            for p in tp.positions_for(j):
                seq[int(p)] = t
    real = []
    for p, t in sorted(seq.items()):
        if p + 1 in seq:
            real.append([t, seq[p + 1]])
        if p + 1 in seq and p + 2 in seq:
            real.append([t, seq[p + 1], seq[p + 2]])
    assert real, "fixture doc yielded no adjacent pairs"
    trials = real[:20]
    for trial in range(60):
        n = int(rng.integers(2, 4))
        trials.append([vocab[int(rng.integers(0, len(vocab)))]
                       for _ in range(n)])
    nonempty = 0
    for picks in trials:
        got = sh_lazy._eval_phrase_uncached(picks)
        want = sh_eager._eval_phrase_uncached(picks)
        np.testing.assert_array_equal(got, want, err_msg=str(picks))
        nonempty += bool(len(want))
    assert nonempty >= 1  # the comparison exercised real matches


def test_phrase_lazy_skips_decoding(shard_setup):
    """A rare-seeded phrase never puts the frequent term in the eager
    cache and touches a bounded number of its blocks."""
    from search_engine_ray.pipelines.search import ShardIndex

    out, _ = shard_setup
    sh = ShardIndex(out, 0)
    sh.CONJ_MIN_DF = 1
    sh.CONJ_BLOCK_COST = 0
    vocab = _df_sorted_vocab(sh)
    freq_term = vocab[0][0]
    rare_term = next(t for t, d in reversed(vocab) if d >= 1)
    sh._eval_phrase_uncached([freq_term, rare_term])
    assert freq_term not in sh._cache
    lz = sh._lazy[freq_term]
    rare_df = dict(vocab)[rare_term]
    assert lz.blocks_decoded <= min(lz.nblocks, rare_df)


def test_wand_lazy_decodes_bounded_blocks(shard_setup):
    """With a seek table, WAND runs over LazyPostings and decodes only
    the visited intervals' blocks — a pruned frequent term is never
    eagerly decoded; results stay identical to the eager-decode path."""
    from search_engine_ray.pipelines.search import ShardIndex

    out, man = shard_setup
    avgdl = man["stats"]["avgdl"]
    s = ShardIndex(out, 0)
    assert s._has_block_offs
    dfs = _df_sorted_vocab(s)
    terms = [(t, 1.0 + i * 0.3) for i, (t, _) in enumerate(dfs[:3])]
    got = s.wand_topk(terms, 10, avgdl)
    s2 = ShardIndex(out, 0)
    s2._has_block_offs = False  # force eager decode
    want = s2.wand_topk(terms, 10, avgdl)
    assert got == want
    # the eager posting cache stays untouched on the lazy instance
    assert all(t not in s._cache for t, _ in terms)
    for t, _ in terms:
        lz = s._lazy[t]
        assert lz.blocks_decoded <= lz.nblocks
