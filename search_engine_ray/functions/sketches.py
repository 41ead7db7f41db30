"""Sketch-guided exact heavy hitters over the documents table.

``top_terms``: per-batch Misra-Gries summaries find the candidate set,
then ONE exact recount pass restricted to the candidate set makes the
final counts exact, so the result hashes against a plain SQL GROUP BY
oracle.

Scale design (round-3): the per-batch summaries are MERGED DISTRIBUTED
via the mergeable-summaries property of Misra-Gries (Agarwal et al.,
"Mergeable Summaries", PODS'12): summing MG counters and subtracting the
(capacity+1)-th largest value yields an MG summary of the concatenated
stream with the same N/(capacity+1) error bound.  The merge is a Ray
``groupby(term).sum`` + distributed ``sort().limit(capacity+1)``, so the
driver sees at most capacity+1 candidate rows — NOT capacity x n_batches
as in the round-2 version.

Per-batch summaries are themselves exact batch counts truncated to
capacity (the tightest possible MG summary), computed with one
Arrow ``value_counts`` pass — no per-token Python loop.

Exactness guard: if no truncation happened at any level the candidate
set is the full vocabulary and the result is exact regardless of k.
Otherwise the top-k is provably exact iff the k-th count exceeds
N/(capacity+1); the operator raises with a "grow capacity" message
otherwise — no silent approximation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

from ..pipelines.datasets import read_table


def _mg_truncate(terms: np.ndarray, counts: np.ndarray, capacity: int
                 ) -> tuple[np.ndarray, np.ndarray, bool]:
    """Truncate exact (or merged-MG) counts to an MG summary of at most
    ``capacity`` counters. Returns (terms, counts, truncated?)."""
    if len(counts) <= capacity:
        return terms, counts, False
    order = np.argsort(-counts, kind="stable")
    thresh = int(counts[order[capacity]])
    keep = order[:capacity]
    kept = counts[keep] - thresh
    m = kept > 0
    return terms[keep][m], kept[m], True


def _batch_summary(b: pa.Table, capacity: int) -> pa.Table:
    from .textstats import _tokens_per_doc
    flat, _ = _tokens_per_doc(b.column("text"))
    n_tok = len(flat)
    vc = pc.value_counts(flat)
    terms = vc.field("values").to_numpy(zero_copy_only=False)
    counts = vc.field("counts").to_numpy(
        zero_copy_only=False).astype(np.int64)
    terms, cs, truncated = _mg_truncate(terms, counts, capacity)
    # Sentinel row carries the batch token count and truncation flag
    # independently of the summary size (an empty summary still counts).
    return pa.table({
        "term": pa.array(np.concatenate(
            [terms, np.array([""], object)]), pa.string()),
        "c": pa.array(np.concatenate(
            [cs, np.zeros(1, np.int64)]), pa.int64()),
        "n_tok": pa.array(np.concatenate(
            [np.zeros(len(cs), np.int64),
             np.array([n_tok], np.int64)]), pa.int64()),
        "trunc": pa.array(np.concatenate(
            [np.zeros(len(cs), np.int64),
             np.array([int(truncated)], np.int64)]), pa.int64()),
    })


def top_terms(sf_dir: str, k: int = 25, capacity: int = 512):
    """Exact global top-k terms by count, sketch-guided.
    Returns (term, n) sorted by n desc, term asc."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    parts = docs.map_batches(
        lambda b: _batch_summary(b, capacity), batch_format="pyarrow",
    ).materialize()

    total_n = int(parts.sum("n_tok") or 0)
    truncated_any = bool(parts.sum("trunc") or 0)

    # Distributed MG merge: groupby-sum then keep the top capacity+1
    # merged counters; candidates are those strictly above the
    # (capacity+1)-th value (the proper MG merge threshold).
    merged = (parts.filter(expr="c > 0")
              .groupby("term").aggregate(Sum("c", alias_name="c"))
              .sort("c", descending=True).limit(capacity + 1).to_pandas())
    if len(merged) > capacity:
        thresh = int(merged["c"].iloc[capacity])
        merged = merged[merged["c"] > thresh]
        truncated_any = True
    candidates = frozenset(merged["term"])
    # put the PREPARED Arrow array once: per-batch ray.get is a local
    # zero-copy read, no per-batch sort/convert of the candidate set
    cand_ref = ray.put(pa.array(sorted(candidates)))

    def recount(b: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        from .textstats import _tokens_per_doc
        flat, _ = _tokens_per_doc(b.column("text"))
        flat = flat.filter(pc.is_in(flat, value_set=cand))
        vc = pc.value_counts(flat)
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    counts = (docs.map_batches(recount, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts = counts.sort_values(["n", "term"],
                                ascending=[False, True]).head(k)
    if truncated_any:
        floor_bound = total_n // (capacity + 1)
        if len(counts) < k:
            raise ValueError(
                f"top-{k} not provably exact: only {len(counts)} candidates "
                f"survived the sketch; grow capacity")
        kth = int(counts["n"].iloc[-1])
        if kth <= floor_bound:
            raise ValueError(
                f"top-{k} not provably exact: kth count {kth} <= "
                f"N/(capacity+1) {floor_bound}; grow capacity")
    return pa.table({
        "term": pa.array(counts["term"].tolist(), pa.string()),
        "n": pa.array(counts["n"].astype("int64").tolist(), pa.int64()),
    })


SQL_TOP_TERMS = r"""
SELECT term, COUNT(*) AS n
FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents)
GROUP BY term
ORDER BY n DESC, term
LIMIT 25
"""
