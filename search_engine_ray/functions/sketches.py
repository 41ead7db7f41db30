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
capacity (the tightest possible MG summary), computed with vectorized
pandas ``value_counts`` — no per-token Python loop.

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

import ray
from ray.data.aggregate import Sum

from ..pipelines.datasets import read_table


def _mg_truncate(counts: pd.Series, capacity: int) -> tuple[pd.Series, bool]:
    """Truncate exact (or merged-MG) counts to an MG summary of at most
    ``capacity`` counters.  Returns (summary, truncated?)."""
    if len(counts) <= capacity:
        return counts, False
    counts = counts.sort_values(ascending=False)
    thresh = int(counts.iloc[capacity])
    kept = (counts - thresh).iloc[:capacity]
    return kept[kept > 0], True


def _batch_summary(b: pd.DataFrame, capacity: int) -> pd.DataFrame:
    toks = b["text"].str.strip().str.lower().str.split()
    flat = np.concatenate(toks.values) if len(toks) else np.array([], object)
    n_tok = int(flat.size)
    counts = pd.Series(flat, dtype=object).value_counts()
    mg, truncated = _mg_truncate(counts, capacity)
    out = pd.DataFrame({
        "term": mg.index.astype(object),
        "c": mg.values.astype(np.int64),
        "n_tok": np.zeros(len(mg), dtype=np.int64),
        "trunc": np.zeros(len(mg), dtype=np.int64),
    })
    # Sentinel row carries the batch token count and truncation flag
    # independently of the summary size (an empty summary still counts).
    sentinel = pd.DataFrame({
        "term": pd.Series([""], dtype=object), "c": [np.int64(0)],
        "n_tok": [np.int64(n_tok)], "trunc": [np.int64(truncated)],
    })
    return pd.concat([out, sentinel], ignore_index=True)


def top_terms(sf_dir: str, k: int = 25, capacity: int = 512):
    """Exact global top-k terms by count, sketch-guided.
    Returns (term, n) sorted by n desc, term asc."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    parts = docs.map_batches(
        lambda b: _batch_summary(b, capacity), batch_format="pandas",
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
    cand_ref = ray.put(candidates)

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        toks = b["text"].str.strip().str.lower().str.split()
        flat = np.concatenate(toks.values) if len(toks) else np.array([], object)
        s = pd.Series(flat, dtype=object)
        s = s[s.isin(cand)]
        c = s.value_counts()
        return pd.DataFrame({
            "term": c.index.astype(object),
            "n": c.values.astype(np.int64),
        })

    counts = (docs.map_batches(recount, batch_format="pandas")
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
