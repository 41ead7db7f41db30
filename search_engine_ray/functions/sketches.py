"""Sketch-guided exact heavy hitters over the documents table.

``top_terms``: per-batch Misra-Gries summaries find the candidate set
(a term with global count > N/capacity must survive in at least one
batch's summary — pigeonhole over batches), then ONE exact recount pass
restricted to the broadcast candidate set makes the final counts exact,
so the result hashes against a plain SQL GROUP BY oracle. The sketch
bounds the shuffle to |candidates| rows per batch instead of the full
vocabulary; the recount groupby is over ≤ capacity × n_batches rows.

Exactness guard: the top-k is provably exact iff the k-th count exceeds
N/capacity (every possible missing term is below that bound); the
operator asserts this at runtime and raises with a "grow capacity"
message otherwise — no silent approximation.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Sum

from ..pipelines.datasets import read_table


def _misra_gries(tokens, capacity: int) -> Counter:
    """Classic MG summary: at most ``capacity`` counters."""
    c: Counter = Counter()
    for t in tokens:
        if t in c:
            c[t] += 1
        elif len(c) < capacity:
            c[t] = 1
        else:
            dead = [k for k in c if c[k] == 1]
            for k in c:
                c[k] -= 1
            for k in dead:
                del c[k]
    return c


def top_terms(sf_dir: str, k: int = 25, capacity: int = 512):
    """Exact global top-k terms by count, sketch-guided.
    Returns (term, n) sorted by n desc, term asc."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = []
        for t in b["text"]:
            toks.extend(t.strip().lower().split())
        mg = _misra_gries(toks, capacity)
        return pd.DataFrame({
            "term": pd.Series(list(mg.keys()), dtype=object),
            "n_tok": pd.Series([len(toks)], dtype=np.int64).reindex(
                range(len(mg)), fill_value=0),
        })

    parts = docs.map_batches(partial, batch_format="pandas")
    rows = parts.to_pandas()
    candidates = frozenset(rows["term"])
    total_n = int(rows["n_tok"].sum())
    cand_ref = ray.put(candidates)

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        c: Counter = Counter()
        for t in b["text"]:
            for w in t.strip().lower().split():
                if w in cand:
                    c[w] += 1
        return pd.DataFrame({
            "term": pd.Series(list(c.keys()), dtype=object),
            "n": pd.Series(list(c.values()), dtype=np.int64),
        })

    counts = (docs.map_batches(recount, batch_format="pandas")
              .groupby("term").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    counts = counts.sort_values(["n", "term"],
                                ascending=[False, True]).head(k)
    floor_bound = total_n // capacity
    if len(counts) < k and floor_bound > 0:
        raise ValueError(
            f"top-{k} not provably exact: only {len(counts)} candidates "
            f"survived the sketch; grow capacity")
    kth = int(counts["n"].iloc[-1]) if len(counts) >= k else 0
    if len(counts) >= k and kth <= floor_bound:
        raise ValueError(
            f"top-{k} not provably exact: kth count {kth} ≤ "
            f"N/capacity {floor_bound}; grow capacity")
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
