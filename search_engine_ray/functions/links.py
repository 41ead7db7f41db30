"""Link-graph extraction (SURVEY.md §2.2 link capture / F8).

The reference parser captures <a href>/<embed src> links and anchor text
(HtmlParser.cpp:120-165) and ships them to crawler peers with the non-http
filter (Parser.cpp:469-476). Here the same capture feeds a link-graph
dataset: edges (src, dst, anchor) and an in-degree aggregate — the
building block for static rank signals at scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count  # noqa: F401

from ..kernels.htmlparser import HtmlParser
from ..pipelines.datasets import pages_dataset


def _edges_batch(batch: pa.Table) -> pa.Table:
    srcs, dsts, anchors = [], [], []
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    for url, html in zip(urls, htmls):
        p = HtmlParser(html)
        base = p.base.decode("latin-1")
        for link in p.links:
            href = link.url.decode("latin-1")
            # non-http link drop unless a <base> exists (Parser.cpp:469-476)
            if not href.startswith("http") and not base:
                continue
            if not href.startswith("http"):
                href = base + href
            srcs.append(url)
            dsts.append(href)
            anchors.append(" ".join(a.decode("latin-1")
                                    for a in link.anchor))
    return pa.table({
        "src": pa.array(srcs, pa.string()),
        "dst": pa.array(dsts, pa.string()),
        "anchor": pa.array(anchors, pa.string()),
    })


def link_edges(sf_dir: str):
    """All (src, dst, anchor) edges from the synthesized pages."""
    return pages_dataset(sf_dir).map_batches(
        _edges_batch, batch_format="pyarrow", batch_size=512)


def link_indegree(sf_dir: str, k: int = 50):
    """Top-k pages by in-degree (partial counts per batch → small groupby).
    Deterministic tie-break on dst."""
    edges = link_edges(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("dst", as_index=False).size()
        return g.rename(columns={"size": "n"})

    from ray.data.aggregate import Sum

    counts = (edges.select_columns(["dst"])
              .map_batches(partial, batch_format="pandas")
              .groupby("dst").aggregate(Sum("n", alias_name="in_degree")))
    top = (counts.sort(["in_degree", "dst"], descending=[True, False])
           .limit(k).to_pandas())
    top["in_degree"] = top["in_degree"].astype("int64")
    return top[["dst", "in_degree"]]
