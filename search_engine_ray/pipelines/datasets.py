"""Dataset constructors over the driver testdata directory.

All readers prune columns at the read (SURVEY.md §"prune at the read").
"""

from __future__ import annotations

import os

import ray.data as rd

from ..sources.fixtures import pages_from_documents_batch
from ..stages.parse import parse_pages_batch

# parse work is CPU-bound per page; modest batches keep the pipeline fed
PARSE_BATCH_SIZE = 256


def read_table(sf_dir: str, name: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns)


def pages_dataset(sf_dir: str) -> "rd.Dataset":
    """Deterministic Common-Crawl-style pages synthesized from the
    ``documents`` table (FIXTURES.md §4): one page per document."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return docs.map_batches(pages_from_documents_batch,
                            batch_format="pyarrow")


def parsed_docs_dataset(sf_dir: str) -> "rd.Dataset":
    """pages → parsed docs (stems, flags, attributes)."""
    return pages_dataset(sf_dir).map_batches(
        parse_pages_batch, batch_format="pyarrow",
        batch_size=PARSE_BATCH_SIZE)
