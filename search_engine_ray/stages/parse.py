"""Parse stage: pages (url, html) → docs (terms, flags, attributes).

Stateless ``map_batches`` functions, ``batch_format="pyarrow"``. The parse
itself is the exact-port kernel (kernels/htmlparser.py); tokens are stemmed
with the reference stemmer and the reference's location accounting is
reproduced (SURVEY.md §2 F2/F3/A6):

- documents with >= 40 raw title words are rejected entirely
  (Index::Insert, Indexer.hpp:404-406)
- a document reserves ``raw_title + raw_body + 2`` locations; tokens whose
  stem is empty (stopwords/punct) are dropped WITHOUT advancing the
  location counter (Indexer.hpp:407-440), so within-doc positions are
  simply 0..n_kept-1 over the kept sequence [title ++ body]
- title terms are indexed under a separate '@'-prefixed vocabulary
  (Indexer.hpp:355-357); title posts carry flags=0
- word_count is the RAW (pre-stem) title+body token count
  (Indexer.hpp:419), title_length the raw title token count

Words are decoded utf-8 first (tag/whitespace boundaries are ASCII so valid
UTF-8 never splits mid-codepoint), falling back to latin-1 for arbitrary
bytes — a deterministic bijection either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.htmlparser import HtmlParser
from ..kernels.stemmer import stem
from ..kernels.textutils import parse_tld

DOCS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("title", pa.string()),
    # kept stemmed terms, space-joined: first n_title_kept are the
    # '@'-prefixed title terms, the rest body terms. A flat string column
    # is ~3x cheaper than list<string> through parquet + Python.
    ("terms", pa.string()),
    ("flags", pa.binary()),  # one byte per kept term (title bytes are 0)
    ("n_title_kept", pa.int32()),
    ("word_count", pa.uint32()),
    ("title_length", pa.uint32()),
    ("n_locations", pa.uint32()),
    ("url_length", pa.uint32()),
    ("english", pa.bool_()),
    ("tld", pa.uint8()),
])


def _decode(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


# bytes→stem cache: skips both the decode and the stemmer's own lru layer
# for repeated tokens (Zipf makes the hit rate ~99% on web text); bounded
# so a pathological vocabulary can't grow the worker heap unboundedly
_STEM_CACHE: dict[bytes, str] = {}
_STEM_CACHE_MAX = 2_000_000


def _stem_bytes(w: bytes) -> str:
    s = _STEM_CACHE.get(w)
    if s is None:
        s = stem(_decode(w))
        if len(_STEM_CACHE) < _STEM_CACHE_MAX:
            _STEM_CACHE[w] = s
    return s


def parse_pages_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html, ...) → docs (DOCS_SCHEMA). Oversized-title pages are
    dropped here, mirroring the indexer's reject (F2)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    has_doc_id = "doc_id" in batch.column_names
    doc_ids = (batch.column("doc_id").to_pylist() if has_doc_id
               else [None] * len(urls))

    out_url, out_title, out_doc_id = [], [], []
    out_terms, out_flags, out_ntk = [], [], []
    out_wc, out_tl, out_nloc, out_ul, out_en, out_tld = [], [], [], [], [], []

    _sb = _stem_bytes
    for url, html, doc_id in zip(urls, htmls, doc_ids):
        p = HtmlParser(html)
        if len(p.title_words) >= 40:
            continue  # Indexer.hpp:404-406
        out_doc_id.append(doc_id)
        kept = []
        flags = bytearray()
        kept_append = kept.append
        flags_append = flags.append
        for w in p.title_words:
            s = _sb(w)
            if s:
                kept_append("@" + s)
                flags_append(0)
        n_title_kept = len(kept)
        for w, fl in p.words_flags:
            s = _sb(w)
            if s:
                kept_append(s)
                flags_append(fl)
        out_url.append(url)
        out_title.append(_decode(p.title_chunk))
        out_terms.append(" ".join(kept))
        out_flags.append(bytes(flags))
        out_ntk.append(n_title_kept)
        out_wc.append(len(p.title_words) + len(p.words_flags))
        out_tl.append(len(p.title_words))
        out_nloc.append(len(p.title_words) + len(p.words_flags) + 2)
        out_ul.append(len(url))
        out_en.append(p.english)
        out_tld.append(parse_tld(url))

    cols = {
        "url": pa.array(out_url, pa.string()),
        "title": pa.array(out_title, pa.string()),
        "terms": pa.array(out_terms, pa.string()),
        "flags": pa.array(out_flags, pa.binary()),
        "n_title_kept": pa.array(out_ntk, pa.int32()),
        "word_count": pa.array(out_wc, pa.uint32()),
        "title_length": pa.array(out_tl, pa.uint32()),
        "n_locations": pa.array(out_nloc, pa.uint32()),
        "url_length": pa.array(out_ul, pa.uint32()),
        "english": pa.array(out_en, pa.bool_()),
        "tld": pa.array(out_tld, pa.uint8()),
    }
    if has_doc_id:
        cols["doc_id"] = pa.array(out_doc_id, pa.int64())
    return pa.table(cols)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages → (url, [doc_id,] extracted): the golden per-row invariant
    (title words joined, newline, body words joined)."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out = [_decode(HtmlParser(h).extracted_text()) for h in htmls]
    cols = {"url": pa.array(urls, pa.string())}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    cols["extracted"] = pa.array(out, pa.string())
    return pa.table(cols)
