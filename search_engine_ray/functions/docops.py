"""Document-table operators (parse, tokenize, df/cf, dedup, metadata).

Each public function takes ``sf_dir`` and returns a Dataset / pyarrow Table;
``SQL[name]`` is the DuckDB oracle producing identical columns (names match
— the driver compare sorts columns by name before hashing).

Scale notes (these run on 500-5000 docs here but are shaped for 1e12):
- token/df/cf ops pre-aggregate inside map_batches (one row per term per
  batch) before the global groupby — the shuffle moves term partials, not
  token streams.
- exact dedup groups by a 64-bit content hash, not the full text, so the
  shuffle key is 8 bytes; the group task keeps the min doc_id.
  (Upgrades the reference's approximate Bloom-filter dedup, Parser.cpp:293-299.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

from ..kernels.stemmer import STOPWORDS
from ..kernels.textutils import fnv1a_64
from ..pipelines.datasets import pages_dataset, parsed_docs_dataset, read_table
from ..sources.fixtures import TLDS
from ..stages.parse import extract_text_batch

SQL: dict[str, str] = {}

_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"
# (doc_id % 13) indexes fixtures.TLDS; DuckDB lists are 1-based
_TLD_LIST = "[" + ",".join(f"'{t}'" for t in TLDS) + "]"
_URL_EXPR = ("'http://doc' || CAST(doc_id AS VARCHAR) || '.' || "
             f"({_TLD_LIST})[(doc_id % 13) + 1] || '/p/' || "
             "CAST(doc_id % 97 AS VARCHAR)")


# ---------------------------------------------------------------------------
def extract_text(sf_dir: str):
    """Per-page extracted text (the byte-identity invariant), keyed by
    doc_id: run the exact-port parser over the synthesized pages."""
    return pages_dataset(sf_dir).map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=256)


SQL["extract_text"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
p AS (SELECT doc_id, toks,
        array_to_string(toks[1:8], ' ') AS ttl,
        array_to_string(toks[9:12], ' ') AS bld,
        array_to_string(toks[1:2], ' ') AS anc
      FROM t)
SELECT {_URL_EXPR} AS url, doc_id,
       ttl || chr(10) || ttl || ' ' || array_to_string(toks, ' ') || ' ' ||
       bld || ' ' || anc AS extracted
FROM p ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def docmeta(sf_dir: str):
    """Parsed per-document attributes (url table of the reference,
    HashBlob.h:61-93): word/title counts, english flag, TLD enum."""
    ds = parsed_docs_dataset(sf_dir).select_columns(
        ["doc_id", "url", "word_count", "title_length", "url_length",
         "english", "tld"])

    def cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "url": b.column("url"),
            "word_count": b.column("word_count").cast(pa.int64()),
            "title_length": b.column("title_length").cast(pa.int64()),
            "url_length": b.column("url_length").cast(pa.int64()),
            "english": b.column("english"),
            "tld": b.column("tld").cast(pa.int64()),
        })

    return ds.map_batches(cast, batch_format="pyarrow")


# tld enum codes: fixtures index i -> parse_tld code (UNKNOWN=0 for 'example')
_TLD_CODE = "[1,2,3,4,5,6,7,8,9,10,11,12,0]"
SQL["docmeta"] = f"""
WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
SELECT doc_id, {_URL_EXPR} AS url,
       18 + len(toks) + least(4, greatest(len(toks) - 8, 0)) AS word_count,
       8 AS title_length,
       length({_URL_EXPR}) AS url_length,
       lang = 'en' AS english,
       ({_TLD_CODE})[(doc_id % 13) + 1] AS tld
FROM t ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def token_count(sf_dir: str):
    """Whitespace token count per document (vectorized pandas str.split)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(b: pa.Table) -> pa.Table:
        from .textstats import _tokens_per_doc
        _, n = _tokens_per_doc(b.column("text"))
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow")


SQL["token_count"] = f"""
SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents ORDER BY doc_id
"""


# BPE-ish pre-tokenizer: alnum runs OR single non-alnum-non-space marks —
# the GPT-2-style "word or punctuation" split.  ASCII-only classes
# spelled out explicitly (no \s, no lower()) so Python re and DuckDB RE2
# agree byte-for-byte even on non-ASCII whitespace / case-mapped text.
_BPE_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9 \t\n\r\f\v]"


def token_count_bpe(sf_dir: str):
    """Sub-word-ish token count: runs of [a-z0-9] plus individual
    punctuation marks over the lowercased text (vectorized str.count)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b.column("text"), _BPE_RE)
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_tokens_bpe": n.cast(pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow")


SQL["token_count_bpe"] = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_tokens_bpe
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def lang_count(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


SQL["lang_count"] = """
SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
def _term_partials(b: pa.Table) -> pa.Table:
    """Per-batch partial (term, partial_df, partial_cf) — the combiner that
    keeps the term shuffle small. Arrow-native: cf via value_counts over
    the flat token stream, df via a distinct-(doc, token) group_by."""
    from .textstats import _tokens_per_doc
    flat, n_tok = _tokens_per_doc(b.column("text"))
    vc = pc.value_counts(flat)
    terms = vc.field("values")
    cf = vc.field("counts").cast(pa.int64())
    doc_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
    uniq = pa.table({"t": flat, "r": pa.array(doc_of)}).group_by(
        ["t", "r"]).aggregate([])
    dfc = uniq.group_by("t").aggregate([("r", "count")])
    idx = pc.index_in(dfc.column("t"), value_set=terms).to_numpy(
        zero_copy_only=False)
    df = np.zeros(len(terms), dtype=np.int64)
    df[idx] = dfc.column("r_count").to_numpy(zero_copy_only=False)
    return pa.table({
        "term": terms,
        "partial_df": pa.array(df, pa.int64()),
        "partial_cf": cf,
    })


def term_stats(sf_dir: str):
    """Document frequency + collection frequency per whitespace token
    (the A2/A3 aggregates of the reference, precomputed at build time)."""
    ds = read_table(sf_dir, "documents", columns=["text"])
    partials = ds.map_batches(_term_partials, batch_format="pyarrow")
    return partials.groupby("term").aggregate(
        Sum("partial_df", alias_name="df"),
        Sum("partial_cf", alias_name="cf"))


SQL["term_stats"] = f"""
SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
GROUP BY term ORDER BY term
"""


# ---------------------------------------------------------------------------
def dedup_exact(sf_dir: str):
    """Exact content dedup: keep min doc_id per text; group key is a 64-bit
    FNV hash of the content so the shuffle moves 8-byte keys."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(b: pa.Table) -> pa.Table:
        h = np.fromiter((fnv1a_64(t.encode()) >> 1
                         for t in b.column("text").to_pylist()),
                        dtype=np.int64, count=b.num_rows)
        return b.append_column("text_hash", pa.array(h))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    agg = hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="n_copies"))
    return agg.select_columns(["doc_id", "n_copies"])


SQL["dedup_exact"] = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def stopword_stats(sf_dir: str):
    """Quality-score ingredients per doc (integer-valued so the oracle hash
    is exact): token count, stopword count, char count of tokens."""
    stop = STOPWORDS

    stop_set = pa.array(sorted(stop))

    def feats(b: pa.Table) -> pa.Table:
        from .textstats import _tokens_per_doc
        flat, n_tok = _tokens_per_doc(b.column("text"))
        n = len(b)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), n_tok)
        hits = pc.is_in(flat, value_set=stop_set).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(doc_of[hits], minlength=n)
        chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        n_chars = np.bincount(doc_of, weights=chars,
                              minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_stop": pa.array(n_stop.astype(np.int64)),
            "n_token_chars": pa.array(n_chars),
        })

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(feats, batch_format="pyarrow")


_STOPLIST = "(" + ",".join(f"'{w}'" for w in sorted(STOPWORDS)) + ")"
SQL["stopword_stats"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id, len(toks) AS n_tokens,
       len(list_filter(toks, x -> x IN {_STOPLIST})) AS n_stop,
       len(array_to_string(toks, '')) AS n_token_chars
FROM t ORDER BY doc_id
"""
