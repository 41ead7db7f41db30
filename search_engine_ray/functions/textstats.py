"""Text analysis operators: language ID, quality scoring, fingerprinting.

All heuristics are deterministic and vectorizable per batch; intended for
the documents table (and at scale, the parsed-docs table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.stemmer import STOPWORDS
from ..kernels.textutils import fnv1a_64
from ..pipelines.datasets import read_table

# language marker profiles: high-frequency function words per language
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with",
           "was", "this", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit",
           "für", "von", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "dans", "que", "pour",
           "des", "du", "pas"},
    "es": {"el", "la", "los", "las", "es", "una", "en", "que", "para",
           "por", "del", "con"},
}


def detect_lang(text: str) -> str:
    """n-gram/marker heuristic language ID: CJK charset check, then the
    language whose marker set covers the most tokens; 'und' when nothing
    matches."""
    if any("一" <= ch <= "鿿" for ch in text[:500]):
        return "zh"
    toks = text.lower().split()
    if not toks:
        return "und"
    best_lang, best = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(1 for t in toks if t in markers)
        if score > best:
            best_lang, best = lang, score
    return best_lang


def lang_id(sf_dir: str):
    """Predicted language per document."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "lang_pred": [detect_lang(t) for t in b["text"]],
        })

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
def quality_features(text: str) -> tuple[int, int, int, int, int]:
    toks = text.split()
    n = len(toks)
    n_chars = len(text)
    n_stop = sum(1 for t in toks if t.lower() in STOPWORDS)
    n_alpha = sum(1 for ch in text if ch.isalpha())
    n_punct = sum(1 for ch in text if ch in ".,;:!?\"'()[]{}")
    return n, n_chars, n_stop, n_alpha, n_punct


def quality_score(sf_dir: str):
    """Composite quality score in basis points (integer, deterministic):
    blends length fit, stopword ratio, alpha ratio, punct density — the
    standard pretraining-corpus heuristics (Gopher/C4-style rules)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": b["doc_id"], "quality_bp": []}
        for t in b["text"]:
            n, n_chars, n_stop, n_alpha, n_punct = quality_features(t)
            if n == 0:
                rows["quality_bp"].append(0)
                continue
            length_fit = min(n, 500) / 500.0
            stop_ratio = n_stop / n
            alpha_ratio = n_alpha / max(n_chars, 1)
            punct_density = n_punct / max(n_chars, 1)
            score = (0.3 * length_fit
                     + 0.3 * min(stop_ratio * 4.0, 1.0)
                     + 0.3 * alpha_ratio
                     + 0.1 * (1.0 - min(punct_density * 10.0, 1.0)))
            rows["quality_bp"].append(int(score * 10000))
        return pd.DataFrame(rows)

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
def _winnow_fingerprints(text: str, k: int = 5, window: int = 4
                         ) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, minimum
    per sliding window, deduped — the standard document fingerprint."""
    toks = text.lower().split()
    if len(toks) < k:
        return np.asarray([fnv1a_64(" ".join(toks).encode())],
                          dtype=np.uint64)
    hashes = np.fromiter(
        (fnv1a_64(" ".join(toks[i:i + k]).encode())
         for i in range(len(toks) - k + 1)),
        dtype=np.uint64)
    if len(hashes) <= window:
        return np.unique(hashes.min(keepdims=True))
    # sliding-window minimum via stride trick
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(sw.min(axis=1))


def fingerprints(sf_dir: str):
    """Winnowed fingerprint summary per doc (counts + xor fold are
    integers so results hash exactly)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": b["doc_id"], "n_fingerprints": [], "fp_fold": []}
        for t in b["text"]:
            fps = _winnow_fingerprints(t)
            rows["n_fingerprints"].append(len(fps))
            fold = np.bitwise_xor.reduce(fps) if len(fps) else np.uint64(0)
            rows["fp_fold"].append(int(fold >> np.uint64(1)))
        return pd.DataFrame(rows)

    return ds.map_batches(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# Gopher-style quality + repetition filters (Rae et al. 2021 §A1.1-style
# heuristics, adapted to integer outputs so the DuckDB oracle hashes
# exactly). One batch pass, no shuffle.
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "a", "an", "and", "of", "to", "in", "is")
_GOPHER_STOPSET = frozenset(_GOPHER_STOPS)


def _gopher_row(text: str) -> tuple[int, int, int, int, int, int]:
    toks = text.strip().lower().split()
    n_words = max(len(toks), 1) if not toks else len(toks)
    if not toks:
        toks = [""]
        n_words = 1  # string_split_regex('') yields [''] in the oracle
    wchars = sum(len(w) for w in toks)
    stop_hits = sum(1 for w in toks if w in _GOPHER_STOPSET)
    n_sym = text.count("#") + text.count("...")
    lines = text.split("\n")
    dup_line_bp = (len(lines) - len(set(lines))) * 10000 // len(lines)
    bg = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
    if bg:
        from collections import Counter
        top = Counter(bg).most_common(1)[0][1]
    else:
        top = 0
    top_bigram_bp = top * 10000 // max(len(bg), 1)
    return (n_words, 100 * wchars // n_words, stop_hits,
            10000 * n_sym // n_words, dup_line_bp, top_bigram_bp)


def gopher_quality(sf_dir: str):
    """Per-doc Gopher-style quality metrics + pass flag.

    pass_gopher = 1 iff 50 ≤ n_words ≤ 100000, 3.0 ≤ mean word length
    ≤ 10.0, symbol ratio ≤ 0.1, ≥ 2 stopword hits, duplicate-line
    fraction ≤ 0.3, and top-bigram fraction ≤ 0.2.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        rows = [_gopher_row(t) for t in b["text"]]
        arr = np.asarray(rows, dtype=np.int64).reshape(len(rows), 6)
        ok = ((arr[:, 0] >= 50) & (arr[:, 0] <= 100000)
              & (arr[:, 1] >= 300) & (arr[:, 1] <= 1000)
              & (arr[:, 3] <= 1000) & (arr[:, 2] >= 2)
              & (arr[:, 4] <= 3000) & (arr[:, 5] <= 2000))
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_words": arr[:, 0],
            "mean_word_len_x100": arr[:, 1],
            "stopword_hits": arr[:, 2],
            "symbol_bp": arr[:, 3],
            "dup_line_bp": arr[:, 4],
            "top_bigram_bp": arr[:, 5],
            "pass_gopher": ok.astype(np.int64),
        })

    return ds.map_batches(fn, batch_format="pandas")


_GOPHER_STOPS_SQL = "[" + ",".join(f"'{w}'" for w in _GOPHER_STOPS) + "]"

SQL_GOPHER_QUALITY = rf"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\s+') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id, text, toks, lines,
         len(toks) AS n_words,
         list_aggregate(list_transform(toks, w -> length(w)), 'sum') AS wchars,
         len(list_filter(toks,
             w -> list_contains({_GOPHER_STOPS_SQL}, w))) AS stopword_hits,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bg
  FROM t
), f AS (
  SELECT doc_id,
         CAST(n_words AS BIGINT) AS n_words,
         CAST(100 * wchars // n_words AS BIGINT) AS mean_word_len_x100,
         CAST(stopword_hits AS BIGINT) AS stopword_hits,
         CAST(10000 * n_sym // n_words AS BIGINT) AS symbol_bp,
         CAST((len(lines) - len(list_distinct(lines))) * 10000
              // len(lines) AS BIGINT) AS dup_line_bp,
         CAST(COALESCE(list_max(list_transform(list_distinct(bg),
                b -> len(list_filter(bg, x -> x = b)))), 0) * 10000
              // GREATEST(len(bg), 1) AS BIGINT) AS top_bigram_bp
  FROM m
)
SELECT *,
       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                  AND mean_word_len_x100 BETWEEN 300 AND 1000
                  AND symbol_bp <= 1000 AND stopword_hits >= 2
                  AND dup_line_bp <= 3000 AND top_bigram_bp <= 2000
            THEN 1 ELSE 0 END AS BIGINT) AS pass_gopher
FROM f ORDER BY doc_id
"""
