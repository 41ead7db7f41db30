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
