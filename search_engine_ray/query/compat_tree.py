"""Compat chunk index (the reference's mutable per-chunk ``Index``) and the
compiled-plan → ISR-tree conversion mirroring the wire decode.

ChunkIndex reproduces Index::Insert (Indexer.hpp:403-445): a single
location space per chunk, one `[start, end]` range per doc covering
``raw_title + raw_body + 2`` locations, stemmed-empty tokens dropped
without advancing the location counter, title terms under the '@'
vocabulary with flags=0, dense doc ids in insert order.

build_isr_root replicates the csolver AST decode (ast.cpp:231-288),
including the OR_SYN collapse: a chain node whose rest is null decodes to
just its left child (ast.cpp:259-267), so the innermost synonym node loses
its SynOr wrapper.
"""

from __future__ import annotations

import numpy as np

from ..kernels.textutils import parse_tld
from . import compile as qc
from .isr_compat import (ISRAbstractC, ISRAndC, ISRContainerC, ISRDocC,
                         ISROrC, ISRPhraseC, ISRSynOrC, ISRWordC, NULL)


class ChunkIndex:
    """One frozen chunk: term dictionary + doc bounds + attributes."""

    def __init__(self):
        self._dict_build: dict[str, tuple[list, list]] = {}
        self._doc_starts: list[int] = []
        self._doc_ends: list[int] = []
        self._doc_ids: list[int] = []
        self.attrs: list[dict] = []
        self.words_in_index = 0
        self.documents_in_index = 0
        self.locations_in_index = 0
        self.maximum_location = 0
        self._frozen = False

    # -- build (Index::Insert) ---------------------------------------------
    def insert(self, doc: dict) -> None:
        """doc: url, title (str), title_terms ('@'-stems), body_terms,
        body_flags, word_count (raw), title_length (raw), english."""
        assert not self._frozen
        if doc["title_length"] >= 40:
            return  # Indexer.hpp:404-406
        total = doc["word_count"] + 2
        start = self.maximum_location + 1
        self.maximum_location += total
        end = start + total - 1
        doc_id = len(self.attrs)
        self.attrs.append({
            "url": doc["url"],
            "title": doc["title"],
            "word_count": doc["word_count"],
            "url_length": len(doc["url"]),
            "title_length": doc["title_length"],
            "start": start,
            "end": end,
            "english": doc["english"],
            "tld": parse_tld(doc["url"]),
        })
        self._doc_starts.append(start)
        self._doc_ends.append(end)
        self._doc_ids.append(doc_id)
        self.documents_in_index += 1
        self.locations_in_index += 1

        next_location = start
        for term in doc["title_terms"]:  # already '@'-prefixed stems
            self._add(term, next_location, 0)
            next_location += 1
        for term, flags in zip(doc["body_terms"], doc["body_flags"]):
            self._add(term, next_location, flags)
            next_location += 1

    def _add(self, term: str, location: int, flags: int) -> None:
        entry = self._dict_build.get(term)
        if entry is None:
            entry = ([], [])
            self._dict_build[term] = entry
            self.words_in_index += 1
        entry[0].append(location)
        entry[1].append(flags)
        self.locations_in_index += 1

    def freeze(self) -> "ChunkIndex":
        self.dictionary = {
            t: (np.asarray(locs, dtype=np.uint32),
                np.asarray(fls, dtype=np.uint8))
            for t, (locs, fls) in self._dict_build.items()}
        self._starts = np.asarray(self._doc_starts, dtype=np.uint32)
        self._ends = np.asarray(self._doc_ends, dtype=np.uint32)
        self._ids = np.asarray(self._doc_ids, dtype=np.uint32)
        self._frozen = True
        return self

    # -- IndexBlob interface -----------------------------------------------
    def open_isr_word(self, key: str):
        entry = self.dictionary.get(key)
        if entry is None:
            return ISRAbstractC()
        return ISRWordC(key, entry[0], entry[1], self.open_isr_enddoc())

    def open_isr_enddoc(self) -> ISRDocC:
        return ISRDocC(self._starts, self._ends, self._ids)


def build_chunks(parsed_docs: list[dict], chunk_size: int = 5000
                 ) -> list[ChunkIndex]:
    """Canonical chunking: docs must already be unique + in canonical order
    (sorted by url); chunks of ``chunk_size`` in that order
    (MIN_PAGES_PER_CHUNK, constants.h:27)."""
    chunks = []
    for i in range(0, len(parsed_docs), chunk_size):
        c = ChunkIndex()
        for doc in parsed_docs[i:i + chunk_size]:
            c.insert(doc)
        chunks.append(c.freeze())
    return chunks


def _decode_phrase_terms(stems: list[str]) -> list[str]:
    """Wire-accurate phrase term list: the compiler joins stems with single
    spaces (query.cpp:256-266) and the csolver's Aggregate_Phrase
    (ast.cpp:210-228) collapses space RUNS but keeps the FINAL — possibly
    empty — term. A phrase ending in a stopword therefore carries a
    trailing "" term whose ISR is the always-empty ISRAbstract, making the
    whole phrase unmatchable; reproduced exactly (found by rank fuzzing).
    """
    wire = " ".join(stems)
    terms = [""]
    for ch in wire:
        if ch == " ":
            if terms[-1]:
                terms.append("")
        else:
            terms[-1] += ch
    return terms


def build_isr_root(index: ChunkIndex, plan):
    """Expr_AST::to_ISR over the decoded tree (ast.cpp:81-146,231-288)."""
    if plan is None:
        return None
    if isinstance(plan, qc.Word):
        return index.open_isr_word(plan.stem_)
    if isinstance(plan, qc.Phrase):
        return ISRPhraseC(index, _decode_phrase_terms(plan.stems))
    if isinstance(plan, qc.And):
        return ISRAndC(build_isr_root(index, plan.left),
                       build_isr_root(index, plan.right))
    if isinstance(plan, qc.Or):
        return ISROrC(build_isr_root(index, plan.left),
                      build_isr_root(index, plan.right))
    if isinstance(plan, qc.SynOr):
        if plan.rest is None:
            # OR_SYN with null rest collapses to its left (ast.cpp:263-264)
            return build_isr_root(index, plan.left)
        return ISRSynOrC(build_isr_root(index, plan.left),
                         build_isr_root(index, plan.rest),
                         plan.ratio_term, plan.ratio_rest)
    if isinstance(plan, qc.Not):
        return ISRContainerC(build_isr_root(index, plan.child), NULL)
    raise TypeError(type(plan))
