"""Conformance-exact port of the reference ISR stream algebra.

Transliterated from /root/reference/engine/indexer/Indexer.hpp (ISR base,
ISRWord, ISRDoc, ISRAbstract) and /root/reference/engine/csolver/isr.cpp
(ISROr, ISRSynOr, ISRAnd, ISRContainer, ISRPhrase, ISR_Tree). State is
modeled exactly like the C++ stream cursors:

- each ISRWord/ISRDoc keeps (next decode index, current post, last decoded
  location); Seek re-scans FROM THE START when the last decoded location is
  already >= target (SerializedPostingList::SeekWordPost, Posts.hpp:418-423)
  — i.e. backward seeks rewind, including the Seek(0) wrap after exhaustion
- posts are snapshots (the C++ heap-allocates a Post per decode)
- ISROr/ISRSynOr never assign the base-class ``current``, so their Seek
  early-return never fires (isr.cpp:76-83,192-199); ISRAnd / ISRContainer /
  ISRPhrase keep their own current
- a term absent from the chunk dictionary yields ISRAbstract: all methods
  null, and collectTerms SKIPS it (Indexer.hpp:308-325)

All Location arithmetic callers must pass uint32-wrapped targets (see
ranker_compat.u32).
"""

from __future__ import annotations

import numpy as np


class WordPost:
    __slots__ = ("loc", "flags")

    def __init__(self, loc: int, flags: int):
        self.loc = loc
        self.flags = flags

    # Post interface
    def start(self) -> int:
        return self.loc

    def end(self) -> int:
        return self.loc


class DocPost:
    __slots__ = ("start_loc", "end_loc", "doc_id")

    def __init__(self, start_loc: int, end_loc: int, doc_id: int):
        self.start_loc = start_loc
        self.end_loc = end_loc
        self.doc_id = doc_id

    def start(self) -> int:
        return self.start_loc

    def end(self) -> int:
        return self.end_loc


class ISRDocC:
    """ISRDoc (Indexer.hpp:54-162) over the chunk's docEnd posting list."""

    __slots__ = ("starts", "ends", "ids", "next_i", "current", "prev_end")

    def __init__(self, starts, ends, ids):
        self.starts = starts
        self.ends = ends
        self.ids = ids
        self.next_i = 0
        self.current: DocPost | None = None
        self.prev_end = 0  # the decode-state prevEndLocation

    def next(self):
        if self.next_i < len(self.starts):
            i = self.next_i
            self.current = DocPost(int(self.starts[i]), int(self.ends[i]),
                                   int(self.ids[i]))
            self.prev_end = self.current.end_loc
            self.next_i = i + 1
        else:
            self.current = None
        return self.current

    next_internal = next

    def seek(self, target: int):
        if self.current is not None and self.current.end_loc >= target:
            return self.current
        # SeekDocumentPost (Posts.hpp:448-473)
        if self.prev_end >= target:
            self.prev_end = 0
            self.next_i = 0
        i = self.next_i
        n = len(self.ends)
        if i < n:
            j = int(np.searchsorted(self.ends[i:], target)) + i
            if j < n:
                self.current = DocPost(int(self.starts[j]), int(self.ends[j]),
                                       int(self.ids[j]))
                self.prev_end = self.current.end_loc
                self.next_i = j + 1
                return self.current
            self.prev_end = int(self.ends[n - 1])
            self.next_i = n
        self.current = None
        return None

    def get_current_post(self):
        return self.current

    get_current_doc = get_current_post

    def start_location(self) -> int:
        return self.current.start_loc if self.current is not None else 0

    def end_location(self) -> int:
        return self.current.end_loc if self.current is not None else 0


class ISRWordC:
    """ISRWord (Indexer.hpp:165-306) over one term's (locs, flags)."""

    __slots__ = ("key", "locs", "flags", "isr_doc", "next_i", "current",
                 "last_loc", "syn_word")

    def __init__(self, key: str, locs, flags, isr_doc: ISRDocC):
        self.key = key
        self.locs = locs
        self.flags = flags
        self.isr_doc = isr_doc
        self.next_i = 0
        self.current: WordPost | None = None
        self.last_loc = 0  # decode-state currentLocation
        self.syn_word = False

    def get_key(self) -> str:
        return self.key

    def get_post_count(self) -> int:
        return len(self.locs)

    def is_synonym_word(self) -> bool:
        return self.syn_word

    def set_synonym(self, v: bool) -> None:
        self.syn_word = v

    def next_internal(self):
        if self.next_i < len(self.locs):
            i = self.next_i
            self.current = WordPost(int(self.locs[i]), int(self.flags[i]))
            self.last_loc = self.current.loc
            self.next_i = i + 1
        else:
            self.current = None
        return self.current

    def get_current_doc(self):
        if self.current is not None:
            return self.isr_doc.seek(self.current.loc)
        return None

    def next(self):
        # next *document* containing the term (Indexer.hpp:193-202)
        target = 0
        if self.current is not None:
            post = self.isr_doc.seek(self.current.loc)
            if post is not None:
                target = post.end_loc + 1
        return self.seek(target)

    def seek(self, target: int):
        if self.current is not None and self.current.loc >= target:
            return self.current
        # SeekWordPost (Posts.hpp:418-445): rewind when already past target
        if self.last_loc >= target:
            self.last_loc = 0
            self.next_i = 0
        i = self.next_i
        n = len(self.locs)
        if i < n:
            j = int(np.searchsorted(self.locs[i:], target)) + i
            if j < n:
                self.current = WordPost(int(self.locs[j]),
                                        int(self.flags[j]))
                self.last_loc = self.current.loc
                self.next_i = j + 1
                return self.current
            self.last_loc = int(self.locs[n - 1])
            self.next_i = n
        self.current = None
        return None

    def get_current_post(self):
        return self.current

    def start_location(self) -> int:
        return self.current.loc if self.current is not None else 0

    def end_location(self) -> int:
        return self.current.loc if self.current is not None else 0

    def get_occurrences_in_curr_doc(self, start: int, end: int) -> int:
        # Indexer.hpp:255-284 — state saved/restored, current not consumed
        if self.current is not None and self.current.loc > end:
            return 0
        saved = (self.next_i, self.current, self.last_loc)
        self.current = None
        count = 0
        word = self.seek(start)
        while word is not None and word.loc <= end:
            count += 1
            word = self.next_internal()
        self.next_i, self.current, self.last_loc = saved
        return count

    def collect_terms(self, index, terms: list, seen: set) -> None:
        if self.key not in seen:
            seen.add(self.key)
            terms.append(index.open_isr_word(self.key))


class ISRAbstractC(ISRWordC):
    """Missing-term stub (Indexer.hpp:308-325): everything null, and NOT
    collected into the flattened term list."""

    def __init__(self):
        super().__init__("", np.empty(0, np.uint32), np.empty(0, np.uint8),
                         None)

    def get_post_count(self) -> int:
        return 0

    def get_current_doc(self):
        return None

    def next(self):
        return None

    def next_internal(self):
        return None

    def seek(self, target: int):
        return None

    def start_location(self) -> int:
        return 0

    def end_location(self) -> int:
        return 0

    def get_current_post(self):
        return None

    def collect_terms(self, index, terms, seen) -> None:
        pass


class ISROrC:
    """ISROr (isr.cpp:22-134). Base ``current`` never assigned."""

    def __init__(self, isr1, isr2):
        self.isr1 = isr1
        self.isr2 = isr2
        self.nearest = -1
        self.nearest_start = 0
        self.nearest_end = 0

    def _find_nearest(self):
        p1 = self.isr1.get_current_post()
        p2 = self.isr2.get_current_post()
        if p1 is None and p2 is None:
            self.nearest = -1
            return None
        if p1 is not None and (p2 is None or p1.start() <= p2.start()):
            self.nearest = 0
            self.nearest_start = p1.start()
            self.nearest_end = p1.end()
            return p1
        self.nearest = 1
        self.nearest_start = p2.start()
        self.nearest_end = p2.end()
        return p2

    def next_internal(self):
        if self.nearest == -1:
            self.isr1.next_internal()
            self.isr2.next_internal()
            return self._find_nearest()
        if self.nearest == 0:
            self.isr1.next_internal()
        elif self.nearest == 1:
            self.isr2.next_internal()
        return self._find_nearest()

    def next(self):
        if self.nearest == -1:
            self.isr1.next()
            self.isr2.next()
            return self._find_nearest()
        doc = (self.isr1.get_current_doc() if self.nearest == 0
               else self.isr2.get_current_doc())
        if doc is None:
            return None
        return self.seek(doc.end() + 1)

    def seek(self, target: int):
        # base `current` is never set → no early return (isr.cpp:76-83)
        self.isr1.seek(target)
        self.isr2.seek(target)
        return self._find_nearest()

    def get_current_post(self):
        if self.nearest == -1:
            return None
        return (self.isr1.get_current_post() if self.nearest == 0
                else self.isr2.get_current_post())

    def get_current_doc(self):
        if self.nearest == -1:
            return None
        return (self.isr1.get_current_doc() if self.nearest == 0
                else self.isr2.get_current_doc())

    def start_location(self) -> int:
        return self.nearest_start

    def end_location(self) -> int:
        return self.nearest_end

    def collect_terms(self, index, terms, seen) -> None:
        self.isr1.collect_terms(index, terms, seen)
        self.isr2.collect_terms(index, terms, seen)


class ISRSynOrC:
    """ISRSynOr (isr.cpp:137-262)."""

    def __init__(self, isr1, isr2, advance_right: int, advance_left: int):
        self.isr1 = isr1
        self.isr2 = isr2
        self.advance_right = advance_right
        self.advance_left = advance_left
        self.nearest = -1
        self.nearest_start = 0
        self.nearest_end = 0

    _find_nearest = ISROrC._find_nearest

    def next_internal(self):
        if self.nearest == -1:
            self.isr1.next_internal()
            self.isr2.next_internal()
            return self._find_nearest()
        if self.nearest == 0:
            for _ in range(self.advance_left):
                self.isr1.next_internal()
        else:
            for _ in range(self.advance_right):
                self.isr2.next_internal()
        return self._find_nearest()

    def next(self):
        if self.nearest == -1:
            self.isr1.next()
            self.isr2.next()
            return self._find_nearest()
        doc = self.get_current_doc()
        if doc is None:
            return None
        self.seek(doc.end() + 1)
        if self.nearest == 0:
            for _ in range(self.advance_right - 1):
                self.isr2.next()
        else:
            for _ in range(self.advance_left - 1):
                self.isr1.next()
        return self._find_nearest()

    def seek(self, target: int):
        self.isr1.seek(target)
        self.isr2.seek(target)
        return self._find_nearest()

    get_current_post = ISROrC.get_current_post
    get_current_doc = ISROrC.get_current_doc
    start_location = ISROrC.start_location
    end_location = ISROrC.end_location

    def collect_terms(self, index, terms, seen) -> None:
        self.isr1.collect_terms(index, terms, seen)
        syn_index = len(terms)
        self.isr2.collect_terms(index, terms, seen)
        for i in range(syn_index, len(terms)):
            terms[i].set_synonym(True)


class _NullChild:
    """Stands in for a nullptr child pointer (wire NOT right side)."""


NULL = _NullChild()


class ISRAndC:
    """ISRAnd (isr.cpp:266-404)."""

    def __init__(self, isr1, isr2):
        self.isr1 = isr1
        self.isr2 = isr2
        self.current = None
        self.nearest = -1

    def _advance_to_match(self):
        while True:
            l = self.isr1.get_current_post()
            r = self.isr2.get_current_post()
            if l is None or r is None:
                self.nearest = -1
                self.current = None
                return None
            l_start, r_start = l.start(), r.start()
            if l_start <= r_start:
                doc_end = self.isr2.get_current_doc()
                if doc_end is None:
                    return None  # current unchanged (isr.cpp:362-365)
                if (l_start >= doc_end.start() and r_start <= doc_end.end()
                        and l_start <= doc_end.end()):
                    self.nearest = 0
                    self.current = l
                    return l
                self.isr1.seek(doc_end.start())
            else:
                doc_end = self.isr1.get_current_doc()
                if doc_end is None:
                    return None
                if (r_start >= doc_end.start() and r_start <= doc_end.end()
                        and l_start <= doc_end.end()):
                    self.nearest = 1
                    self.current = r
                    return r
                self.isr2.seek(doc_end.start())

    def next(self):
        self.isr1.next()
        self.isr2.next()
        return self._advance_to_match()

    def next_internal(self):
        if self.current is None:
            self.isr1.next_internal()
            self.isr2.next_internal()
            return self._advance_to_match()
        if self.nearest == 0:
            self.isr1.next_internal()
        else:
            self.isr2.next_internal()
        return self._advance_to_match()

    def seek(self, target: int):
        if self.current is not None and self.start_location() >= target:
            return self.current
        self.isr1.seek(target)
        self.isr2.seek(target)
        return self._advance_to_match()

    def get_current_post(self):
        return self.current

    def get_current_doc(self):
        if self.current is not None:
            return self.isr1.get_current_doc()
        return None

    def start_location(self) -> int:
        return self.current.start() if self.current is not None else 0

    def end_location(self) -> int:
        return self.current.end() if self.current is not None else 0

    def collect_terms(self, index, terms, seen) -> None:
        self.isr1.collect_terms(index, terms, seen)
        self.isr2.collect_terms(index, terms, seen)


class ISRContainerC:
    """ISRContainer (isr.cpp:408-512). With a null excluded stream every
    method returns None — the assert-off behavior of the reference csolver
    on NOT queries (see query/compile.py docstring)."""

    def __init__(self, included, excluded):
        self.isr1 = included
        self.isr2 = excluded  # NULL sentinel for the wire's null child
        self.current = None

    def _null(self) -> bool:
        return self.isr1 is NULL or self.isr2 is NULL or self.isr1 is None \
            or self.isr2 is None

    def _advance_to_match(self):
        while True:
            included = self.isr1.get_current_post()
            if included is None:
                self.current = None
                return None
            doc_end = self.isr1.get_current_doc()
            if doc_end is None:
                return None
            self.isr2.seek(doc_end.start())
            excluded = self.isr2.get_current_post()
            if (excluded is not None
                    and excluded.start() >= doc_end.start()
                    and excluded.start() < doc_end.end()):
                self.isr1.next()
                continue
            self.current = included
            return self.current

    def next(self):
        if self._null():
            return None
        if self.current is None:
            self.isr1.next()
            self.isr2.next()
            return self._advance_to_match()
        self.isr1.next()
        return self._advance_to_match()

    def next_internal(self):
        if self._null():
            return None
        if self.current is None:
            self.isr1.next_internal()
            self.isr2.next_internal()
            return self._advance_to_match()
        self.isr1.next_internal()
        return self._advance_to_match()

    def seek(self, target: int):
        if self.current is not None and self.start_location() >= target:
            return self.current
        if self._null():
            return None
        self.isr1.seek(target)
        return self._advance_to_match()

    def get_current_post(self):
        return self.current

    def get_current_doc(self):
        return self.isr1.get_current_doc() if self.isr1 is not NULL else None

    def start_location(self) -> int:
        return self.current.start() if self.current is not None else 0

    def end_location(self) -> int:
        return self.current.end() if self.current is not None else 0

    def collect_terms(self, index, terms, seen) -> None:
        if self.isr1 is not NULL and self.isr1 is not None:
            self.isr1.collect_terms(index, terms, seen)


class ISRPhraseC:
    """ISRPhrase (isr.cpp:516-652)."""

    def __init__(self, index, term_strings: list[str]):
        self.terms = [index.open_isr_word(t) for t in term_strings]
        self.current = None

    def _advance_to_match(self):
        while True:
            first = self.terms[0].get_current_post()
            if first is None:
                self.current = None
                return None
            base = first.start()
            match = True
            for i in range(1, len(self.terms)):
                expected = (base + i) & 0xFFFFFFFF
                self.terms[i].seek(expected)
                post = self.terms[i].get_current_post()
                if post is None or post.start() != expected:
                    self.terms[0].seek((base + 1) & 0xFFFFFFFF)
                    match = False
                    break
            if match:
                self.current = self.terms[0].get_current_post()
                return self.current

    def next_internal(self):
        if not self.terms:
            return None
        if self.current is None:
            for t in self.terms:
                t.next_internal()
            return self._advance_to_match()
        return self.seek((self.current.start() + 1) & 0xFFFFFFFF)

    def next(self):
        if not self.terms:
            return None
        if self.current is None:
            for t in self.terms:
                t.next()
            return self._advance_to_match()
        doc = self.terms[0].get_current_doc()
        if doc is None:
            return None
        return self.seek(doc.end() + 1)

    def get_current_doc(self):
        if not self.terms:
            return None
        if self.current is not None:
            return self.terms[0].get_current_doc()
        return None

    def seek(self, target: int):
        if self.current is not None and self.start_location() >= target:
            return self.current
        if not self.terms:
            self.current = None
            return None
        self.terms[0].seek(target)
        return self._advance_to_match()

    def get_current_post(self):
        return self.current

    def start_location(self) -> int:
        return self.current.start() if self.current is not None else 0

    def end_location(self) -> int:
        return self.current.end() if self.current is not None else 0

    def collect_terms(self, index, terms, seen) -> None:
        for t in self.terms:
            t.collect_terms(index, terms, seen)
