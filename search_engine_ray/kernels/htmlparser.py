"""Exact port of the reference HTML tokenizer/extractor.

Reference: /root/reference/engine/parser/HtmlParser.{h,cpp}. This is the
byte-identical-text invariant of the whole build: for every page,
``" ".join(titleWords) + "\\n" + " ".join(body words)`` must equal the
output of the C++ parser compiled unmodified (tests/test_htmlparser.py).

Semantics reproduced (file:line refs into HtmlParser.cpp):
- whole-buffer ASCII lowercase before parsing, A-Z only (:23-30,311)
- word breaks at {space, \\t, \\n, \\r} and tags (:32-34, :243-277)
- <script>/<style>/<svg> section discard; exit only at the literal matching
  closing tag, else EOF (:279-307,343-355)
- <!-- comment skip to --> else EOF (:111-116)
- <title>/<a href>/<base href>/<embed src>/<html lang=..> special cases
  (:117-165,223-236); first <base> only; anchor text capture
- <b>/<h1..h6> set flag bits — including on *closing* tags seen while the
  corresponding in_* flag is off, because the tag name is '/'-stripped
  before the check (:79-94): a stray </b> turns bold ON
- unknown tags <=20 chars are discarded (HtmlTags.cpp:60 fallthrough);
  >20 chars hit the broken-HTML recovery path (:166-222): an unclosed tag
  is merged with the preceding word (popping it) and parsing resumes as
  text; a closed unknown long tag is split into words including the <>
- closing recognized tags skip to '>' (:97-103)

C-string caveat: the reference scans with strchr/NUL-termination, so an
embedded NUL byte effectively ends the document (and can hang the C++ main
loop). We truncate at the first NUL.

This port is find()-based rather than char-by-char so the hot loops run at
C speed inside bytes.find / re.split; per-tag work is Python but tags are
sparse relative to text.
"""

from __future__ import annotations

import re
from itertools import repeat as _repeat
from dataclasses import dataclass, field

from .htmltags import Action, lookup_tag

_WS = frozenset(b" \t\n\r")
_WS_RE = re.compile(rb"[ \t\n\r]+")
_GT = 0x3E  # '>'
_LT = 0x3C  # '<'

_HEADINGS = frozenset((b"h1", b"h2", b"h3", b"h4", b"h5", b"h6"))
_CLOSING_NEEDLE = {b"script": b"</script>", b"style": b"</style>",
                   b"svg": b"</svg>"}


def convert_flags(in_bold: bool, in_heading: bool, in_large_font: bool) -> int:
    """HtmlParser.cpp:36-42 — bit0 bold, bit1 heading, bit2 large font."""
    flags = 0
    if in_bold:
        flags |= 0x01
    if in_heading:
        flags |= 0x02
    if in_large_font:
        flags |= 0x04
    return flags


def _extract_attribute(content: bytes, attribute: bytes) -> bytes:
    """ExtractAttribute (HtmlParser.cpp:44-55): value of attr="..."."""
    key = attribute + b'="'
    start = content.find(key)
    if start != -1:
        start += len(key)
        end = content.find(b'"', start)
        if end != -1:
            return content[start:end]
    return b""


@dataclass
class Link:
    url: bytes
    anchor: list[bytes] = field(default_factory=list)


class HtmlParser:
    """Parse ``data`` (raw page bytes); results in attributes afterwards."""

    __slots__ = ("b", "n", "words_flags", "title_words", "links", "base",
                 "english", "title_chunk", "in_title", "in_anchor", "in_bold",
                 "in_heading", "in_discard", "tag_discarding", "current_link")

    def __init__(self, data: bytes):
        nul = data.find(b"\x00")
        if nul != -1:
            data = data[:nul]
        self.b = data.lower()  # bytes.lower touches only ASCII A-Z
        self.n = len(self.b)
        self.words_flags: list[tuple[bytes, int]] = []
        self.title_words: list[bytes] = []
        self.links: list[Link] = []
        self.base = b""
        self.english = True
        self.in_title = False
        self.in_anchor = False
        self.in_bold = False
        self.in_heading = False
        self.in_discard = False
        self.tag_discarding = b""
        self.current_link = b""
        self._run()
        self.title_chunk = b" ".join(self.title_words)

    # ------------------------------------------------------------------
    def _run(self) -> None:
        b, n = self.b, self.n
        i = 0
        while i is not None and 0 <= i < n:
            if b[i] == _LT:
                nxt = b[i + 1:i + 2]
                if nxt == b"/" and self.in_title and b[i + 2:i + 7] == b"title":
                    self.in_title = False
                    i = self._skip_past_gt_or_die(i)
                elif nxt == b"/" and self.in_anchor and b[i + 2:i + 3] == b"a":
                    self.in_anchor = False
                    i = self._skip_past_gt_or_die(i)
                elif (nxt == b"/" and self.in_heading and b[i + 2:i + 3] == b"h"
                      and b"1" <= b[i + 3:i + 4] <= b"6"):
                    self.in_heading = False
                    i = self._skip_past_gt_or_die(i)
                elif nxt == b"/" and self.in_bold and b[i + 2:i + 3] == b"b":
                    self.in_bold = False
                    i = self._skip_past_gt_or_die(i)
                elif self.in_discard:
                    # FindFirstClosingTag (HtmlParser.cpp:279-307,343-355)
                    needle = _CLOSING_NEEDLE.get(self.tag_discarding)
                    pos = b.find(needle, i) if needle else -1
                    if pos == -1:
                        break  # EOF inside discard section
                    i = pos + len(needle)
                    self.in_discard = False
                else:
                    i = self._parse_tag(i)
            else:
                if not self.in_discard:
                    i = self._parse_text(i)
                else:
                    # skip to the next '<' (char-wise in C, same outcome)
                    pos = b.find(b"<", i)
                    i = pos if pos != -1 else n

    def _skip_past_gt_or_die(self, i: int):
        """``ptr = strchr(ptr, '>') + 1`` — NULL ends the parse
        (HtmlParser.cpp:320-341)."""
        j = self.b.find(b">", i)
        return None if j == -1 else j + 1

    # ------------------------------------------------------------------
    def _parse_text(self, i: int) -> int:
        """ParseText (HtmlParser.cpp:243-277), vectorized via re.split."""
        b = self.b
        lt = b.find(b"<", i)
        if lt == -1:
            lt = self.n
        seg = b[i:lt]
        if seg:
            words = [w for w in _WS_RE.split(seg) if w]
            if words:
                if self.in_anchor and self.current_link:
                    self.links[-1].anchor.extend(words)
                if self.in_title:
                    self.title_words.extend(words)
                else:
                    flags = convert_flags(self.in_bold, self.in_heading, False)
                    self.words_flags.extend(
                        zip(words, _repeat(flags, len(words))))
        return lt

    # ------------------------------------------------------------------
    def _parse_tag(self, i: int):
        """ParseTag (HtmlParser.cpp:68-241). Returns the new index, or None
        for the unterminated-<embed> nullptr case."""
        b, n = self.b, self.n
        i += 1
        while i < n and b[i] in _WS:
            i += 1
        start = i
        while i < n and b[i] not in _WS and b[i] != _GT:
            i += 1
        tag = b[start:i]
        is_closing = b[start:start + 1] == b"/"
        if is_closing:
            tag = b[start + 1:i]
        if tag.endswith(b"/"):
            tag = tag[:-1]

        action = lookup_tag(tag)

        if tag == b"b":
            self.in_bold = True
        elif tag in _HEADINGS:
            self.in_heading = True

        # recognized closing tag: just skip it (HtmlParser.cpp:97-103)
        if is_closing and action != Action.ORDINARY_TEXT:
            j = b.find(b">", i)
            return j + 1 if j != -1 else n

        if action == Action.DISCARD_SECTION:
            self.tag_discarding = tag
            self.in_discard = True
        elif action == Action.COMMENT:
            j = b.find(b"-->", i)
            return j + 3 if j != -1 else n
        elif action == Action.TITLE:
            self.in_title = True
        elif action == Action.ANCHOR:
            # quote-aware scan for the closing '>' (HtmlParser.cpp:120-148)
            tag_end = i
            in_quotes = False
            while tag_end < n:
                c = b[tag_end]
                if c == 0x22:  # '"'
                    in_quotes = not in_quotes
                elif c == _GT and not in_quotes:
                    break
                tag_end += 1
            if tag_end < n and b[tag_end] == _GT:
                href_pos = self._find_href(i, tag_end)
                if href_pos is not None:
                    end_quote = b.find(b'"', href_pos)
                    if end_quote != -1 and end_quote < tag_end:
                        href = b[href_pos:end_quote]
                        if href:
                            self.links.append(Link(href))
                            self.current_link = href
                            self.in_anchor = True
            i = tag_end
        elif action == Action.BASE:
            if not self.base:
                end_ptr = b.find(b">", i)
                if end_ptr != -1:
                    e = end_ptr
                    if b[e - 1:e] == b"/":
                        e -= 1
                    self.base = _extract_attribute(b[i:e], b"href")
                else:
                    # C++ would pass a nullptr-derived length here (UB); we
                    # scan the remainder instead of crashing.
                    self.base = _extract_attribute(b[i:], b"href")
        elif action == Action.EMBED:
            end_ptr = b.find(b">", i)
            if end_ptr == -1:
                return None  # ptr = nullptr (HtmlParser.cpp:158-160)
            src = _extract_attribute(b[i:end_ptr], b"src")
            if src:
                self.links.append(Link(src))
        elif action == Action.ORDINARY_TEXT:
            return self._broken_html(start, i)
        elif action == Action.HTML:
            # scan for lang="xx" before the closing '>' (HtmlParser.cpp:223-236)
            p_lang = b.find(b'lang="', i)
            p_gt = b.find(b">", i)
            limit = p_gt if p_gt != -1 else n
            if p_lang != -1 and p_lang < limit:
                self.english = b[p_lang + 6:p_lang + 8] == b"en"
                i = p_lang + 8
            else:
                i = limit
        # fallthrough for Discard and the non-returning branches above:
        j = b.find(b">", i)
        return j + 1 if j != -1 else n

    def _find_href(self, i: int, tag_end: int):
        """FindHrefAttribute (HtmlParser.cpp:57-66)."""
        b = self.b
        next_h = b.find(b"h", i)
        while next_h != -1 and next_h < tag_end:
            if b[next_h:next_h + 6] == b'href="':
                return next_h + 6
            next_h = b.find(b"h", next_h + 1)
        return None

    def _broken_html(self, start: int, i: int):
        """OrdinaryText recovery (HtmlParser.cpp:166-222): only reachable
        for unknown tag names longer than 20 chars."""
        b, n = self.b, self.n
        tag_start = start - 1  # the '<'
        next_lt = b.find(b"<", i)
        next_gt = b.find(b">", i)

        if next_gt == -1 or (next_lt != -1 and next_lt < next_gt):
            # unclosed tag: merge with the preceding word
            low_bound = max(i - (n - i), 0)  # C: ptr - strlen(ptr), clamped
            lb = tag_start - 1
            while lb >= low_bound and b[lb] not in _WS and b[lb] != _LT:
                lb -= 1
            lb += 1
            if self.words_flags and lb < tag_start:
                combined = b[lb:i]
                self.words_flags.pop()
            else:
                combined = b[tag_start:i]
            if self.in_anchor and self.current_link:
                if self.links[-1].anchor:
                    self.links[-1].anchor.pop()
                self.links[-1].anchor.append(combined)
            if self.in_title:
                self.title_words.append(combined)
            else:
                self.words_flags.append(
                    (combined,
                     convert_flags(self.in_bold, self.in_heading, False)))
            return self._parse_text(i)
        else:
            unrecognized = b[tag_start:next_gt + 1]
            # istringstream >> splits on isspace (" \t\n\r\v\f") == bytes.split
            words = unrecognized.split()
            if self.in_title:
                self.title_words.extend(words)
            else:
                flags = convert_flags(self.in_bold, self.in_heading, False)
                self.words_flags.extend((w, flags) for w in words)
            return next_gt + 1

    # ------------------------------------------------------------------
    def extracted_text(self) -> bytes:
        """The golden per-row invariant (FIXTURES.md §1):
        title words joined, newline, body words joined."""
        return (b" ".join(self.title_words) + b"\n"
                + b" ".join(w for w, _ in self.words_flags))
