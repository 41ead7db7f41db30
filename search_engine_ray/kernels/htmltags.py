"""Tag-action table port of /root/reference/engine/parser/HtmlTags.{h,cpp}.

Behavioral quirk reproduced exactly (HtmlTags.cpp:33-60): an unknown tag of
length <= 20 (LongestTagLength) returns DISCARD — the binary-search
fallthrough — while a name longer than 20 chars returns ORDINARY_TEXT.
Comparison is case-insensitive, but the parser lowercases the whole buffer
first (HtmlParser.cpp:23-30,311) so keys arrive lowercase already.
"""

from __future__ import annotations

from enum import IntEnum


class Action(IntEnum):
    ORDINARY_TEXT = 0
    TITLE = 1
    COMMENT = 2
    DISCARD = 3
    DISCARD_SECTION = 4
    ANCHOR = 5
    BASE = 6
    EMBED = 7
    HTML = 8


LONGEST_TAG_LENGTH = 20

_SPECIAL = {
    b"!--": Action.COMMENT,
    b"a": Action.ANCHOR,
    b"base": Action.BASE,
    b"embed": Action.EMBED,
    b"html": Action.HTML,
    b"script": Action.DISCARD_SECTION,
    b"style": Action.DISCARD_SECTION,
    b"svg": Action.DISCARD_SECTION,
    b"title": Action.TITLE,
}

_DISCARD_TAGS = (
    b"!doctype abbr acronym address applet area article aside audio b "
    b"basefont bdi bdo bgsound big blink blockquote body br button canvas "
    b"caption center cite code col colgroup content data datalist dd del "
    b"details dfn dialog dir div dl dt em fieldset figcaption figure font "
    b"footer form frame frameset h1 h2 h3 h4 h5 h6 head header hgroup hr i "
    b"iframe img input ins isindex kbd keygen label legend li link listing "
    b"main map mark marquee menu menuitem meta meter nav nobr noframes "
    b"noscript object ol optgroup option output p param picture plaintext "
    b"pre progress q rp rt rtc ruby s samp section select shadow slot small "
    b"source spacer span strike strong sub summary sup table tbody td "
    b"template textarea tfoot th thead time tr track tt u ul var video wbr "
    b"xmp"
).split()

TAG_ACTIONS: dict[bytes, Action] = dict(_SPECIAL)
for _t in _DISCARD_TAGS:
    TAG_ACTIONS[_t] = Action.DISCARD


def lookup_tag(name: bytes) -> Action:
    """LookupPossibleTag (HtmlTags.cpp:33-60)."""
    if len(name) > LONGEST_TAG_LENGTH:
        return Action.ORDINARY_TEXT
    return TAG_ACTIONS.get(name, Action.DISCARD)
