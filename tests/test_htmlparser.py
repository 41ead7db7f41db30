"""HTML parser conformance: byte-identical dumps vs the reference C++
(compiled unmodified) and vs committed golden hashes."""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

import pytest

from search_engine_ray.kernels.htmlparser import HtmlParser
from search_engine_ray.sources.fixtures import gen_pages

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "parse_hashes.tsv")


def dump(p: HtmlParser) -> bytes:
    """Same format as tests/tools/ref_parse_dumper.cpp."""
    out: list[bytes] = []
    out.append(b"ENGLISH %d" % (1 if p.english else 0))
    out.append(b"BASE " + p.base)
    out.append(b"TITLE %d" % len(p.title_words))
    out.extend(p.title_words)
    out.append(b"BODY %d" % len(p.words_flags))
    out.extend(b"%d " % f + w for w, f in p.words_flags)
    out.append(b"LINKS %d" % len(p.links))
    for link in p.links:
        out.append(b"URL " + link.url + b" %d" % len(link.anchor))
        out.extend(link.anchor)
    out.append(b"TITLECHUNK " + p.title_chunk)
    return b"\n".join(out) + b"\n"


@pytest.fixture(scope="module")
def fixture_htmls():
    return gen_pages(400).column("html").to_pylist()


def test_basic_extraction():
    p = HtmlParser(b"<html lang=\"en\"><title>My Page</title>"
                   b"<body><h1>Big News</h1>some <b>bold</b> text"
                   b"<a href=\"http://x.com/\">click here</a></body></html>")
    assert p.title_words == [b"my", b"page"]
    assert p.title_chunk == b"my page"
    assert [w for w, _ in p.words_flags] == [
        b"big", b"news", b"some", b"bold", b"text", b"click", b"here"]
    flags = dict(p.words_flags)
    assert flags[b"big"] == 0x02 and flags[b"bold"] == 0x01
    assert p.links[0].url == b"http://x.com/"
    assert p.links[0].anchor == [b"click", b"here"]
    assert p.english


def test_discard_sections_and_comments():
    p = HtmlParser(b"a <script>hidden words</script> b "
                   b"<!-- no words --> c <style>x{}</style> d")
    assert [w for w, _ in p.words_flags] == [b"a", b"b", b"c", b"d"]


def test_lang_sniff():
    assert not HtmlParser(b'<html lang="de">wort</html>').english
    assert HtmlParser(b'<html lang="en-US">word</html>').english
    assert HtmlParser(b"<html>word</html>").english


def test_stray_closing_b_enables_bold():
    # quirk: tag name is '/'-stripped before the inBold check
    p = HtmlParser(b"one </b> two")
    assert p.words_flags == [(b"one", 0), (b"two", 1)]


def test_unknown_short_tag_discarded_long_tag_text():
    p = HtmlParser(b"x <foo> y <thistagnameisverylongindeed> z")
    words = [w for w, _ in p.words_flags]
    assert b"x" in words and b"y" in words and b"z" in words
    assert b"<thistagnameisverylongindeed>" in words  # OrdinaryText path


def test_golden_hashes(fixture_htmls):
    assert os.path.exists(GOLDEN), "run tests/tools/gen_goldens.py first"
    hashes = {}
    with open(GOLDEN) as f:
        for line in f:
            idx, _, h = line.rstrip("\n").partition("\t")
            hashes[int(idx)] = h
    assert len(hashes) == len(fixture_htmls)
    for idx, html in enumerate(fixture_htmls):
        mine = hashlib.sha256(dump(HtmlParser(html))).hexdigest()
        assert mine == hashes[idx], f"page {idx} diverged from reference"


def test_against_compiled_reference(ref_parse_dumper, fixture_htmls):
    if ref_parse_dumper is None:
        pytest.skip("no compiler / reference available")
    for idx, html in enumerate(fixture_htmls[:100]):
        with tempfile.NamedTemporaryFile(delete=False) as tf:
            tf.write(html)
            path = tf.name
        ref = subprocess.run([ref_parse_dumper, path], capture_output=True,
                             timeout=30).stdout
        os.unlink(path)
        assert dump(HtmlParser(html)) == ref, f"page {idx}"
