"""S7 results sinks: the user-facing surfaces the reference serves.

- ``build_search_html``: exact port of the served results page
  (engine/server/RootPlugin.h:124-214 BuildSearchHTML). Faithful to the
  reference byte-for-byte — including that it performs NO HTML escaping
  of urls/titles (a reference behavior, preserved deliberately; see the
  conformance test). Pinned against the compiled reference member
  function by tests/test_results_sink.py via
  tests/tools/ref_html_harness.cpp.
- ``serialize_results_wire`` / ``parse_results_wire``: the csolver→front
  end result wire format (engine/csolver/csolver.cpp:56-81 and
  query/query.cpp:706-737): u32 count (network order), then per result
  url LF title LF and the raw score double bits in network order.
"""

from __future__ import annotations

import struct

import pyarrow as pa

_HTML_HEAD = (
    '<!DOCTYPE html><html lang="en"><head><meta charset="UTF-8" />'
    '<meta name="viewport" content="width=device-width, initial-scale=1.0" />'
    "<title>Search Results</title>"
    '<link href="https://fonts.googleapis.com/css2?family=Inter&display=swap" rel="stylesheet">'
    "<style>"
    "body {"
    "  margin: 0;"
    "  font-family: 'Segoe UI', Tahoma, Geneva, Verdana, sans-serif;"
    "  background-color: #f7f7f7;"
    "  display: flex;"
    "  justify-content: center;"
    "  padding: 40px;"
    "}"
    ".container {"
    "  text-align: center;"
    "  max-width: 800px;"
    "  width: 100%;"
    "}"
    "h1 {"
    "  font-size: 2.5rem;"
    "  margin-bottom: 2rem;"
    "}"
    "ul {"
    "  list-style-type: none;"
    "  padding: 0;"
    "}"
    "li {"
    "  margin: 15px 0;"
    "  font-size: 1.1rem;"
    "  background: white;"
    "  padding: 15px 20px;"
    "  border-radius: 8px;"
    "  box-shadow: 0 2px 5px rgba(0, 0, 0, 0.05);"
    "  transition: transform 0.1s ease;"
    "}"
    "li:hover {"
    "  transform: translateY(-2px);"
    "}"
    "a {"
    "  text-decoration: none;"
    "  color: #007BFF;"
    "  display: block;"
    "}"
    "a:hover {"
    "  text-decoration: underline;"
    "}"
    ".back-link {"
    "  display: inline-block;"
    "  margin-top: 2rem;"
    "  font-size: 1rem;"
    "  color: #007BFF;"
    "  text-decoration: none;"
    "}"
    ".back-link:hover {"
    "  text-decoration: underline;"
    "}"
    ".logo {"
    "    position: fixed;"
    "    top: 0px;"
    "    left: 75px;"
    "    width: 200px;"
    "    height: 200px;"
    "    z-index: 999;"
    "  }"
    '</style></head><body><div class="container">'
    "<h1>Search Results</h1>"
    '<img src="/logo.svg" alt="Logo" class="logo">'
    '<a class="back-link" href="/">Back to Home</a>'
    "<br>"
    "<ul>"
)

_HTML_TAIL = "</ul></div></body></html>"


def _iter_results(results) -> list[tuple[str, str, float]]:
    """(url, title, score) triples from a pa.Table (url/title[/score]
    columns) or an iterable of triples."""
    if isinstance(results, pa.Table):
        urls = results.column("url").to_pylist()
        titles = (results.column("title").to_pylist()
                  if "title" in results.column_names else urls)
        scores = (results.column("score").to_pylist()
                  if "score" in results.column_names else [0.0] * len(urls))
        return list(zip(urls, titles, scores))
    return [(u, t, s) for u, t, s in results]


def build_search_html(results, escape: bool = False) -> str:
    """RootPlugin::BuildSearchHTML (RootPlugin.h:124-214), byte-exact
    when ``escape=False`` (the conformance target — the reference does
    not escape). The live HTTP serve path passes ``escape=True``:
    interpolating corpus-controlled url/title unescaped is a stored-XSS
    vector that conformance tests should pin but a real server must not
    ship."""
    import html as _html

    esc = _html.escape if escape else (lambda s, quote=True: s)
    parts = [_HTML_HEAD]
    for url, title, _score in _iter_results(results):
        parts.append(f'<li><a href="{esc(url)}" target="_blank">'
                     f'{esc(title)}</a></li>')
    parts.append(_HTML_TAIL)
    return "".join(parts)


def serialize_results_wire(results) -> bytes:
    """CSolver::serialize_results (csolver.cpp:56-81)."""
    triples = _iter_results(results)
    out = [struct.pack("!I", len(triples))]
    for url, title, score in triples:
        out.append(url.encode() + b"\n" + title.encode() + b"\n")
        out.append(struct.pack("!Q",
                               struct.unpack("<Q",
                                             struct.pack("<d", score))[0]))
    return b"".join(out)


def parse_results_wire(data: bytes) -> list[tuple[str, str, float]]:
    """read_results_from_socket (query.cpp:706-737)."""
    (count,) = struct.unpack_from("!I", data, 0)
    pos = 4
    out = []
    for _ in range(count):
        nl1 = data.index(b"\n", pos)
        url = data[pos:nl1].decode()
        nl2 = data.index(b"\n", nl1 + 1)
        title = data[nl1 + 1:nl2].decode()
        (bits,) = struct.unpack_from("!Q", data, nl2 + 1)
        score = struct.unpack("<d", struct.pack("<Q", bits))[0]
        out.append((url, title, score))
        pos = nl2 + 9
    return out
