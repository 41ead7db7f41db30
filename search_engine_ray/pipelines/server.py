"""S7 serving surface: the reference front-end's HTTP routes over the
Ray-backed engine.

Routing ports RootPlugin::ProcessRequest (engine/server/RootPlugin.h:
88-121): ``/search?q=<raw>`` → lowercase the RAW query substring (no
HTTP decode — the query compiler applies the reference's own url_decode,
query.cpp M7) → rank → BuildSearchHTML; ``/`` → index page; anything
else falls through to the index (the reference serves index.html);
``/logo.svg`` → 404 here (the asset is not vendored).

The transport is stdlib ThreadingHTTPServer instead of the reference's
hand-rolled LinuxTinyServer — the response BODY for /search is the
byte-pinned BuildSearchHTML port (pipelines/results_sink.py).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .results_sink import build_search_html

_INDEX_HTML = (
    '<!DOCTYPE html><html lang="en"><head><meta charset="UTF-8" />'
    "<title>Search</title></head><body>"
    '<form action="/search" method="get">'
    '<input name="q" autofocus /><button type="submit">Search</button>'
    "</form></body></html>"
)


class _Handler(BaseHTTPRequestHandler):
    engine = None  # injected by serve()
    k = 10

    def log_message(self, fmt, *args):  # quiet
        pass

    def _respond(self, status: int, body: bytes,
                 ctype: str = "text/html") -> None:
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        path = self.path
        if path.startswith("/search?q="):
            # RootPlugin.h:97-101 — raw substring, lowercased; the query
            # compiler performs the reference url_decode itself
            query = path[10:].lower()
            results = self.engine.search(query, k=self.k)
            # escape=True on the live surface: corpus-controlled
            # url/title must not inject markup (the unescaped variant
            # exists only as the byte-pinned conformance target)
            self._respond(200,
                          build_search_html(results, escape=True).encode())
        elif path == "/logo.svg":
            self._respond(404, b"")
        else:
            self._respond(200, _INDEX_HTML.encode())


def serve(engine, host: str = "127.0.0.1", port: int = 0, k: int = 10
          ) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start serving ``engine`` (a SearchEngine) in a daemon thread.
    Returns (server, thread); ``server.server_address[1]`` is the bound
    port (ephemeral when port=0). Call ``server.shutdown()`` to stop."""
    handler = type("BoundHandler", (_Handler,), {"engine": engine, "k": k})
    srv = ThreadingHTTPServer((host, port), handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    return srv, thread
