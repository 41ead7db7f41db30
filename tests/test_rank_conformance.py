"""Rank-identity gate: the Python compat engine (ISR algebra + ranker
ports) must reproduce the REFERENCE C++ indexer+csolver+ranker output
bit-for-bit — same top-k urls, titles, and float64 score bits — on the
reference query set over the adversarial fixture corpus, across multiple
chunks (tests the 100-doc cutoff, 200-doc chunk cap, and descending merge).

The C++ side is tests/tools/ref_rank_harness.cpp: reference translation
units compiled unmodified, driven single-threaded (the deterministic
semantics — see the harness header). Queries travel as OUR compiler's wire
bytes and are decoded by the reference Expr_AST, so this also pins the
compiler's wire format.
"""

from __future__ import annotations

import os
import struct
import subprocess

import pytest

from search_engine_ray.kernels.htmlparser import HtmlParser
from search_engine_ray.kernels.stemmer import stem
from search_engine_ray.query import compile as qc
from search_engine_ray.query.compat_tree import build_chunks
from search_engine_ray.query.ranker_compat import rank_chunks
from search_engine_ray.query.refqueries import FIXTURE_QUERIES as REF_QUERIES
from search_engine_ray.sources.fixtures import gen_pages

TOOLS = os.path.join(os.path.dirname(__file__), "tools")
CHUNK_SIZE = 100


def _build_harness():
    exe = os.path.join(TOOLS, "ref_rank_harness")
    if os.path.exists(exe):
        return exe
    import shutil
    if shutil.which("g++") is None or not os.path.isdir("/root/reference"):
        return None
    cmd = ["g++", "-O2", "-std=c++17", "-pthread", "-DNDEBUG",
           "-I/root/reference/engine", "-I/root/reference/engine/csolver",
           "-o", exe, os.path.join(TOOLS, "ref_rank_harness.cpp"),
           "/root/reference/engine/csolver/isr.cpp",
           "/root/reference/engine/csolver/ast.cpp",
           "/root/reference/engine/ranker/Ranker.cpp",
           "/root/reference/engine/parser/HtmlParser.cpp",
           "/root/reference/engine/parser/HtmlTags.cpp",
           "/root/reference/engine/lib/stemmer/stemmer.cpp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return exe


def canonical_corpus(n_pages=300):
    """Unique urls (first occurrence), sorted by url — the canonical doc
    order (SURVEY.md §4.4)."""
    t = gen_pages(n_pages)
    seen = {}
    for url, html in zip(t.column("url").to_pylist(),
                         t.column("html").to_pylist()):
        if url not in seen:
            seen[url] = html
    return sorted(seen.items())


def parse_doc(url: str, html: bytes) -> dict:
    p = HtmlParser(html)

    def dec(b: bytes) -> str:
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError:
            return b.decode("latin-1")

    tterms = []
    for w in p.title_words:
        s = stem(dec(w))
        if s:
            tterms.append("@" + s)
    bterms, bflags = [], []
    for w, fl in p.words_flags:
        s = stem(dec(w))
        if s:
            bterms.append(s)
            bflags.append(fl)
    return {
        "url": url,
        "title": dec(p.title_chunk),
        "title_terms": tterms,
        "body_terms": bterms,
        "body_flags": bflags,
        "word_count": len(p.title_words) + len(p.words_flags),
        "title_length": len(p.title_words),
        "english": p.english,
    }


GOLDEN_RANK = os.path.join(os.path.dirname(__file__), "golden",
                           "rank_golden.json")


def _load_golden():
    import json
    if not os.path.exists(GOLDEN_RANK):
        return None
    with open(GOLDEN_RANK) as f:
        raw = json.load(f)
    return {int(k): [tuple(x) for x in v] for k, v in raw.items()}


def _save_golden(ref_results):
    import json
    with open(GOLDEN_RANK, "w") as f:
        json.dump({str(k): v for k, v in ref_results.items()}, f)


@pytest.fixture(scope="module", params=[CHUNK_SIZE, 10],
                ids=["chunk100", "chunk10"])
def conformance(request, tmp_path_factory):
    chunk_size = request.param
    exe = _build_harness()
    corpus = canonical_corpus()
    synsets = qc.get_default_synsets()
    plans = [qc.compile_query(q, synsets) for q in REF_QUERIES]
    if exe is None:
        if chunk_size != CHUNK_SIZE:
            pytest.skip("no compiler for the extra chunk size")
        golden = _load_golden()
        if golden is None:
            pytest.skip("no compiler / reference / golden available")
        return corpus, plans, golden, chunk_size

    # binary input file for the harness
    buf = bytearray()
    buf += struct.pack("<I", len(corpus))
    for url, html in corpus:
        u = url.encode()
        buf += struct.pack("<I", len(u)) + u
        buf += struct.pack("<I", len(html)) + html
    buf += struct.pack("<I", chunk_size)
    sendable = [(i, p) for i, p in enumerate(plans) if p is not None]
    buf += struct.pack("<I", len(sendable))
    for _, plan in sendable:
        wire = qc.serialize(plan)
        buf += struct.pack("<I", len(wire)) + wire

    path = tmp_path_factory.mktemp("rank") / "input.bin"
    path.write_bytes(bytes(buf))
    out = subprocess.run([exe, str(path)], capture_output=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    # parse harness output
    ref_results: dict[int, list] = {}
    cur = None
    for line in out.stdout.split(b"\n"):
        if line.startswith(b"QUERY "):
            cur = sendable[int(line.split()[1])][0]
            ref_results[cur] = []
        elif line.startswith(b"R "):
            bits_hex, url, title = line[2:].split(b"\t")
            ref_results[cur].append(
                (int(bits_hex, 16), url.decode(), title.decode()))
        elif line.startswith(b"ERROR"):
            ref_results[cur] = ("ERROR", line.decode("latin-1"))
    if chunk_size == CHUNK_SIZE and not os.path.exists(GOLDEN_RANK):
        _save_golden(ref_results)
    return corpus, plans, ref_results, chunk_size


def test_rank_identity(conformance):
    corpus, plans, ref_results, chunk_size = conformance
    docs = [parse_doc(u, h) for u, h in corpus]
    chunks = build_chunks(docs, chunk_size=chunk_size)

    checked = 0
    mismatches = []
    for qid, (query, plan) in enumerate(zip(REF_QUERIES, plans)):
        if plan is None:
            assert qid not in ref_results
            continue
        expect = ref_results[qid]
        assert not (expect and expect[0] == "ERROR"), (query, expect)
        got = rank_chunks(chunks, plan)
        mine = [(struct.unpack("<Q", struct.pack("<d", score))[0], url, title)
                for url, title, score in got]
        if mine != expect:
            mismatches.append((query, expect[:3], mine[:3]))
        checked += 1
    assert checked >= 20
    assert not mismatches, mismatches[:3]


def test_reference_set_has_nonempty_results(conformance):
    corpus, plans, ref_results, chunk_size = conformance
    nonempty = sum(1 for v in ref_results.values()
                   if v and v[0] != "ERROR")
    assert nonempty >= 10  # the fixture vocabulary must actually hit
