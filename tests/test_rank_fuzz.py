"""Randomized rank conformance: random boolean/phrase expressions over the
fixture vocabulary, compiled by our compiler, decoded + ranked by the
reference C++ (single-thread harness), compared bit-for-bit against the
Python compat engine. Catches ISR/ranker edge cases the curated query set
misses."""

from __future__ import annotations

import os
import random
import struct
import subprocess

import pytest

from search_engine_ray.query import compile as qc
from search_engine_ray.query.compat_tree import build_chunks
from search_engine_ray.query.ranker_compat import rank_chunks
from tests.test_rank_conformance import (CHUNK_SIZE, _build_harness,
                                         canonical_corpus, parse_doc)

VOCAB = ["running", "children", "data", "national", "information", "word1",
         "word2", "word3", "unit", "object", "animal", "money", "the", "a",
         "happiness", "station", "dogs", "cats", "retrieval", "documents",
         "privacy", "go", "went", "xyznothing"]


def random_query(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if depth >= 3 or r < 0.45:
        if rng.random() < 0.15:
            k = rng.randint(2, 3)
            return '"' + " ".join(rng.choice(VOCAB) for _ in range(k)) + '"'
        return rng.choice(VOCAB)
    if r < 0.6:
        return f"{random_query(rng, depth + 1)} & {random_query(rng, depth + 1)}"
    if r < 0.75:
        return f"{random_query(rng, depth + 1)} | {random_query(rng, depth + 1)}"
    if r < 0.85:
        return f"-{random_query(rng, depth + 1)}"
    return f"({random_query(rng, depth + 1)})"


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_random_expressions_rank_identical(seed, tmp_path):
    exe = _build_harness()
    if exe is None:
        pytest.skip("no compiler / reference available")
    rng = random.Random(seed)
    queries = [random_query(rng) for _ in range(25)]
    synsets = qc.get_default_synsets()
    plans = [qc.compile_query(q, synsets) for q in queries]

    corpus = canonical_corpus()
    buf = bytearray()
    buf += struct.pack("<I", len(corpus))
    for url, html in corpus:
        u = url.encode()
        buf += struct.pack("<I", len(u)) + u
        buf += struct.pack("<I", len(html)) + html
    buf += struct.pack("<I", CHUNK_SIZE)
    sendable = [(i, p) for i, p in enumerate(plans) if p is not None]
    buf += struct.pack("<I", len(sendable))
    for _, plan in sendable:
        wire = qc.serialize(plan)
        buf += struct.pack("<I", len(wire)) + wire
    path = tmp_path / "input.bin"
    path.write_bytes(bytes(buf))
    out = subprocess.run([exe, str(path)], capture_output=True, timeout=600)
    assert out.returncode == 0, out.stderr[-1000:]

    ref: dict[int, list] = {}
    cur = None
    for line in out.stdout.split(b"\n"):
        if line.startswith(b"QUERY "):
            cur = sendable[int(line.split()[1])][0]
            ref[cur] = []
        elif line.startswith(b"R "):
            bits, url, title = line[2:].split(b"\t")
            ref[cur].append((int(bits, 16), url.decode(), title.decode()))
        elif line.startswith(b"ERROR"):
            ref[cur] = ("ERROR", line)

    docs = [parse_doc(u, h) for u, h in corpus]
    chunks = build_chunks(docs, chunk_size=CHUNK_SIZE)

    mismatches = []
    for qid, (query, plan) in enumerate(zip(queries, plans)):
        if plan is None:
            continue
        expect = ref[qid]
        assert not (expect and expect[0] == "ERROR"), (query, expect)
        got = rank_chunks(chunks, plan)
        mine = [(struct.unpack("<Q", struct.pack("<d", s))[0], u, t)
                for u, t, s in got]
        if mine != expect:
            mismatches.append((query, expect[:2], mine[:2]))
    assert not mismatches, mismatches[:3]
