"""Stemmer conformance: Python port vs committed goldens and (when a
compiler is available) vs the reference C++ compiled unmodified."""

from __future__ import annotations

import os
import random
import subprocess

import pytest

from search_engine_ray.kernels.stemmer import stem, STOPWORDS

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "stems.tsv")


def build_vocab() -> list[str]:
    words = set()
    synsets = "/root/reference/query/synsets.txt"
    if os.path.exists(synsets):
        with open(synsets) as f:
            for line in f:
                for w in line.strip().split(";"):
                    for t in w.split(" "):
                        if t:
                            words.add(t.lower())
    rng = random.Random(42)
    words.update([
        "running", "flies", "cried", "hopping", "hoping", "luxuriating",
        "rational", "national", "organization", "generously", "happily",
        "past", "fastest", "bigger", "data,", "children", "'twas", "cats",
        "gas", "this", "kiwis", "gaps", "ties", "cries", "agreed", "feed",
        "abyss", "news.", "it;", "dying", "saying", "lying", "by", "say",
        "cry", "ws", "us", "buzz", "yellow", "yoyo", "sayy", "...", "",
    ])
    for _ in range(2000):
        n = rng.randint(1, 12)
        words.add("".join(rng.choice("abcdefghijklmnopqrstuvwxyz'")
                          for _ in range(n)))
    base = sorted(words)[:400]
    for _ in range(800):
        words.add(rng.choice(base) + rng.choice(
            [".", ",", ";", "'s", "'s'", "ing", "ed", "ly", "er", "est",
             "s", "ies", "ational", "ization", "fulness", "iveness"]))
    return sorted(w for w in words if w and "\n" not in w)


def test_stopwords_stem_to_empty():
    for w in STOPWORDS:
        assert stem(w) == ""


def test_known_quirks():
    # declaration-order rule application: "tional" wins over "ational"
    assert stem("rational") == "ration"
    # exceptions map
    assert stem("children") == "child"
    assert stem("buses") == "bus"
    # trailing punct strip then stopword
    assert stem("the.") == ""
    # <3 chars unchanged
    assert stem("ab") == "ab"
    # ws/us phase1a no-ops
    assert stem("ws") == "ws"
    # phase6 er/est strip
    assert stem("fastest") == "fast"


def test_golden_file():
    assert os.path.exists(GOLDEN), "run tests/tools/gen_goldens.py first"
    with open(GOLDEN) as f:
        for line in f:
            word, _, expect = line.rstrip("\n").partition("\t")
            assert stem(word) == expect, f"stem({word!r})"


def test_against_compiled_reference(ref_stem_dumper):
    if ref_stem_dumper is None:
        pytest.skip("no compiler / reference available")
    vocab = build_vocab()
    out = subprocess.run([ref_stem_dumper], input="\n".join(vocab) + "\n",
                         capture_output=True, text=True, check=True)
    refs = out.stdout.split("\n")
    mismatches = [(w, refs[i], stem(w)) for i, w in enumerate(vocab)
                  if stem(w) != refs[i]]
    assert not mismatches, mismatches[:10]
