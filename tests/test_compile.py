"""Query compiler unit tests (tokenize / parse / optimize / serialize).
Wire-level conformance vs the C++ Expr_AST decoder is covered by the rank
harness test (test_rank_conformance.py)."""

from __future__ import annotations

import struct

from search_engine_ray.query import compile as qc


def test_tokenize_operators_and_phrases():
    assert qc.tokenize("a & b") == ["a", "&", "b"]
    assert qc.tokenize("a&b") == ["a", "&", "b"]
    assert qc.tokenize('a "x y" -b') == ["a", "$x y", "-", "b"]
    assert qc.tokenize("(a|b)") == ["(", "a", "|", "b", ")"]
    # escapes: backslash escapes the next char in DEFAULT mode
    assert qc.tokenize(r"a\&b") == ["a&b"]
    # '>' and '$' get escaped into the token
    assert qc.tokenize("a>b") == ["a\\>b"]


def test_parse_implicit_and():
    tree = qc.compile_query("fast table", synsets=None)
    assert isinstance(tree, qc.And)


def test_word_decoration_quirk():
    tree = qc.compile_query("children", synsets=None)
    # OR(@-leaf, original); the @-leaf stems '@children' (NOT '@child')
    assert isinstance(tree, qc.Or)
    assert tree.left.term == "@children"
    assert tree.left.stem_ == "@children"  # exceptions map missed due to '@'
    assert tree.right.stem_ == "child"


def test_phrase_decoration_uses_stems():
    tree = qc.compile_query('"running dogs"', synsets=None)
    assert isinstance(tree, qc.Or)
    dec, orig = tree.left, tree.right
    assert isinstance(dec, qc.Phrase) and isinstance(orig, qc.Phrase)
    assert dec.stems == ["@run", "@dog"]  # '@' + stem → matches index keys
    assert orig.stems == ["run", "dog"]


def test_stopword_queries_collapse():
    assert qc.compile_query("the", synsets=None) is None
    tree = qc.compile_query("fast & the", synsets=None)
    # the stopword side optimizes away; AND collapses to the other child
    assert isinstance(tree, qc.Or)  # the decorated 'fast' leaf


def test_synonym_chain_shape():
    # same-stem synonyms are skipped (query.cpp:117-119) → no chain
    assert isinstance(
        qc.compile_query("fast", synsets={"fast": [["fast", "fasting"]]}),
        qc.SynOr)
    synsets = {"fast": [["fast", "rapid", "speedy"]]}
    tree = qc.compile_query("fast", synsets=synsets)
    assert isinstance(tree, qc.SynOr)
    assert tree.ratio_term == 2 and tree.ratio_rest == 1
    assert isinstance(tree.left, qc.Or)  # decorated original
    assert isinstance(tree.rest, qc.SynOr)
    # stack pops reverse push order: 'speedy' first in the chain
    assert tree.rest.left.right.term == "speedy"
    assert tree.rest.rest.left.right.term == "rapid"
    assert tree.rest.ratio_term == 1


def test_serialize_wire_format():
    tree = qc.compile_query("fast & table", synsets=None)
    wire = qc.serialize(tree)
    # & (or-decorated fast) (or-decorated table) #
    assert wire.startswith(b"&|{@fast>{fast>")
    assert wire.endswith(b"#")
    syn = {"fast": [["fast", "fasting"]]}
    wire = qc.serialize(qc.compile_query("fast", synsets=syn))
    # OR_SYN ratios serialized as 4-byte network ints + ';'
    assert struct.pack("!I", 2) + b";" in wire
    assert struct.pack("!I", 1) + b";" in wire


def test_not_serialization():
    tree = qc.compile_query("-fast", synsets=None)
    wire = qc.serialize(tree)
    assert wire.startswith(b"-|{@fast>{fast>")
    assert wire.endswith(b">#")  # null right child marker then QUERY_END


def test_malformed_queries_do_not_crash():
    """The reference client lists these as edge cases (client.cpp:38-46);
    our compiler must return None (invalid) or a valid tree, never raise."""
    cases = ["", "()", "-()", "a &", "& a", "(a & b", "a & b)",
             "a & (b | -)", "a & (b | (c & ))", '"unterminated', "\\",
             ">>><<<", "-", "|||", "a | | b", '""', '"" & a', "%", "a%2",
             "(((((((a"]
    for c in cases:
        tree = qc.compile_query(c, None)  # must not raise
        assert tree is None or tree is not None
    # specific pinned behaviors
    assert qc.compile_query("", None) is None
    assert qc.compile_query("a &", None) is None       # trailing operator
    assert qc.compile_query("(a & b", None) is None    # missing ')'
    assert isinstance(qc.compile_query("& a", None), qc.Or)  # '&' leaf
