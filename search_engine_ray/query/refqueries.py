"""The reference query set (FIXTURES.md §2): the expression list from
query/tests/client.cpp:19-46 with letters substituted by corpus vocabulary,
plus phrase / synonym / stopword / utility cases.

The substitution vocabulary comes from the synthetic ``documents`` table
(TESTDATA.md) so every query has hits at every scale factor.
"""

REF_QUERIES: list[str] = [
    # client.cpp simple queries (a=fast b=table c=key d=merge)
    "fast",
    "-fast",
    "fast & table",
    "fast | table",
    # nested expressions
    "fast & (table | key)",
    "(fast & table) | key",
    "-(fast & table)",
    "fast & (table | (key & merge))",
    '"fast key" & fast',
    # complex expressions
    "(fast | table) & (key | merge)",
    "-(fast | (table & key))",
    "fast & table & key & merge",
    "fast | table | key | merge",
    # implicit AND
    "fast table",
    "spark vector join",
    # phrases (2-4 words)
    '"key order"',
    '"slow fast table"',
    '"window table table value"',
    # synonym-triggering single nouns (WordNet synsets exist)
    "table",
    "order",
    "line",
    "value",
    # stopword-only → invalid query → empty
    "the",
    "a & the",
    # stopword mixed (stopword side optimizes away)
    "fast & the",
    # utility intent
    "privacy policy",
    # scan-heavy
    "row | column",
    "query & data & batch",
    "customer & -spark",
    '"group query"',
]


# Same expression shapes over the adversarial fixture corpus's vocabulary
# (sources/fixtures.gen_pages) — used by the C++ rank-conformance gate.
FIXTURE_QUERIES: list[str] = [
    "running",
    "-running",
    "running & children",
    "running | children",
    "running & (children | data)",
    "(running & children) | data",
    "-(running & children)",
    "running & (children | (data & national))",
    '"information retrieval" & information',
    "(running | children) & (data | national)",
    "-(running | (children & data))",
    "running & children & data & national",
    "running | children | data | national",
    "running children",
    '"information retrieval"',
    '"information retrieval ranks"',
    '"retrieval ranks web documents"',
    # synonym-triggering nouns (present in WordNet synsets + the corpus)
    "unit",
    "object",
    "animal",
    "money",
    "information",
    # stopword handling
    "the",
    "a & the",
    "running & the",
    # utility intent vs utility-page penalty
    "data & privacy",
    "privacy policy",
    "information & error",
    # zipf vocab + misc
    "word1",
    "word2 | word3",
    "dogs | cats",
    "happiness & darkness",
    "station | nation",
    "go went gone",
]
