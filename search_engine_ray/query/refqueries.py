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
