"""The reference's own golden test corpus — the 10 fixed passages
used by every sqllogictest file
(/root/reference/tests/sqllogictest/indexing.slt:8-18), ids 1..10.

Golden expectation (indexing.slt:30-41): english-analyzed query
'PostgreSQL' with limit 10 returns ids [8, 9, 4, 1, 7, 2] in order.
"""

PASSAGES = [
    (1, "PostgreSQL is a powerful, open-source object-relational database system. It has over 15 years of active development."),
    (2, "Full-text search is a technique for searching in plain-text documents or textual database fields. PostgreSQL supports this with tsvector."),
    (3, "BM25 is a ranking function used by search engines to estimate the relevance of documents to a given search query."),
    (4, "PostgreSQL provides many advanced features like full-text search, window functions, and more."),
    (5, "Search and ranking in databases are important in building effective information retrieval systems."),
    (6, "The BM25 ranking algorithm is derived from the probabilistic retrieval framework."),
    (7, "Full-text search indexes documents to allow fast text queries. PostgreSQL supports this through its GIN and GiST indexes."),
    (8, "The PostgreSQL community is active and regularly improves the database system."),
    (9, "PostgreSQL supports both non-relational and relational data types."),
    (10, "Effective search ranking algorithms, such as BM25, improve search results by understanding relevance."),
]

GOLDEN_ORDER = [8, 9, 4, 1, 7, 2]
