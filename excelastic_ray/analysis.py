"""Tokenizer / analyzer.

The reference delegates analysis to Elasticsearch's standard analyzer
(lowercase + word-boundary split; implied by ``/root/reference/README.md:3``).
Our analyzer is the deterministic equivalent: lowercase, then extract runs
of ``[a-z0-9_]+``. The identical definition exists in three places that
must agree exactly — this module (engine), the pure-Python oracle, and the
DuckDB oracle SQL (``TOKENIZE_SQL``) — because it defines rank identity.
"""

from __future__ import annotations

import re

TOKEN_PATTERN = r"[a-z0-9_]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# DuckDB expression producing the same token list for a column expression.
TOKENIZE_SQL = "regexp_extract_all(lower({col}), '[a-z0-9_]+')"


def tokenize(text: str | None) -> list[str]:
    """Tokenize one string. None/empty → [] (the analog of the reference
    dropping null/empty cells, ``ExcelParser.java:251-256``)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_many(texts) -> list[list[str]]:
    """Tokenize a sequence of strings (the per-batch hot path; the findall
    call is C-level, the loop is over rows of one Arrow batch)."""
    findall = TOKEN_RE.findall
    return [findall(t.lower()) if t else [] for t in texts]


def query_terms(query: str) -> list[str]:
    """Distinct query terms in sorted order.

    Sorted order fixes the floating-point summation order of per-term BM25
    contributions, which makes engine, Python oracle, and test comparisons
    bit-identical. Duplicate terms in a query contribute once (matching
    ES/Lucene BooleanQuery-over-TermQuery dedup behavior).
    """
    return sorted(set(tokenize(query)))


# ---------------------------------------------------------------------------
# Per-field term keys (ES dynamic-mapping analog)
# ---------------------------------------------------------------------------

#: Field-qualified dictionary keys: "\x01" + field + "\x1f" + term. The
#: leading \x01 sorts BEFORE every analyzer token char ([a-z0-9_]), so
#: all field-prefixed terms occupy one contiguous region at the head of
#: the sorted dictionary — unqualified prefix expansion
#: (terms_with_prefix) and term scans can never collide with them.
FIELD_MARK = "\x01"
FIELD_SEP = "\x1f"


def field_key(field: str, term: str) -> str:
    """Dictionary key of ``term`` indexed under ``field``'s own posting
    stream (the ES `column:value` / dynamic-mapping analog; every column
    of a row is its own searchable field per ExcelParser.java:222-261 +
    ES dynamic mapping)."""
    return FIELD_MARK + field + FIELD_SEP + term


def parse_query_string(query: str) -> list[tuple[str | None, str]]:
    """Kibana-style query_string parsing: whitespace-separated clauses,
    ``field:terms`` scopes the clause's terms to that field, bare terms
    go to the default field. Returns [(field | None, term)] with
    analyzer-normalized terms, duplicates removed, sorted by
    (field, term) — the deterministic scoring order."""
    seen: set[tuple[str | None, str]] = set()
    for clause in query.split():
        field: str | None = None
        body = clause
        if ":" in clause:
            head, _, rest = clause.partition(":")
            if head and rest:
                field, body = head, rest
        for term in tokenize(body):
            seen.add((field, term))
    return sorted(seen, key=lambda p: (p[0] or "", p[1]))
