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

# ---------------------------------------------------------------------------
# Analyzer presets (ES analyzer-config analog)
# ---------------------------------------------------------------------------
# The reference's ``--mapping`` selects an ES mapping whose analyzers ES
# applies server-side (ImportEvent.java:43,60; ElasticWriter.java:160-161).
# Here the preset is an index-level config stored in the manifest:
#   "standard" — lowercase + [a-z0-9_]+ runs (the default; unchanged).
#   "english"  — standard, then English stopword REMOVAL, then a
#                light stemmer: Harman's S-stemmer (ies/es/s rules,
#                Harman 1991 "How effective is suffixing?") extended
#                with ing/ed stripping + doubled-consonant collapse.
#                Deliberately NOT full Porter: every rule must have an
#                exact DuckDB SQL expression (stem_sql below) so the
#                oracle twin can replay the analyzer verbatim.
# Stopwords are removed BEFORE stemming (the ES english chain order:
# stop filter, then stemmer), and positions are assigned over the
# ANALYZED stream (removed stopwords leave no position gaps).

ANALYZERS = ("standard", "english")

#: English stopword list (a compact subset of Lucene's
#: EnglishAnalyzer defaults — kept short so the SQL literal stays
#: readable; the list itself is part of the index identity).
STOP_EN = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)
_STOP_EN_SET = frozenset(STOP_EN)


def _dedouble(u: str) -> str:
    """Collapse a doubled trailing letter (stopp → stop)."""
    return u[:-1] if len(u) >= 2 and u[-1] == u[-2] else u


def stem_en(t: str) -> str:
    """Light English stemmer — FIRST matching rule wins:

    1. len≥5, ends 'ies', 4th-from-end not a/e  → -ies +y (studies→study)
    2. len≥4, ends 'es', 3rd-from-end not a/e/o → drop final s (boxes→boxe)
    3. len≥4, ends 's', 2nd-from-end not s/u    → drop final s (runs→run)
    4. len≥6, ends 'ing' → strip + collapse doubled consonant
    5. len≥5, ends 'ed'  → strip + collapse doubled consonant

    Rules 1-3 are Harman's S-stemmer with length guards; ``stem_sql``
    generates the bit-identical DuckDB CASE expression."""
    n = len(t)
    if n >= 5 and t.endswith("ies") and t[-4] not in "ae":
        return t[:-3] + "y"
    if n >= 4 and t.endswith("es") and t[-3] not in "aeo":
        return t[:-1]
    if n >= 4 and t.endswith("s") and t[-2] not in "su":
        return t[:-1]
    if n >= 6 and t.endswith("ing"):
        return _dedouble(t[:-3])
    if n >= 5 and t.endswith("ed"):
        return _dedouble(t[:-2])
    return t


def stem_sql(var: str = "t") -> str:
    """DuckDB expression computing ``stem_en(var)`` — the same rule
    chain as the Python stemmer, for oracle twins."""
    def dedbl(u: str) -> str:
        return (f"CASE WHEN length({u}) >= 2 AND substr({u}, length({u}), 1)"
                f" = substr({u}, length({u})-1, 1)"
                f" THEN substr({u}, 1, length({u})-1) ELSE {u} END")

    ing = dedbl(f"substr({var}, 1, length({var})-3)")
    ed = dedbl(f"substr({var}, 1, length({var})-2)")
    return f"""CASE
  WHEN length({var}) >= 5 AND {var} LIKE '%ies'
       AND substr({var}, length({var})-3, 1) NOT IN ('a','e')
    THEN substr({var}, 1, length({var})-3) || 'y'
  WHEN length({var}) >= 4 AND {var} LIKE '%es'
       AND substr({var}, length({var})-2, 1) NOT IN ('a','e','o')
    THEN substr({var}, 1, length({var})-1)
  WHEN length({var}) >= 4 AND {var} LIKE '%s'
       AND substr({var}, length({var})-1, 1) NOT IN ('s','u')
    THEN substr({var}, 1, length({var})-1)
  WHEN length({var}) >= 6 AND {var} LIKE '%ing' THEN {ing}
  WHEN length({var}) >= 5 AND {var} LIKE '%ed' THEN {ed}
  ELSE {var}
END"""


def stop_sql_list() -> str:
    """DuckDB list literal of STOP_EN (generated from the same tuple
    the engine filters with — can't drift)."""
    return "[" + ", ".join(f"'{w}'" for w in STOP_EN) + "]"


def analyzer_sql(col: str, analyzer: str = "standard") -> str:
    """DuckDB expression producing the ANALYZED token list for a column
    expression — the SQL twin of ``tokenize(text, analyzer)``."""
    toks = TOKENIZE_SQL.format(col=col)
    if analyzer == "standard":
        return toks
    if analyzer != "english":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return (
        f"list_transform(list_filter({toks}, "
        f"t -> NOT list_contains({stop_sql_list()}, t)), "
        f"t -> {stem_sql('t')})"
    )


def analyze_tokens(tokens: list[str], analyzer: str = "standard") -> list[str]:
    """Apply the analyzer's post-tokenize chain (stop removal, stem) to
    an ordered token list. ``standard`` is the identity."""
    if analyzer == "standard":
        return tokens
    if analyzer != "english":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    return [stem_en(t) for t in tokens if t not in _STOP_EN_SET]


def tokenize(text: str | None, analyzer: str = "standard") -> list[str]:
    """Tokenize one string. None/empty → [] (the analog of the reference
    dropping null/empty cells, ``ExcelParser.java:251-256``)."""
    if not text:
        return []
    toks = TOKEN_RE.findall(text.lower())
    return toks if analyzer == "standard" else analyze_tokens(toks, analyzer)


def tokenize_many(texts, analyzer: str = "standard") -> list[list[str]]:
    """Tokenize a sequence of strings (the per-batch hot path; the findall
    call is C-level, the loop is over rows of one Arrow batch). The
    english analyzer memoizes stems per batch (vocabulary ≪ tokens)."""
    findall = TOKEN_RE.findall
    raw = [findall(t.lower()) if t else [] for t in texts]
    if analyzer == "standard":
        return raw
    if analyzer != "english":
        raise ValueError(f"unknown analyzer {analyzer!r}")
    memo: dict[str, str] = {}
    out = []
    for toks in raw:
        row = []
        for t in toks:
            if t in _STOP_EN_SET:
                continue
            s = memo.get(t)
            if s is None:
                s = memo[t] = stem_en(t)
            row.append(s)
        out.append(row)
    return out


def query_terms(query: str, analyzer: str = "standard") -> list[str]:
    """Distinct query terms in sorted order.

    Sorted order fixes the floating-point summation order of per-term BM25
    contributions, which makes engine, Python oracle, and test comparisons
    bit-identical. Duplicate terms in a query contribute once (matching
    ES/Lucene BooleanQuery-over-TermQuery dedup behavior).
    """
    return sorted(set(tokenize(query, analyzer)))


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
