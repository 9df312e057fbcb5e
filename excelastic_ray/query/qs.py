"""query_string → query-DSL compiler (the Kibana search-bar syntax).

The reference exposes its data through Kibana (README.md:9), whose
search bar speaks Lucene query_string syntax. This module parses that
syntax into the engine's composable DSL tree (engine.search_dsl), so
one executor serves both the JSON DSL and the string form:

    table AND (window OR value) AND NOT spark
    "connection reset"~1 OR timeout
    role:user AND error retr*

Supported syntax:

- bare terms        → match leaves (analyzed); juxtaposed terms join
                      with the DEFAULT operator (``default_operator``,
                      "or" like ES)
- AND / && , OR / ||, NOT / ! / leading ``-``  — boolean operators
- parentheses       → grouping
- "quoted phrase"   → phrase leaf; optional ``~n`` slop suffix
- field:token       → field-scoped match leaf (the per-field posting
                      stream; role:user ≠ text:user)
- field:(a OR b)    → Lucene field grouping: the field distributes
                      over every bare term in the group; groups may
                      nest bools/NOT, but phrases/wildcards/fuzzy
                      inside a field group are rejected like their
                      field:value forms
- ``*`` / ``?`` in a term → wildcard leaf (dictionary expansion,
                      scoring_boolean)
- ``term~`` / ``term~2``  → fuzzy leaf (closest dictionary terms;
                      bare ``~`` = AUTO edits like Lucene)

Documented deviations from Lucene's classic parser (which has famously
surprising operator handling): precedence is the conventional
NOT > AND > OR with left associativity; a NOT clause must be conjoined
with at least one positive clause (a pure-negative query would rank
the whole corpus, which the engine refuses by design); field:"phrase"
is rejected (per-field positions are not indexed).
"""

from __future__ import annotations

import re

__all__ = ["parse_query_string_dsl"]

_TOKEN = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
    (?P<minus>-(?=\S)) |
    (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<slop>\d+))?) |
    (?P<term>[^\s()!"]+)
    """,
    re.VERBOSE,
)

_FIELD_TERM = re.compile(r"^(?P<field>[A-Za-z_][\w.]*):(?P<value>.+)$")
_FIELD_NAME = re.compile(r"^[A-Za-z_][\w.]*$")
_WILD = re.compile(r"[*?]")
_FUZZY_TERM = re.compile(r"^(?P<base>.+?)~(?P<edits>\d*)$")


def _tokenize(qs: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    for m in _TOKEN.finditer(qs):
        between = qs[pos:m.start()]
        if between.strip():
            raise ValueError(
                f"query_string: cannot parse {between.strip()!r}"
            )
        pos = m.end()
        kind = m.lastgroup if m.lastgroup in (
            "lparen", "rparen", "and", "or", "not", "minus",
        ) else None
        if kind == "minus":
            out.append(("not", None))
        elif kind:
            out.append((kind, None))
        elif m.group("phrase") is not None:
            out.append(("phrase", (m.group("ph"),
                                   int(m.group("slop") or 0))))
        else:
            t = m.group("term")
            if t.endswith(":"):
                # a term the regex stopped at ':' means the value was
                # NOT a plain token — a quoted phrase or a '(' group
                # follows (or nothing at all)
                if pos < len(qs) and qs[pos] == '"':
                    raise ValueError(
                        "query_string: field:\"phrase\" is not supported "
                        "(per-field positions are not indexed)"
                    )
                if (pos < len(qs) and qs[pos] == "("
                        and _FIELD_NAME.match(t[:-1])):
                    out.append(("fieldopen", t[:-1]))
                    continue
                raise ValueError(
                    f"query_string: dangling field prefix {t!r}"
                )
            out.append(("term", t))
    if qs[pos:].strip():
        raise ValueError(f"query_string: cannot parse {qs[pos:].strip()!r}")
    return out


def _leaf(tok: tuple[str, object]) -> dict:
    kind, val = tok
    if kind == "phrase":
        text, slop = val
        if not text.strip():
            raise ValueError("query_string: empty phrase")
        return {"phrase": {"query": text, "slop": slop}}
    text = str(val)
    fz = _FUZZY_TERM.match(text)
    if fz:
        base, edits = fz.group("base"), fz.group("edits")
        if _WILD.search(base):
            raise ValueError(
                "query_string: a term cannot combine wildcards with "
                "the ~fuzzy suffix"
            )
        if _FIELD_TERM.match(base):
            raise ValueError(
                "query_string: fuzzy field clauses are not supported"
            )
        return {"fuzzy": {"value": base,
                          "fuzziness": int(edits) if edits else "AUTO"}}
    fm = _FIELD_TERM.match(text)
    if fm and not _WILD.search(fm.group("field")):
        field, value = fm.group("field"), fm.group("value")
        if value.startswith('"'):
            raise ValueError(
                "query_string: field:\"phrase\" is not supported "
                "(per-field positions are not indexed)"
            )
        if _WILD.search(value):
            raise ValueError(
                "query_string: wildcards inside field clauses are not "
                "supported"
            )
        return {"match": {"field": field, "query": value}}
    if _WILD.search(text):
        return {"wildcard": text}
    return {"match": text}


def _scope_field(node: dict, field: str) -> dict:
    """Distribute a Lucene field group's field over the group's match
    leaves: ``role:(user OR assistant)`` scopes every bare term inside
    the parens. Non-term leaves keep their field:value restrictions."""
    if "match" in node:
        body = node["match"]
        if isinstance(body, str):
            return {"match": {"field": field, "query": body}}
        raise ValueError(
            "query_string: nested field clauses inside a field group "
            "are not supported"
        )
    if "bool" in node:
        scoped = {
            k: ([_scope_field(c, field) for c in v]
                if isinstance(v, list) else v)
            for k, v in node["bool"].items()
        }
        return {"bool": scoped}
    kind = next(iter(node))
    raise ValueError(
        f"query_string: {kind} clauses inside a field group are not "
        "supported (same restriction as their field:value forms)"
    )


class _Parser:
    """Recursive descent: or_expr := and_expr ((OR|juxt-or) and_expr)*;
    and_expr := unary ((AND|juxt-and) unary)*; unary := NOT unary |
    primary. Juxtaposition (two clauses with no operator between)
    means the default operator."""

    def __init__(self, toks: list[tuple[str, object]], default_op: str):
        self.toks = toks
        self.i = 0
        self.default_op = default_op

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def _starts_clause(self) -> bool:
        return self.peek() in ("lparen", "not", "term", "phrase",
                               "fieldopen")

    def parse(self) -> dict:
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(
                f"query_string: unexpected {self.toks[self.i]!r}"
            )
        return node

    def or_expr(self) -> dict:
        children = [self.and_expr()]
        while True:
            if self.peek() == "or":
                self.i += 1
            elif self.default_op == "or" and self._starts_clause():
                pass  # juxtaposition = OR
            else:
                break
            children.append(self.and_expr())
        if len(children) == 1:
            return children[0]
        # Lucene folds OR-level NOTs into a global must_not:
        # `a -b` / `a OR NOT b` ⇒ should=[a], must_not=[b] (match at
        # least one positive clause AND no negated one)
        should = [c for c in children if not isinstance(c, tuple)]
        must_not = [c[1] for c in children if isinstance(c, tuple)]
        if not should:
            raise ValueError(
                "query_string: NOT must be conjoined with a positive "
                "clause (pure-negative queries would rank the whole "
                "corpus)"
            )
        node: dict = {"bool": {"should": should,
                               "minimum_should_match": 1}}
        if must_not:
            node["bool"]["must_not"] = must_not
        return node

    def and_expr(self) -> dict | tuple:
        children = [self.unary()]
        while True:
            if self.peek() == "and":
                self.i += 1
            elif self.default_op == "and" and self._starts_clause():
                pass  # juxtaposition = AND
            else:
                break
            children.append(self.unary())
        if len(children) == 1:
            return children[0]
        must = [c for c in children if not isinstance(c, tuple)]
        must_not = [c[1] for c in children if isinstance(c, tuple)]
        if not must:
            raise ValueError(
                "query_string: NOT must be conjoined with a positive "
                "clause (pure-negative queries would rank the whole "
                "corpus)"
            )
        node: dict = {"bool": {"must": must}}
        if must_not:
            node["bool"]["must_not"] = must_not
        return node

    def unary(self) -> dict | tuple:
        """→ a DSL node, or ("not", node) marking a negated clause for
        the enclosing and_expr to fold into must_not."""
        if self.peek() == "not":
            self.i += 1
            inner = self.unary()
            if isinstance(inner, tuple):  # NOT NOT x == x
                return inner[1]
            return ("not", inner)
        return self.primary()

    def primary(self) -> dict:
        kind = self.peek()
        if kind == "fieldopen":
            field = str(self.toks[self.i][1])
            self.i += 1
            group = self.primary()  # the tokenizer guarantees a lparen
            return _scope_field(group, field)
        if kind == "lparen":
            self.i += 1
            node = self.or_expr()
            if self.peek() != "rparen":
                raise ValueError("query_string: missing ')'")
            self.i += 1
            if isinstance(node, tuple):
                raise ValueError(
                    "query_string: NOT must be conjoined with a "
                    "positive clause (pure-negative queries would rank "
                    "the whole corpus)"
                )
            return node
        if kind in ("term", "phrase"):
            tok = self.toks[self.i]
            self.i += 1
            return _leaf(tok)
        raise ValueError(
            "query_string: expected a term, phrase or '(' "
            + (f"before {self.toks[self.i]!r}" if self.i < len(self.toks)
               else "at end of query")
        )


def parse_query_string_dsl(qs: str, default_operator: str = "or") -> dict:
    """Parse a Lucene-style query string into an engine DSL tree.
    ``default_operator`` ("or" like ES, or "and") joins juxtaposed
    clauses that have no explicit operator between them."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    toks = _tokenize(qs)
    if not toks:
        raise ValueError("query_string: empty query")
    node = _Parser(toks, default_operator).parse()
    if isinstance(node, tuple):
        raise ValueError(
            "query_string: NOT must be conjoined with a positive clause "
            "(pure-negative queries would rank the whole corpus)"
        )
    return node


def positive_terms(node: dict, analyze) -> set:
    """Analyzer tokens of the tree's POSITIVE text leaves (match /
    term / phrase) — what a highlighter should mark. must_not branches
    are excluded; wildcard/prefix/regexp leaves are skipped (their
    dictionary expansions live engine-side)."""
    out: set = set()
    if "match" in node:
        body = node["match"]
        if isinstance(body, str):
            out.update(analyze(body))
        return out
    if "term" in node:
        out.update(analyze(node["term"]))
        return out
    if "phrase" in node:
        body = node["phrase"]
        q = body["query"] if isinstance(body, dict) else body
        out.update(analyze(q))
        return out
    if "bool" in node:
        b = node["bool"]
        for key in ("must", "should"):
            for c in b.get(key, []):
                out |= positive_terms(c, analyze)
    return out
