"""simple_query_string → query-DSL compiler (the lenient end-user syntax).

The reference exposes its data through Kibana (README.md:9); beside the
full Lucene `query_string` bar (:mod:`excelastic_ray.query.qs`), ES
offers ``simple_query_string`` — the syntax meant for UNTRUSTED user
input: a tiny operator set and a parser that NEVER rejects a query.
Malformed input degrades to literal text instead of erroring, so a
search box can pass raw keystrokes straight through.

Operators (each gated by a flag, ES-style):

- ``+``   AND            (flag ``AND``)
- ``|``   OR             (flag ``OR``)
- ``-``   NOT, clause-initial only (flag ``NOT``); mid-term ``-`` is
          literal (``foo-bar`` is one term for the analyzer)
- ``"…"`` phrase         (flag ``PHRASE``); ``"…"~n`` slop (``NEAR``,
          with ``SLOP`` accepted as its ES alias)
- ``(…)`` grouping       (flag ``PRECEDENCE``)
- ``term*`` prefix, trailing-* only (flag ``PREFIX``); embedded
          ``*``/``?`` are NOT operators here (unlike query_string)
- ``term~n`` fuzzy       (flag ``FUZZY``); bare ``~`` = AUTO edits
- ``\\x`` escapes any character (flag ``ESCAPE``)
- whitespace separates clauses (flag ``WHITESPACE`` — when disabled ES
  leaves splitting to the analyzer; here the analyzer splits on
  non-alphanumerics anyway, so disabling it only stops operator
  recognition at spaces, which we mirror by keeping spaces literal)

Precedence is ``+`` over ``|`` (``foo | bar + baz`` reads
``foo OR (bar AND baz)`` — the ES-documented example), juxtaposed
clauses join with ``default_operator`` ("or" like ES).

Leniency rules (each pinned in tests): a disabled operator's character
is literal term text; an unclosed quote swallows the rest of the input
as the phrase (Lucene's SimpleQueryParser behavior); unmatched ``)``
is dropped and unmatched ``(`` closes at end-of-input; dangling or
doubled binary operators are dropped; empty groups vanish. The ONE
engine-wide exception: a query whose every clause is negated
(``-foo``) still raises, because ranking the whole corpus minus one
doc set is refused by design everywhere in this engine (same rule as
query_string / search_bool).
"""

from __future__ import annotations

import re

from excelastic_ray.query.qs import _Parser

__all__ = ["parse_simple_query_string_dsl", "SQS_FLAGS"]

#: the ES flag names (``SLOP`` kept as the pre-6.x alias of ``NEAR``)
SQS_FLAGS = frozenset({
    "AND", "OR", "NOT", "PHRASE", "PRECEDENCE", "PREFIX", "ESCAPE",
    "FUZZY", "NEAR", "SLOP", "WHITESPACE", "ALL", "NONE",
})

_FUZZY_TAIL = re.compile(r"^(?P<base>.+?)~(?P<edits>\d*)$")
_HAS_WORD = re.compile(r"[0-9A-Za-z]")


def _parse_flags(flags) -> frozenset:
    if flags is None:
        flags = "ALL"
    if isinstance(flags, str):
        parts = [p.strip().upper() for p in flags.split("|") if p.strip()]
    else:
        parts = [str(p).strip().upper() for p in flags]
    bad = set(parts) - SQS_FLAGS
    if bad:
        raise ValueError(f"simple_query_string: unknown flags {sorted(bad)}")
    if "NONE" in parts and len(parts) > 1:
        raise ValueError("simple_query_string: NONE excludes other flags")
    if "ALL" in parts:
        return SQS_FLAGS - {"NONE"}
    if "NONE" in parts:
        return frozenset()
    out = set(parts)
    if "SLOP" in out:  # alias
        out.add("NEAR")
    return frozenset(out)


class _Scanner:
    """Character scan → the same token shapes qs._Parser consumes,
    plus ("prefixq", base) and ("fuzzyq", (base, edits)) leaves that
    our _SimpleParser subclass turns into DSL nodes."""

    def __init__(self, qs: str, flags: frozenset):
        self.qs = qs
        self.f = flags
        self.i = 0
        self.buf: list[str] = []
        #: True while the current term buffer contains at least one
        #: ESCAPED char — an escaped ``*``/``~`` tail must stay literal
        self.esc_in_buf = False
        self.toks: list[tuple] = []

    def _flush(self) -> None:
        if not self.buf:
            return
        text = "".join(self.buf)
        escaped = self.esc_in_buf
        self.buf = []
        self.esc_in_buf = False
        if not escaped and "PREFIX" in self.f and text.endswith("*"):
            base = text.rstrip("*")
            if _HAS_WORD.search(base):
                self.toks.append(("prefixq", base))
            return  # bare '*' (or '**…') is an empty prefix: dropped
        fz = None if escaped else _FUZZY_TAIL.match(text)
        if fz and "FUZZY" in self.f and _HAS_WORD.search(fz.group("base")):
            edits = fz.group("edits")
            self.toks.append(
                ("fuzzyq", (fz.group("base"),
                            int(edits) if edits else "AUTO"))
            )
            return
        if _HAS_WORD.search(text):
            self.toks.append(("term", text))
        # else: pure punctuation (e.g. a literal '+' with AND disabled)
        # analyzes to nothing — dropped, the lenient contract

    def _phrase(self) -> None:
        # opening '"' consumed by caller; scan to the closing quote —
        # or end-of-input (Lucene SimpleQueryParser swallows the rest)
        q, n = self.qs, len(self.qs)
        out: list[str] = []
        while self.i < n:
            c = q[self.i]
            if c == "\\" and "ESCAPE" in self.f and self.i + 1 < n:
                out.append(q[self.i + 1])
                self.i += 2
                continue
            if c == '"':
                self.i += 1
                break
            out.append(c)
            self.i += 1
        slop = 0
        if "NEAR" in self.f and self.i < n and q[self.i] == "~":
            j = self.i + 1
            while j < len(q) and q[j].isdigit():
                j += 1
            if j > self.i + 1:
                slop = int(q[self.i + 1:j])
                self.i = j
        text = "".join(out)
        if _HAS_WORD.search(text):
            self.toks.append(("phrase", (text, slop)))

    def scan(self) -> list[tuple]:
        q, n = self.qs, len(self.qs)
        while self.i < n:
            c = q[self.i]
            if c == "\\" and "ESCAPE" in self.f and self.i + 1 < n:
                self.buf.append(q[self.i + 1])
                self.esc_in_buf = True
                self.i += 2
                continue
            if c.isspace() and "WHITESPACE" in self.f:
                self._flush()
                self.i += 1
                continue
            if c == "+" and "AND" in self.f:
                self._flush()
                self.toks.append(("and", None))
                self.i += 1
                continue
            if c == "|" and "OR" in self.f:
                self._flush()
                self.toks.append(("or", None))
                self.i += 1
                continue
            if (c == "-" and "NOT" in self.f and not self.buf):
                # clause-initial only: 'foo-bar' keeps its '-'
                self.toks.append(("not", None))
                self.i += 1
                continue
            if c == "(" and "PRECEDENCE" in self.f:
                self._flush()
                self.toks.append(("lparen", None))
                self.i += 1
                continue
            if c == ")" and "PRECEDENCE" in self.f:
                self._flush()
                self.toks.append(("rparen", None))
                self.i += 1
                continue
            if c == '"' and "PHRASE" in self.f:
                self._flush()
                self.i += 1
                self._phrase()
                continue
            self.buf.append(c)
            self.i += 1
        self._flush()
        return self.toks


_CLAUSE = {"term", "phrase", "prefixq", "fuzzyq", "lparen"}
_BINOP = {"and", "or"}


def _sanitize(toks: list[tuple]) -> list[tuple]:
    """Repair the token stream so the strict recursive-descent parser
    cannot fail: balance parens, drop dangling/doubled operators,
    erase empty groups. Idempotent by construction (one fixpoint loop
    for the group erasure, linear passes otherwise)."""
    # 1. balance parens: drop unmatched ')', close unmatched '(' at end
    out: list[tuple] = []
    depth = 0
    for t in toks:
        if t[0] == "lparen":
            depth += 1
        elif t[0] == "rparen":
            if depth == 0:
                continue
            depth -= 1
        out.append(t)
    out.extend([("rparen", None)] * depth)

    changed = True
    while changed:
        changed = False
        # 2. empty groups '()' vanish
        i = 0
        res: list[tuple] = []
        while i < len(out):
            if (out[i][0] == "lparen" and i + 1 < len(out)
                    and out[i + 1][0] == "rparen"):
                i += 2
                changed = True
                continue
            res.append(out[i])
            i += 1
        out = res
        # 3. binary op with no clause on its left (stream start, after
        #    '(' or another op) or right (stream end, before ')') drops;
        #    NOT with nothing notable after it drops too
        res = []
        for i, t in enumerate(out):
            k = t[0]
            prev = res[-1][0] if res else None
            nxt = out[i + 1][0] if i + 1 < len(out) else None
            if k in _BINOP:
                if prev is None or prev in _BINOP or prev == "lparen" \
                        or prev == "not":
                    changed = True
                    continue
                if nxt is None or nxt == "rparen":
                    changed = True
                    continue
                if nxt in _BINOP:  # doubled: keep the FIRST, drop next
                    pass
            if k == "not" and (nxt is None or nxt == "rparen"
                               or nxt in _BINOP):
                changed = True
                continue
            res.append(t)
        out = res
    return out


class _SimpleParser(_Parser):
    """qs._Parser with the two extra leaf kinds; inherits the bool
    folding (must/should/must_not, msm=1 OR semantics) so both string
    syntaxes compile to identical trees for identical algebra."""

    def _starts_clause(self) -> bool:  # juxtaposition detection
        return self.peek() in _CLAUSE or self.peek() == "not"

    def primary(self) -> dict:
        kind = self.peek()
        if kind == "prefixq":
            base = str(self.toks[self.i][1])
            self.i += 1
            return {"prefix": base}
        if kind == "fuzzyq":
            base, edits = self.toks[self.i][1]
            self.i += 1
            return {"fuzzy": {"value": base, "fuzziness": edits}}
        if kind == "term":
            # NOT qs._leaf: simple_query_string has no field:value
            # syntax and no mid-term wildcards — 'role:user' and
            # 'pa?t' are literal text for the analyzer here
            text = str(self.toks[self.i][1])
            self.i += 1
            return {"match": text}
        if kind == "phrase":
            text, slop = self.toks[self.i][1]
            self.i += 1
            return {"phrase": {"query": text, "slop": int(slop)}}
        if kind == "lparen":
            return super().primary()
        raise ValueError("simple_query_string: internal parse state")


def parse_simple_query_string_dsl(qs: str, default_operator: str = "or",
                                  flags="ALL") -> dict:
    """Parse ES ``simple_query_string`` syntax into an engine DSL tree.

    Lenient by contract — any input yields a tree (or the documented
    pure-negative / all-operators-no-text refusals, the two cases where
    "best effort" would mean ranking the whole corpus)."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    fl = _parse_flags(flags)
    toks = _sanitize(_Scanner(qs, fl).scan())
    if not toks:
        raise ValueError(
            "simple_query_string: no searchable text in query"
        )
    node = _SimpleParser(toks, default_operator).parse()
    if isinstance(node, tuple):
        raise ValueError(
            "simple_query_string: NOT must be conjoined with a positive "
            "clause (pure-negative queries would rank the whole corpus)"
        )
    return node
