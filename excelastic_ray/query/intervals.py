"""ES ``intervals`` query — positional interval algebra.

The modern ES positional query (Elasticsearch 7+, backed by Lucene's
IntervalQuery): rules produce per-document sets of token intervals,
combinators compose them, and the document scores by its interval
count. Supported rule grammar (each node a single-key dict):

    {"match": {"query": "a b c", "ordered": bool, "max_gaps": int}}
        — the terms analyzed in order; an interval is a token window
          containing all of them (in order when ``ordered``), with at
          most ``max_gaps`` non-matched tokens inside the window
    {"all_of": {"intervals": [rule...], "ordered": bool,
                "max_gaps": int}}
        — one interval per child, combined; ``ordered`` requires the
          children's intervals in sequence WITHOUT overlap, and
          ``max_gaps`` bounds the tokens between consecutive child
          intervals
    {"any_of": {"intervals": [rule...]}}
        — the union of the children's intervals

Documented, fully-specified deviations from Lucene (whose minimal-
interval iterators have subtle lazy semantics): interval generation is
GREEDY — an ordered chain extends each start with the earliest
possible continuation, unordered matches pair each occurrence with its
nearest counterpart on either side — followed by a MINIMALITY filter
(an interval containing another interval of the same set is dropped).
Greedy-minimal sets are deterministic and SQL-twinnable; for the
common shapes (phrase-like ordered rules, two-term proximity) they
coincide with Lucene's minimal intervals. Unordered rules support
exactly two operands (terms or children); ordered rules support any
arity. Scoring follows the engine's phrase convention: the whole rule
is ONE pseudo-term with tf = interval count and df = matching-doc
count (global, exact across shards).

All kernels are pure numpy over sorted position arrays — no engine
state — so they are property-testable standalone.
"""

from __future__ import annotations

import numpy as np

_INT64_MAX = np.iinfo(np.int64).max

__all__ = [
    "minimal_filter", "ordered_chain", "unordered_pair", "any_of",
    "validate_rule", "eval_node",
]


def minimal_filter(starts: np.ndarray, ends: np.ndarray):
    """Drop every interval that strictly contains another interval of
    the set (Lucene's minimality rule). Exact duplicates collapse to
    one. Returns (starts, ends) sorted by start ascending — minimality
    makes ends ascending too."""
    if not len(starts):
        return (np.zeros(0, dtype=np.int64),) * 2
    pairs = np.unique(
        np.stack([np.asarray(starts, dtype=np.int64),
                  np.asarray(ends, dtype=np.int64)], axis=1), axis=0
    )
    s, e = pairs[:, 0], pairs[:, 1]
    order = np.lexsort((-e, s))  # start asc, end DESC for equal starts
    s, e = s[order], e[order]
    # i contains some j>i iff the suffix min end (after i) <= e_i
    # (every j>i has s_j >= s_i by the sort)
    nxt = np.concatenate([
        np.minimum.accumulate(e[::-1])[::-1][1:], [_INT64_MAX]
    ])
    keep = nxt > e
    s, e = s[keep], e[keep]
    rs = np.argsort(s, kind="stable")
    return s[rs], e[rs]


def ordered_chain(seqs: list, max_gaps: int, unit_width: bool):
    """Greedy ordered combination. ``seqs`` is one entry per operand:
    a sorted position array (``unit_width=True``, match-leaf terms) or
    an (starts, ends) interval pair (all_of children). Each start of
    the first operand extends with the EARLIEST following operand
    occurrence (strictly after the previous operand's end — ordered
    intervals never overlap). Gap budget: total non-matched tokens
    inside the combined window (leaf) / between consecutive child
    intervals (all_of) ≤ ``max_gaps``. Returns minimal (starts, ends).
    """
    first = seqs[0]
    if unit_width:
        starts = np.asarray(first, dtype=np.int64)
        prev_end = starts.copy()
    else:
        starts = np.asarray(first[0], dtype=np.int64)
        prev_end = np.asarray(first[1], dtype=np.int64)
    valid = np.ones(len(starts), dtype=bool)
    gaps = np.zeros(len(starts), dtype=np.int64)
    for op in seqs[1:]:
        if unit_width:
            ps = np.asarray(op, dtype=np.int64)
            k = np.searchsorted(ps, prev_end, side="right")
            ok = k < len(ps)
            nxt_s = ps[np.minimum(k, len(ps) - 1)]
            nxt_e = nxt_s
        else:
            cs = np.asarray(op[0], dtype=np.int64)
            ce = np.asarray(op[1], dtype=np.int64)
            k = np.searchsorted(cs, prev_end, side="right")
            ok = k < len(cs)
            kc = np.minimum(k, len(cs) - 1)
            nxt_s, nxt_e = cs[kc], ce[kc]
        valid &= ok
        gaps = gaps + np.where(valid, nxt_s - prev_end - 1, 0)
        prev_end = np.where(valid, nxt_e, prev_end)
    valid &= gaps <= max_gaps
    return minimal_filter(starts[valid], prev_end[valid])


def unordered_pair(a, b, max_gaps: int, unit_width: bool):
    """Greedy unordered combination of two operands: each occurrence
    of ``a`` pairs with its nearest ``b`` occurrence on either side
    (and symmetrically via the side probes). Window = the hull of the
    pair; gap budget: window width minus the operands' own token
    counts ≤ ``max_gaps`` (overlapping child intervals give negative
    gaps — always within budget). Returns minimal (starts, ends)."""
    if unit_width:
        sa = ea = np.asarray(a, dtype=np.int64)
        sb = eb = np.asarray(b, dtype=np.int64)
        la = np.ones(len(sa), dtype=np.int64)
        lb = np.ones(len(sb), dtype=np.int64)
    else:
        sa, ea = (np.asarray(x, dtype=np.int64) for x in a)
        sb, eb = (np.asarray(x, dtype=np.int64) for x in b)
        la = ea - sa + 1
        lb = eb - sb + 1
    outs, oute, outg = [], [], []
    # b strictly to the right of a's start: earliest such b
    k = np.searchsorted(sb, sa, side="right")
    ok = k < len(sb)
    if ok.any():
        kc = np.minimum(k, len(sb) - 1)
        s = np.minimum(sa, sb[kc])[ok]
        e = np.maximum(ea, eb[kc])[ok]
        outs.append(s)
        oute.append(e)
        outg.append((e - s + 1) - (la[ok] + lb[kc][ok]))
    # b at-or-left of a's start: latest such b
    k2 = np.searchsorted(sb, sa, side="left") - 1
    ok2 = k2 >= 0
    if ok2.any():
        kc2 = np.maximum(k2, 0)
        s = np.minimum(sa, sb[kc2])[ok2]
        e = np.maximum(ea, eb[kc2])[ok2]
        outs.append(s)
        oute.append(e)
        outg.append((e - s + 1) - (la[ok2] + lb[kc2][ok2]))
    if not outs:
        return (np.zeros(0, dtype=np.int64),) * 2
    s = np.concatenate(outs)
    e = np.concatenate(oute)
    g = np.concatenate(outg)
    keep = g <= max_gaps
    return minimal_filter(s[keep], e[keep])


def any_of(children: list):
    """Union of the children's interval sets, minimal-filtered."""
    live = [c for c in children if len(c[0])]
    if not live:
        return (np.zeros(0, dtype=np.int64),) * 2
    return minimal_filter(
        np.concatenate([c[0] for c in live]),
        np.concatenate([c[1] for c in live]),
    )


def validate_rule(rule, tokenize) -> dict:
    """Normalize + validate a rule tree. ``tokenize`` maps a query
    string to its ordered analyzer tokens. Returns nodes of shape
    {"op": "match", "terms": [...], "ordered": bool, "max_gaps": int}
    or {"op": "all_of"/"any_of", "children": [...], ...}."""
    if not isinstance(rule, dict) or len(rule) != 1:
        raise ValueError(f"intervals rule must be a single-key dict: "
                         f"{rule!r}")
    op, body = next(iter(rule.items()))
    if op == "match":
        if isinstance(body, str):
            body = {"query": body}
        if not isinstance(body, dict) or "query" not in body or (
            set(body) - {"query", "ordered", "max_gaps"}
        ):
            raise ValueError(
                "intervals match takes {'query', 'ordered', 'max_gaps'}"
            )
        terms = tokenize(body["query"])
        if not terms:
            raise ValueError("intervals match: empty query")
        ordered = bool(body.get("ordered", True))
        max_gaps = int(body.get("max_gaps", 0))
        if not ordered and len(terms) > 2:
            raise ValueError(
                "unordered intervals support exactly two operands"
            )
        return {"op": "match", "terms": terms, "ordered": ordered,
                "max_gaps": max_gaps}
    if op in ("all_of", "any_of"):
        if not isinstance(body, dict) or "intervals" not in body:
            raise ValueError(f"{op} takes {{'intervals': [...]}}")
        extra = set(body) - (
            {"intervals", "ordered", "max_gaps"} if op == "all_of"
            else {"intervals"}
        )
        if extra:
            raise ValueError(f"unknown {op} keys {sorted(extra)}")
        children = [validate_rule(c, tokenize) for c in body["intervals"]]
        if not children:
            raise ValueError(f"{op} needs at least one child rule")
        node = {"op": op, "children": children}
        if op == "all_of":
            node["ordered"] = bool(body.get("ordered", True))
            node["max_gaps"] = int(body.get("max_gaps", 0))
            if not node["ordered"] and len(children) > 2:
                raise ValueError(
                    "unordered intervals support exactly two operands"
                )
        return node
    raise ValueError(f"unknown intervals op {op!r}")


def leaf_terms(node: dict) -> set:
    if node["op"] == "match":
        return set(node["terms"])
    out: set = set()
    for c in node["children"]:
        out |= leaf_terms(c)
    return out


def eval_node(node: dict, pos_of):
    """Evaluate a validated node for ONE document. ``pos_of`` maps a
    term to its sorted position array in that doc (empty array when
    absent). Returns minimal (starts, ends)."""
    empty = (np.zeros(0, dtype=np.int64),) * 2
    if node["op"] == "match":
        seqs = [pos_of(t) for t in node["terms"]]
        if any(len(s) == 0 for s in seqs):
            return empty
        if len(seqs) == 1:
            p = np.asarray(seqs[0], dtype=np.int64)
            return p, p.copy()
        if node["ordered"]:
            return ordered_chain(seqs, node["max_gaps"], unit_width=True)
        return unordered_pair(seqs[0], seqs[1], node["max_gaps"],
                              unit_width=True)
    kids = [eval_node(c, pos_of) for c in node["children"]]
    if node["op"] == "any_of":
        return any_of(kids)
    if any(len(k[0]) == 0 for k in kids):
        return empty
    if len(kids) == 1:
        return kids[0]
    if node["ordered"]:
        return ordered_chain(kids, node["max_gaps"], unit_width=False)
    return unordered_pair(kids[0], kids[1], node["max_gaps"],
                          unit_width=False)
