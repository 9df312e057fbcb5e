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

Every rule body may carry ``"filter": {kind: sub-rule}`` with kind one
of containing / not_containing / contained_by / not_contained_by /
overlapping / not_overlapping — the produced intervals are kept or
dropped by their relation to the sub-rule's interval set (the ES
intervals filter).

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
    # b at-or-left of a's start: latest such b. For interval operands
    # (all_of children) EQUAL starts are a legal pairing — two distinct
    # child rules may begin at the same token (e.g. 'a' and 'a b') and
    # unordered combination allows overlap. Only the unit-width case
    # keeps the strict probe: there equal positions would pair a term
    # occurrence with itself when both operands are the same term.
    k2 = np.searchsorted(sb, sa, side="left" if unit_width else "right") - 1
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


_FILTER_KINDS = (
    "containing", "not_containing", "contained_by", "not_contained_by",
    "overlapping", "not_overlapping",
)


def filter_intervals(base, flt, kind: str):
    """ES intervals filter: keep base intervals by their relation to
    the FILTER rule's interval set. ``base``/``flt`` are minimal
    (starts, ends) pairs (starts ascending ⇒ ends ascending, which the
    probes below exploit):

    - containing:      keep a iff some f lies inside a
    - contained_by:    keep a iff a lies inside some f
    - overlapping:     keep a iff some f overlaps a
    - not_*:           the complements
    """
    if kind not in _FILTER_KINDS:
        raise ValueError(f"unknown intervals filter kind {kind!r}")
    s, e = base
    if not len(s):
        return base
    fs, fe = (np.asarray(x, dtype=np.int64) for x in flt)
    rel = kind[4:] if kind.startswith("not_") else kind
    if not len(fs):
        hit = np.zeros(len(s), dtype=bool)
    elif rel == "containing":
        # some f inside a: among f with fs >= a.s the SMALLEST end is
        # the first one (minimal sets have ascending ends) — exists
        # iff that end fits under a.e
        idx = np.searchsorted(fs, s)
        hit = (idx < len(fs)) & (fe[np.minimum(idx, len(fs) - 1)] <= e)
    elif rel == "contained_by":
        # a inside some f: among f with fs <= a.s the LARGEST end is
        # the last one — exists iff it reaches a.e
        idx = np.searchsorted(fs, s, side="right") - 1
        hit = (idx >= 0) & (fe[np.maximum(idx, 0)] >= e)
    else:  # overlapping
        # some f with fs <= a.e whose end reaches back to a.s
        idx = np.searchsorted(fs, e, side="right") - 1
        hit = (idx >= 0) & (fe[np.maximum(idx, 0)] >= s)
    keep = ~hit if kind.startswith("not_") else hit
    return s[keep], e[keep]


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
            set(body) - {"query", "ordered", "max_gaps", "filter"}
        ):
            raise ValueError(
                "intervals match takes {'query', 'ordered', 'max_gaps'"
                ", 'filter'}"
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
        node = {"op": "match", "terms": terms, "ordered": ordered,
                "max_gaps": max_gaps}
        return _with_filter(node, body, tokenize)
    if op in ("all_of", "any_of"):
        if not isinstance(body, dict) or "intervals" not in body:
            raise ValueError(f"{op} takes {{'intervals': [...]}}")
        extra = set(body) - (
            {"intervals", "ordered", "max_gaps", "filter"}
            if op == "all_of" else {"intervals", "filter"}
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
        return _with_filter(node, body, tokenize)
    raise ValueError(f"unknown intervals op {op!r}")


def _with_filter(node: dict, body: dict, tokenize) -> dict:
    """Attach an ES intervals filter ({kind: sub-rule}) to a node."""
    flt = body.get("filter")
    if flt is None:
        return node
    if not isinstance(flt, dict) or len(flt) != 1:
        raise ValueError(
            f"intervals filter takes one of {_FILTER_KINDS}"
        )
    kind, sub = next(iter(flt.items()))
    if kind not in _FILTER_KINDS:
        raise ValueError(f"unknown intervals filter kind {kind!r}")
    node["filter"] = (kind, validate_rule(sub, tokenize))
    return node


def leaf_terms(node: dict) -> set:
    out: set = set(node["terms"]) if node["op"] == "match" else set()
    for c in node.get("children", []):
        out |= leaf_terms(c)
    if "filter" in node:
        out |= leaf_terms(node["filter"][1])
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
            out = (p, p.copy())
        elif node["ordered"]:
            out = ordered_chain(seqs, node["max_gaps"], unit_width=True)
        else:
            out = unordered_pair(seqs[0], seqs[1], node["max_gaps"],
                                 unit_width=True)
        return _apply_filter(node, out, pos_of)
    kids = [eval_node(c, pos_of) for c in node["children"]]
    if node["op"] == "any_of":
        return _apply_filter(node, any_of(kids), pos_of)
    if any(len(k[0]) == 0 for k in kids):
        return empty
    if len(kids) == 1:
        out = kids[0]
    elif node["ordered"]:
        out = ordered_chain(kids, node["max_gaps"], unit_width=False)
    else:
        out = unordered_pair(kids[0], kids[1], node["max_gaps"],
                             unit_width=False)
    return _apply_filter(node, out, pos_of)


def _apply_filter(node: dict, base, pos_of):
    f = node.get("filter")
    if f is None or not len(base[0]):
        return base
    kind, sub = f
    return filter_intervals(base, eval_node(sub, pos_of), kind)
