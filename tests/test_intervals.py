"""ES intervals query: greedy-minimal interval algebra + end-to-end.

Kernel properties are pinned against independent brute-force
enumeration (all chains / all pairs → gap filter → minimality), which
provably equals the greedy-minimal set for match leaves; end-to-end,
an ordered max_gaps=0 rule must equal the exact phrase bit-for-bit
(same tf/df convention)."""

from __future__ import annotations

import numpy as np
import pytest

from excelastic_ray.query import intervals as iv


def _brute_minimal(windows):
    """Minimality over an explicit window set (independent impl)."""
    wins = sorted(set(windows))
    out = []
    for s, e in wins:
        if not any(
            (s2 >= s and e2 <= e and (s2, e2) != (s, e))
            for s2, e2 in wins
        ):
            out.append((s, e))
    return sorted(out)


def _brute_ordered(pos_lists, max_gaps):
    """All strictly-increasing chains → gap filter → minimality."""
    import itertools

    wins = []
    for combo in itertools.product(*[p.tolist() for p in pos_lists]):
        if all(b > a for a, b in zip(combo, combo[1:])):
            s, e = combo[0], combo[-1]
            if (e - s + 1) - len(pos_lists) <= max_gaps:
                wins.append((s, e))
    return _brute_minimal(wins)


def _brute_unordered(p0, p1, max_gaps):
    wins = []
    for a in p0.tolist():
        for b in p1.tolist():
            if a == b:
                continue
            s, e = min(a, b), max(a, b)
            if (e - s + 1) - 2 <= max_gaps:
                wins.append((s, e))
    return _brute_minimal(wins)


def test_kernels_match_bruteforce_randomized():
    rng = np.random.default_rng(17)
    for trial in range(300):
        m = int(rng.integers(2, 4))
        lists = [
            np.unique(rng.integers(0, 30, size=int(rng.integers(1, 6))))
            for _ in range(m)
        ]
        g = int(rng.integers(0, 6))
        s, e = iv.ordered_chain(lists, g, unit_width=True)
        assert list(zip(s.tolist(), e.tolist())) == \
            _brute_ordered(lists, g), (trial, [x.tolist() for x in lists], g)
        s, e = iv.unordered_pair(lists[0], lists[1], g, unit_width=True)
        assert list(zip(s.tolist(), e.tolist())) == \
            _brute_unordered(lists[0], lists[1], g)


def test_minimal_filter_properties():
    rng = np.random.default_rng(5)
    for _ in range(100):
        n = int(rng.integers(1, 12))
        s = rng.integers(0, 20, size=n)
        e = s + rng.integers(0, 8, size=n)
        ms, me = iv.minimal_filter(s, e)
        got = list(zip(ms.tolist(), me.tolist()))
        assert got == _brute_minimal(list(zip(s.tolist(), e.tolist())))
        # sorted by start, no containment, ends ascending
        assert got == sorted(got)
        assert all(b[1] > a[1] for a, b in zip(got, got[1:]))


def test_all_of_composition():
    """all_of over child intervals: ordered non-overlap + gap budget."""
    pos = {"a": np.array([0, 10]), "b": np.array([1, 11]),
           "c": np.array([4, 13])}

    def pos_of(t):
        return pos.get(t, np.zeros(0, dtype=np.int64))

    node = iv.validate_rule(
        {"all_of": {"ordered": True, "max_gaps": 1, "intervals": [
            {"match": {"query": "a b", "max_gaps": 0}},
            {"match": {"query": "c"}},
        ]}},
        lambda q: q.split(),
    )
    s, e = iv.eval_node(node, pos_of)
    # phrases (a b) at (0,1) and (10,11); c at 4 (gap 2 from (0,1) —
    # over budget) and 13 (gap 1 from (10,11) — within)
    assert list(zip(s.tolist(), e.tolist())) == [(10, 13)]
    # any_of unions the children
    node2 = iv.validate_rule(
        {"any_of": {"intervals": [{"match": "a"}, {"match": "c"}]}},
        lambda q: q.split(),
    )
    s, e = iv.eval_node(node2, pos_of)
    assert list(zip(s.tolist(), e.tolist())) == [(0, 0), (4, 4),
                                                 (10, 10), (13, 13)]


def test_validate_rule_errors():
    tok = lambda q: q.split()  # noqa: E731
    with pytest.raises(ValueError, match="single-key"):
        iv.validate_rule({"match": "a", "any_of": {}}, tok)
    with pytest.raises(ValueError, match="unknown intervals op"):
        iv.validate_rule({"near": "a"}, tok)
    with pytest.raises(ValueError, match="empty query"):
        iv.validate_rule({"match": "   "}, lambda q: [])
    with pytest.raises(ValueError, match="exactly two operands"):
        iv.validate_rule(
            {"match": {"query": "a b c", "ordered": False}}, tok)
    with pytest.raises(ValueError, match="exactly two operands"):
        iv.validate_rule(
            {"all_of": {"ordered": False, "intervals": [
                {"match": "a"}, {"match": "b"}, {"match": "c"}]}}, tok)
    with pytest.raises(ValueError, match="at least one child"):
        iv.validate_rule({"any_of": {"intervals": []}}, tok)


def test_search_intervals_end_to_end(tiny_index, tiny_table):
    """Ordered max_gaps=0 == exact phrase (same tf/df convention,
    bit-identical scores); relaxing max_gaps only widens the match
    set; any_of of two phrases ⊇ each phrase's docs; actor parity."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    # find a real adjacent pair in the corpus
    big = Counter()
    for t in tiny_table["text"].to_pylist():
        toks = tokenize(t)
        big.update(zip(toks, toks[1:]))
    (w1, w2), _n = big.most_common(1)[0]
    q = f"{w1} {w2}"

    ph = eng.search_phrase(q, k=200)
    ivq = eng.search_intervals({"match": {"query": q, "ordered": True,
                                          "max_gaps": 0}}, k=200)
    assert ivq.num_rows == ph.num_rows > 0
    assert ivq.equals(ph)

    wide = eng.search_intervals({"match": {"query": q, "ordered": True,
                                           "max_gaps": 3}}, k=10**6)
    assert wide.num_rows >= ivq.num_rows
    unord = eng.search_intervals(
        {"match": {"query": q, "ordered": False, "max_gaps": 3}},
        k=10**6)
    assert unord.num_rows >= wide.num_rows

    # any_of of two single terms matches the union of the term docs
    any2 = eng.search_intervals(
        {"any_of": {"intervals": [{"match": w1}, {"match": w2}]}},
        k=10**6)
    t1 = eng.search(w1, k=10**6)
    t2 = eng.search(w2, k=10**6)
    union = set(zip(t1["conv_id"].to_pylist(),
                    t1["turn_idx"].to_pylist())) | set(
        zip(t2["conv_id"].to_pylist(), t2["turn_idx"].to_pylist()))
    assert set(zip(any2["conv_id"].to_pylist(),
                   any2["turn_idx"].to_pylist())) == union

    # all_of of the two single terms, ordered, huge gap budget ==
    # docs containing w1 before w2
    both = eng.search_intervals(
        {"all_of": {"ordered": True, "max_gaps": 10**6, "intervals": [
            {"match": w1}, {"match": w2}]}}, k=10**6)
    assert both.num_rows <= min(t1.num_rows, t2.num_rows)
    assert set(zip(both["conv_id"].to_pylist(),
                   both["turn_idx"].to_pylist())) >= set(
        zip(ph["conv_id"].to_pylist(), ph["turn_idx"].to_pylist()))

    actors = QueryEngine(d, use_actors=True)
    try:
        a = actors.search_intervals(
            {"match": {"query": q, "ordered": False, "max_gaps": 2}},
            k=25)
        b = eng.search_intervals(
            {"match": {"query": q, "ordered": False, "max_gaps": 2}},
            k=25)
        assert a.equals(b)
    finally:
        actors.close()


def test_interval_filters_bruteforce():
    """Filter relations vs explicit per-pair checks, randomized."""
    rng = np.random.default_rng(29)
    for _ in range(200):
        def mkset():
            n = int(rng.integers(1, 6))
            s = np.sort(rng.choice(40, size=n, replace=False))
            e = s + rng.integers(0, 6, size=n)
            return iv.minimal_filter(s, e)

        base, flt = mkset(), mkset()
        bp = list(zip(base[0].tolist(), base[1].tolist()))
        fp = list(zip(flt[0].tolist(), flt[1].tolist()))
        rels = {
            "containing": lambda a: any(
                f[0] >= a[0] and f[1] <= a[1] for f in fp),
            "contained_by": lambda a: any(
                a[0] >= f[0] and a[1] <= f[1] for f in fp),
            "overlapping": lambda a: any(
                f[0] <= a[1] and f[1] >= a[0] for f in fp),
        }
        for rel, pred in rels.items():
            got = iv.filter_intervals(base, flt, rel)
            want = [a for a in bp if pred(a)]
            assert list(zip(got[0].tolist(), got[1].tolist())) == want, \
                (rel, bp, fp)
            got_n = iv.filter_intervals(base, flt, f"not_{rel}")
            want_n = [a for a in bp if not pred(a)]
            assert list(zip(got_n[0].tolist(),
                            got_n[1].tolist())) == want_n
    with pytest.raises(ValueError, match="unknown intervals filter"):
        iv.filter_intervals(base, flt, "inside")


def test_interval_filter_end_to_end(tiny_index, tiny_table):
    """not_containing removes exactly the windows holding the filtered
    term; containing keeps exactly those (partition property)."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    big = Counter()
    for t in tiny_table["text"].to_pylist():
        toks = tokenize(t)
        big.update(zip(toks, toks[1:], toks[2:]))
    (w1, w2, w3), _n = big.most_common(1)[0]
    base = {"query": f"{w1} {w3}", "ordered": True, "max_gaps": 4}
    plain = eng.search_intervals({"match": dict(base)}, k=10**6)
    keep = eng.search_intervals(
        {"match": {**base, "filter": {"containing": {"match": w2}}}},
        k=10**6)
    drop = eng.search_intervals(
        {"match": {**base,
                   "filter": {"not_containing": {"match": w2}}}},
        k=10**6)
    assert plain.num_rows > 0 and keep.num_rows > 0
    docs = lambda t: set(zip(t["conv_id"].to_pylist(),  # noqa: E731
                             t["turn_idx"].to_pylist()))
    # every filtered match set is a subset; union covers the base
    assert docs(keep) <= docs(plain)
    assert docs(drop) <= docs(plain)
    assert docs(keep) | docs(drop) == docs(plain)


def _brute_unordered_iv(a, b, max_gaps):
    """All-pairs unordered combination of two INTERVAL operands
    (equal starts allowed — distinct child rules may begin at the
    same token) → gap filter → minimality."""
    wins = []
    for sa, ea in zip(*[x.tolist() for x in a]):
        for sb, eb in zip(*[x.tolist() for x in b]):
            s, e = min(sa, sb), max(ea, eb)
            gap = (e - s + 1) - ((ea - sa + 1) + (eb - sb + 1))
            if gap <= max_gaps:
                wins.append((s, e))
    return _brute_minimal(wins)


def test_unordered_pair_equal_start_intervals():
    """Regression: two all_of children sharing a start position must
    still combine — 'a' at (0,0) and 'a b' at (0,1) on doc 'a b'."""
    a = (np.array([0]), np.array([0]))
    b = (np.array([0]), np.array([1]))
    s, e = iv.unordered_pair(a, b, 0, unit_width=False)
    assert list(zip(s.tolist(), e.tolist())) == [(0, 1)]
    # and end-to-end through validate_rule/eval_node
    pos = {"a": np.array([0]), "b": np.array([1])}
    node = iv.validate_rule(
        {"all_of": {"ordered": False, "max_gaps": 0, "intervals": [
            {"match": "a"},
            {"match": {"query": "a b", "max_gaps": 0}},
        ]}},
        lambda q: q.split(),
    )
    s, e = iv.eval_node(
        node, lambda t: pos.get(t, np.zeros(0, dtype=np.int64)))
    assert list(zip(s.tolist(), e.tolist())) == [(0, 1)]
    # unit-width self-pair stays strict: 'a a' unordered needs two
    # distinct occurrences
    p = np.array([3])
    s, e = iv.unordered_pair(p, p, 5, unit_width=True)
    assert len(s) == 0


def test_unordered_pair_interval_operands_subset_of_bruteforce():
    """Greedy interval-operand pairs are a documented deviation from
    all-pairs, but every emitted window must be a legal pairing and
    the nearest-on-either-side picks must survive: the greedy set is
    a subset of the brute-force minimal set, non-empty whenever the
    brute set pairs the nearest starts."""
    rng = np.random.default_rng(41)
    for _ in range(200):
        def mkset():
            n = int(rng.integers(1, 5))
            s = np.sort(rng.choice(30, size=n, replace=False))
            e = s + rng.integers(0, 4, size=n)
            return iv.minimal_filter(s, e)

        a, b = mkset(), mkset()
        g = int(rng.integers(0, 8))
        s, e = iv.unordered_pair(a, b, g, unit_width=False)
        got = set(zip(s.tolist(), e.tolist()))
        brute = set(_brute_unordered_iv(a, b, g))
        assert got <= brute, (a, b, g)
        if brute and not got:
            # the greedy probes must find SOMETHING whenever any
            # pairing fits the budget for some a with its nearest b
            raise AssertionError((a, b, g, brute))
