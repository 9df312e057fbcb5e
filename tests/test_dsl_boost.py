"""Per-clause ``boost`` in the query DSL (the ES score multiplier on
any leaf or bool node; never changes the match set)."""

from __future__ import annotations

import pytest

from excelastic_ray.query.engine import QueryEngine


@pytest.fixture(scope="module")
def eng(tiny_index):
    d, _ = tiny_index
    return QueryEngine(d)


@pytest.fixture(scope="module")
def terms(tiny_table):
    from collections import Counter

    from excelastic_ray.analysis import tokenize

    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    hot = counts.most_common(1)[0][0]
    mid = next(t for t, c in counts.items() if 5 <= c <= 50)
    return hot, mid


def _scores(t):
    return dict(zip(t["docid"].to_pylist(), t["score"].to_pylist()))


def test_term_leaf_boost(eng, terms):
    hot, _ = terms
    plain = _scores(eng.search_dsl({"bool": {"must": [{"term": hot}]}},
                                   k=100_000))
    boosted = _scores(eng.search_dsl(
        {"bool": {"must": [{"term": {"value": hot, "boost": 2.0}}]}},
        k=100_000))
    assert boosted == {d: s * 2.0 for d, s in plain.items()}


def test_match_dict_boost_no_field(eng, terms):
    hot, mid = terms
    q = f"{hot} {mid}"
    plain = _scores(eng.search_dsl({"bool": {"must": [{"match": q}]}},
                                   k=100_000))
    boosted = _scores(eng.search_dsl(
        {"bool": {"must": [{"match": {"query": q, "boost": 3.0}}]}},
        k=100_000))
    assert boosted == {d: s * 3.0 for d, s in plain.items()}


def test_bool_node_boost_multiplies_subtree(eng, terms):
    hot, mid = terms
    inner = {"bool": {"must": [{"term": hot}],
                      "should": [{"term": mid}]}}
    plain = _scores(eng.search_dsl(inner, k=100_000))
    outer = {"bool": {"must": [dict(inner["bool"].items()) and
                               {"bool": {**inner["bool"], "boost": 2.5}}]}}
    boosted = _scores(eng.search_dsl(outer, k=100_000))
    assert boosted == {d: s * 2.5 for d, s in plain.items()}


def test_boosted_should_contributes_scaled(eng, terms):
    hot, mid = terms
    base = _scores(eng.search_dsl({"bool": {"must": [{"term": hot}]}},
                                  k=100_000))
    mid_scores = _scores(eng.search_dsl(
        {"bool": {"must": [{"term": mid}]}}, k=100_000))
    got = _scores(eng.search_dsl(
        {"bool": {"must": [{"term": hot}],
                  "should": [{"term": {"value": mid, "boost": 0.5}}]}},
        k=100_000))
    for d, s in got.items():
        want = base[d] + (0.5 * mid_scores[d] if d in mid_scores else 0.0)
        assert s == want


def test_boost_does_not_change_match_set(eng, terms):
    hot, mid = terms
    q = {"bool": {"must": [{"term": hot}],
                  "must_not": [{"term": {"value": mid, "boost": 9.0}}]}}
    plain = eng.search_dsl(
        {"bool": {"must": [{"term": hot}], "must_not": [{"term": mid}]}},
        k=100_000)
    assert eng.search_dsl(q, k=100_000).to_pydict() == plain.to_pydict()


def test_constant_score_boost_is_not_double_applied(eng, terms):
    hot, _ = terms
    t = eng.search_dsl(
        {"constant_score": {"filter": {"term": hot}, "boost": 2.5}},
        k=100)
    assert set(t["score"].to_pylist()) == {2.5}


def test_phrase_and_expansion_leaf_boost(eng, terms):
    hot, _ = terms
    pre = hot[:4]
    plain = _scores(eng.search_dsl(
        {"bool": {"must": [{"prefix": pre}]}}, k=100_000))
    boosted = _scores(eng.search_dsl(
        {"bool": {"must": [{"prefix": {"value": pre, "boost": 2.0}}]}},
        k=100_000))
    assert boosted == {d: s * 2.0 for d, s in plain.items()}
