"""ES ``function_score`` DSL envelope.

Semantics under test (ES function_score):
- each function yields a per-doc value × weight where its filter
  matches; applied values combine per ``score_mode``; the combined
  factor joins the query score per ``boost_mode``; docs where no
  function applies keep factor 1; ``max_boost`` caps the factor.
- ``field_value_factor`` reads the indexed numeric doc values
  (turn_idx / dl) with the monotone modifier set; ``random_score``
  is the seeded FNV hash (identical to search_random).
"""

from __future__ import annotations

import numpy as np
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


@pytest.fixture(scope="module")
def base(eng, terms):
    hot, _ = terms
    t = eng.search_dsl({"bool": {"must": [{"term": hot}]}}, k=100_000)
    return dict(zip(t["docid"].to_pylist(), t["score"].to_pylist()))


@pytest.fixture(scope="module")
def mid_set(eng, terms):
    _, mid = terms
    t = eng.search_dsl({"constant_score": {"filter": {"term": mid}}},
                       k=100_000)
    return set(t["docid"].to_pylist())


def _fs(eng, terms, **kw):
    hot, _ = terms
    q = {"function_score": {"query": {"term": hot}, **kw}}
    return eng.search_dsl(q, k=100_000)


def test_no_functions_is_identity(eng, terms, base):
    t = _fs(eng, terms)
    assert dict(zip(t["docid"].to_pylist(), t["score"].to_pylist())) == base


def test_multiply_fvf_and_filtered_weight(eng, terms, base, mid_set,
                                          tiny_config):
    _, mid = terms
    t = _fs(
        eng, terms,
        functions=[
            {"field_value_factor": {"field": "turn_idx", "factor": 0.5,
                                    "modifier": "ln1p"}},
            {"filter": {"term": mid}, "weight": 1.5},
        ],
    )
    assert t.num_rows == len(base)  # match set is the query's
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        ti = d & (tiny_config.max_turns - 1)
        f = np.log1p(0.5 * ti) * (1.5 if d in mid_set else 1.0)
        assert s == base[d] * f


def test_sum_mode_unapplied_docs_keep_factor_one(eng, terms, base,
                                                 mid_set):
    _, mid = terms
    t = _fs(
        eng, terms,
        functions=[{"filter": {"term": mid}, "weight": 2.0}],
        score_mode="sum", boost_mode="multiply",
    )
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        assert s == base[d] * (2.0 if d in mid_set else 1.0)


def test_avg_mode_is_weighted_average(eng, terms, base, mid_set):
    _, mid = terms
    t = _fs(
        eng, terms,
        functions=[
            {"filter": {"term": mid}, "weight": 3.0},  # raw value 1
            {"weight": 1.0},                           # raw value 1
        ],
        score_mode="avg",
    )
    # where both apply: (3*1 + 1*1)/(3+1) = 1; else 1*1/1 = 1 — the
    # weighted average of constant-1 functions is always 1
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        assert s == pytest.approx(base[d])


def test_first_mode_takes_list_order(eng, terms, base, mid_set):
    _, mid = terms
    t = _fs(
        eng, terms,
        functions=[
            {"filter": {"term": mid}, "weight": 5.0},
            {"weight": 2.0},
        ],
        score_mode="first",
    )
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        assert s == base[d] * (5.0 if d in mid_set else 2.0)


def test_max_boost_caps_factor(eng, terms, base):
    t = _fs(
        eng, terms,
        functions=[{"weight": 9.0}],
        max_boost=2.5,
    )
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        assert s == base[d] * 2.5


@pytest.mark.parametrize("bm,expect", [
    ("sum", lambda q, f: q + f),
    ("replace", lambda q, f: f),
    ("avg", lambda q, f: (q + f) / 2.0),
    ("max", lambda q, f: max(q, f)),
    ("min", lambda q, f: min(q, f)),
])
def test_boost_modes(eng, terms, base, bm, expect):
    t = _fs(eng, terms, functions=[{"weight": 3.0}], boost_mode=bm)
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        assert s == expect(base[d], 3.0)


def test_random_score_matches_search_random(eng, terms):
    hot, _ = terms
    t = eng.search_dsl(
        {"function_score": {"query": {"term": hot},
                            "functions": [{"random_score": {"seed": 11}}],
                            "boost_mode": "replace"}},
        k=25,
    )
    assert t.to_pydict() == eng.search_random(hot, k=25, seed=11).to_pydict()


def test_none_filter_function_never_applies(eng, terms, base):
    t = _fs(
        eng, terms,
        functions=[{"filter": {"term": "zz_not_in_corpus"},
                    "weight": 9.0}],
    )
    assert dict(zip(t["docid"].to_pylist(), t["score"].to_pylist())) == base


@pytest.mark.parametrize("bad", [
    {"functions": []},                                # missing query
    {"query": {"term": "x"}, "score_mode": "zz"},
    {"query": {"term": "x"}, "boost_mode": "zz"},
    {"query": {"term": "x"}, "functions": [{"unknown": 1}]},
    {"query": {"term": "x"},
     "functions": [{"field_value_factor": {"field": "ts"}}]},
    {"query": {"term": "x"},
     "functions": [{"field_value_factor": {"field": "turn_idx",
                                           "modifier": "log"}}]},
    {"query": {"term": "x"},
     "functions": [{"field_value_factor": {"field": "turn_idx"},
                    "random_score": {"seed": 1}}]},
])
def test_validation(eng, bad):
    with pytest.raises(ValueError):
        eng.search_dsl({"function_score": bad}, k=5)


def test_nested_inside_bool(eng, terms, base, mid_set):
    """function_score composes as a clause like any other."""
    hot, mid = terms
    t = eng.search_dsl(
        {"bool": {"must": [
            {"function_score": {"query": {"term": hot},
                                "functions": [{"weight": 2.0}]}},
        ], "must_not": [{"term": mid}]}},
        k=100_000,
    )
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        assert d not in mid_set
        assert s == base[d] * 2.0
