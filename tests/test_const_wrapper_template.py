"""constant_score / wrapper / search-template DSL surface.

ES semantics under test:
- ``constant_score`` scores every doc in the child's MATCH SET at the
  fixed ``boost`` (filter context — the child's BM25 scores are
  discarded), composing normally inside bool trees.
- ``wrapper`` splices a base64-encoded JSON query into the tree at
  compile time (depth-capped).
- search templates render a mustache-subset string with params, then
  execute through the same DSL executor (missing params are a loud
  refusal, unlike ES's silent empty render).
"""

from __future__ import annotations

import base64
import json

import numpy as np
import pytest

from excelastic_ray.query.engine import QueryEngine, render_search_template


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


def _b64(q: dict) -> str:
    return base64.b64encode(json.dumps(q).encode()).decode()


# ---------------------------------------------------------------- const


def test_constant_score_fixed_boost(eng, terms):
    hot, _ = terms
    t = eng.search_dsl(
        {"constant_score": {"filter": {"term": hot}, "boost": 2.5}}, k=10_000
    )
    ref = eng.search_dsl({"bool": {"must": [{"term": hot}]}}, k=10_000)
    assert set(t["score"].to_pylist()) == {2.5}
    # same MATCH SET as the scored query, scores replaced
    assert set(t["docid"].to_pylist()) == set(ref["docid"].to_pylist())
    # equal scores tie-break by docid ascending (the engine's stable rule)
    ids = t["docid"].to_pylist()
    assert ids == sorted(ids)


def test_constant_score_default_boost_is_one(eng, terms):
    hot, _ = terms
    t = eng.search_dsl({"constant_score": {"filter": {"term": hot}}}, k=50)
    assert set(t["score"].to_pylist()) == {1.0}


def test_constant_score_composes_in_bool(eng, terms):
    hot, mid = terms
    t = eng.search_dsl(
        {"bool": {"must": [
            {"constant_score": {"filter": {"term": hot}, "boost": 3.0}},
            {"term": mid},
        ]}},
        k=10_000,
    )
    plain = eng.search_dsl({"bool": {"must": [{"term": mid}]}}, k=10_000)
    per_doc = dict(zip(plain["docid"].to_pylist(),
                       plain["score"].to_pylist()))
    hot_set = set(
        eng.search_dsl({"constant_score": {"filter": {"term": hot}}},
                       k=10_000)["docid"].to_pylist()
    )
    assert t.num_rows > 0
    for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
        assert d in hot_set and d in per_doc
        assert s == pytest.approx(3.0 + per_doc[d], abs=0.0)
    assert set(t["docid"].to_pylist()) == hot_set & set(per_doc)


def test_constant_score_absent_term_empty(eng):
    t = eng.search_dsl(
        {"constant_score": {"filter": {"term": "zz_not_in_corpus"}}}, k=10
    )
    assert t.num_rows == 0


@pytest.mark.parametrize(
    "body",
    [
        {"boost": 2.0},  # missing filter
        {"filter": {"term": "x"}, "boost": 1.0, "extra": 1},  # unknown key
    ],
)
def test_constant_score_validation(eng, body):
    with pytest.raises(ValueError):
        eng.search_dsl({"constant_score": body}, k=5)


# -------------------------------------------------------------- wrapper


def test_wrapper_equals_direct(eng, terms):
    hot, mid = terms
    q = {"bool": {"must": [{"term": hot}], "must_not": [{"term": mid}]}}
    direct = eng.search_dsl(q, k=50)
    wrapped = eng.search_dsl({"wrapper": _b64(q)}, k=50)
    assert wrapped.to_pydict() == direct.to_pydict()


def test_wrapper_nested_anywhere_in_tree(eng, terms):
    hot, mid = terms
    q = {"bool": {"must": [{"wrapper": _b64({"term": hot})},
                           {"term": mid}]}}
    direct = eng.search_dsl(
        {"bool": {"must": [{"term": hot}, {"term": mid}]}}, k=50
    )
    assert eng.search_dsl(q, k=50).to_pydict() == direct.to_pydict()


def test_wrapper_of_wrapper(eng, terms):
    hot, _ = terms
    inner = _b64({"term": hot})
    outer = _b64({"wrapper": inner})
    direct = eng.search_dsl({"bool": {"must": [{"term": hot}]}}, k=20)
    assert (eng.search_dsl({"wrapper": outer}, k=20).to_pydict()
            == direct.to_pydict())


def test_wrapper_request_body_shape(eng, terms):
    """ES accepts {"wrapper": {"query": "<base64>"}} too."""
    hot, _ = terms
    direct = eng.search_dsl({"bool": {"must": [{"term": hot}]}}, k=20)
    got = eng.search_dsl({"wrapper": {"query": _b64({"term": hot})}}, k=20)
    assert got.to_pydict() == direct.to_pydict()


def test_wrapper_depth_cap(eng, terms):
    hot, _ = terms
    q: dict = {"term": hot}
    for _ in range(10):
        q = {"wrapper": _b64(q)}
    with pytest.raises(ValueError, match="nested"):
        eng.search_dsl(q, k=5)


@pytest.mark.parametrize(
    "bad", ["not base64!!", _b64({"term": "x"})[:-4] + "$$$$", 42]
)
def test_wrapper_invalid_payload(eng, bad):
    with pytest.raises(ValueError):
        eng.search_dsl({"wrapper": bad}, k=5)


# ------------------------------------------------------------- template


def test_render_template_string_and_number():
    out = render_search_template(
        '{"constant_score": {"filter": {"term": "{{q}}"}, '
        '"boost": {{b}}}}',
        {"q": 'he said "hi"\\n', "b": 2.5},
    )
    assert out == {
        "constant_score": {
            "filter": {"term": 'he said "hi"\\n'},
            "boost": 2.5,
        }
    }


def test_render_template_missing_param_raises():
    with pytest.raises(ValueError, match="missing param"):
        render_search_template('{"term": "{{q}}"}', {})


def test_render_template_invalid_json_raises():
    with pytest.raises(ValueError, match="invalid"):
        render_search_template('{"term": {{n}}', {"n": 1})


def test_render_template_non_object_raises():
    with pytest.raises(ValueError, match="query object"):
        render_search_template("{{n}}", {"n": 3})


def test_search_template_equals_dsl(eng, terms):
    hot, mid = terms
    tpl = ('{"bool": {"must": [{"term": "{{q}}"}], '
           '"must_not": [{"term": "{{ex}}"}]}}')
    got = eng.search_template(tpl, {"q": hot, "ex": mid}, k=25)
    want = eng.search_dsl(
        {"bool": {"must": [{"term": hot}], "must_not": [{"term": mid}]}},
        k=25,
    )
    assert got.to_pydict() == want.to_pydict()


def test_search_template_numeric_boost(eng, terms):
    hot, _ = terms
    got = eng.search_template(
        '{"constant_score": {"filter": {"term": "{{q}}"}, '
        '"boost": {{b}}}}',
        {"q": hot, "b": 4.25},
        k=30,
    )
    assert set(got["score"].to_pylist()) == {4.25}
