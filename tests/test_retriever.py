"""ES 8.x retriever-tree executor: standard / knn leaves injected as
callables, rrf and linear fusion nodes, arbitrary nesting. Pure
driver-side assembly over top-window rankings (the distributed legs
are elsewhere), so these tests run on synthetic ranked lists."""

from __future__ import annotations

import math

import pytest

from excelastic_ray.query.retriever import (execute_retriever,
                                            search_retriever)


def _leaves(standard: dict, knn: dict):
    """Leaf executors serving fixed rankings keyed by query text /
    vector tag."""

    def standard_fn(query, window, _filt):
        return standard[query][:window]

    def knn_fn(spec, window):
        return knn[spec["tag"]][:window]

    return standard_fn, knn_fn


S = {
    "qa": [(1, 9.0), (2, 7.0), (3, 5.0), (4, 1.0)],
    "qb": [(3, 4.0), (5, 3.0), (1, 2.0)],
}
K = {
    "v0": [(2, 0.9), (5, 0.8), (6, 0.5)],
}


def test_standard_and_knn_leaves_window():
    sfn, kfn = _leaves(S, K)
    out = execute_retriever({"standard": {"query": "qa"}}, 2,
                            standard_fn=sfn, knn_fn=kfn)
    assert out == [(1, 9.0), (2, 7.0)]
    # knn honors min(window, spec k)
    out = execute_retriever({"knn": {"tag": "v0", "k": 2}}, 10,
                            standard_fn=sfn, knn_fn=kfn)
    assert out == [(2, 0.9), (5, 0.8)]


def test_rrf_node_matches_hand_fusion():
    sfn, kfn = _leaves(S, K)
    node = {"rrf": {"rank_constant": 60, "rank_window_size": 10,
                    "retrievers": [{"standard": {"query": "qa"}},
                                   {"standard": {"query": "qb"}}]}}
    out = execute_retriever(node, 10, standard_fn=sfn, knn_fn=kfn)
    # hand RRF: doc1 1/61 + 1/63, doc3 1/63 + 1/61 (tie, id ASC) ...
    want1 = 1 / 61 + 1 / 63
    assert out[0] == (1, want1) and out[1] == (3, want1)
    got = dict(out)
    assert math.isclose(got[2], 1 / 62) and math.isclose(got[5], 1 / 62)


def test_linear_minmax_and_l2_and_missing_docs():
    sfn, kfn = _leaves(S, K)
    node = {"linear": {"rank_window_size": 10, "retrievers": [
        {"retriever": {"standard": {"query": "qa"}},
         "weight": 2.0, "normalizer": "minmax"},
        {"retriever": {"knn": {"tag": "v0"}},
         "weight": 1.0, "normalizer": "minmax"},
    ]}}
    out = dict(execute_retriever(node, 10, standard_fn=sfn, knn_fn=kfn))
    # qa minmax: 1→1.0, 2→0.75, 3→0.5, 4→0.0; v0: 2→1.0, 5→0.75, 6→0.0
    assert out[1] == 2.0
    assert out[2] == 2 * 0.75 + 1.0
    # knn-only doc: (0.8 - 0.5) / (0.9 - 0.5), the exact IEEE value
    assert out[5] == (0.8 - 0.5) / (0.9 - 0.5)
    assert out[4] == 0.0 and out[6] == 0.0
    # l2_norm normalizer
    node2 = {"linear": {"retrievers": [
        {"retriever": {"standard": {"query": "qb"}},
         "weight": 1.0, "normalizer": "l2_norm"},
    ]}}
    out2 = dict(execute_retriever(node2, 10, standard_fn=sfn,
                                  knn_fn=kfn))
    n2 = math.sqrt(16 + 9 + 4)
    assert math.isclose(out2[3], 4 / n2)
    # constant window minmax-normalizes to 1.0 (documented edge)
    node3 = {"linear": {"retrievers": [
        {"retriever": {"knn": {"tag": "v0", "k": 1}},
         "weight": 3.0, "normalizer": "minmax"},
    ]}}
    out3 = dict(execute_retriever(node3, 10, standard_fn=sfn,
                                  knn_fn=kfn))
    assert out3 == {2: 3.0}


def test_nested_tree_rrf_of_linear():
    sfn, kfn = _leaves(S, K)
    inner = {"linear": {"rank_window_size": 10, "retrievers": [
        {"retriever": {"standard": {"query": "qa"}},
         "weight": 1.0, "normalizer": "minmax"}]}}
    node = {"rrf": {"rank_window_size": 10, "retrievers": [
        inner, {"standard": {"query": "qb"}}]}}
    out = execute_retriever(node, 10, standard_fn=sfn, knn_fn=kfn)
    # inner linear ranking == qa ranking; doc1 r1+r3, doc3 r3+r1 tie
    assert [d for d, _ in out[:2]] == [1, 3]
    t = search_retriever({"retriever": node, "size": 3},
                         k=3, standard_fn=sfn, knn_fn=kfn)
    assert t.column_names == ["rank", "id", "score"]
    assert t["rank"].to_pylist() == [1, 2, 3]
    assert t["id"].to_pylist() == [d for d, _ in out[:3]]


def test_validation():
    sfn, kfn = _leaves(S, K)
    with pytest.raises(ValueError, match="unknown retriever kind"):
        execute_retriever({"nope": {}}, 5, standard_fn=sfn, knn_fn=kfn)
    with pytest.raises(ValueError, match="single-key"):
        execute_retriever({"a": {}, "b": {}}, 5,
                          standard_fn=sfn, knn_fn=kfn)
    with pytest.raises(ValueError, match="retrievers list"):
        execute_retriever({"rrf": {}}, 5, standard_fn=sfn, knn_fn=kfn)
    with pytest.raises(ValueError, match="unknown normalizer"):
        execute_retriever(
            {"linear": {"retrievers": [
                {"retriever": {"standard": {"query": "qa"}},
                 "normalizer": "zscore"}]}},
            5, standard_fn=sfn, knn_fn=kfn)
    with pytest.raises(ValueError, match="no knn leaf"):
        execute_retriever({"knn": {"tag": "v0"}}, 5, standard_fn=sfn)
