"""ES join-family queries (has_child / has_parent over the
conversation-turn hierarchy), dis_max, and rank_feature — each pinned
against a brute-force in-Python BM25 oracle over the synthetic corpus,
local and actor-served.

The document model is the transcript hierarchy itself: the conversation
is the parent (its searchable text = the turn_idx == 0 opener), the
turns are the children — the ES ``join``-field relation re-expressed on
the repo's docid layout (conv rank << turn_bits | turn_idx), where a
conversation never spans shards.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from excelastic_ray.analysis import query_terms, tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=6, convs_per_chunk_bits=3, num_shards=4)

QUERIES = ["the run", "call ok", "the", "zzz_absent_term the"]


@pytest.fixture(scope="module")
def jq(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=80, seed=11)
    idx = str(tmp_path_factory.mktemp("joinq") / "idx")
    build_index(rd.from_arrow(table), idx, CFG, clear=True)

    texts = table["text"].to_pylist()
    convs = table["conv_id"].to_pylist()
    turns = table["turn_idx"].to_pylist()
    toks = [tokenize(t) for t in texts]
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    n = len(texts)
    avgdl = float(dls.mean())
    dfreq: dict[str, int] = defaultdict(int)
    for tt in toks:
        for t in set(tt):
            dfreq[t] += 1

    def bm25(q: str, conjunctive: bool = False) -> np.ndarray:
        terms = query_terms(q)
        out = np.zeros(n)
        nm = np.zeros(n, dtype=int)
        live = [t for t in terms if dfreq.get(t, 0) > 0]
        if conjunctive and len(live) < len(terms):
            return out
        for t in live:
            df = dfreq[t]
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, tt in enumerate(toks):
                tf = tt.count(t)
                if tf:
                    out[i] += (
                        idf * tf * 2.2
                        / (tf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
                    )
                    nm[i] += 1
        if conjunctive:
            out[nm < len(live)] = 0.0
        return out

    return {
        "engine": QueryEngine(idx),
        "actor_engine": QueryEngine(idx, use_actors=True),
        "bm25": bm25,
        "convs": convs,
        "turns": turns,
        "n": n,
        "corpus_dl": dls,
    }


AGG_FN = {
    "max": max,
    "sum": sum,
    "min": min,
    "avg": lambda v: sum(v) / len(v),
}


@pytest.mark.parametrize("score_mode", ["max", "sum", "avg", "min"])
@pytest.mark.parametrize("query", QUERIES)
def test_has_child_matches_bruteforce(jq, score_mode, query):
    sc = jq["bm25"](query)
    per_conv: dict[str, list[float]] = defaultdict(list)
    for i in np.flatnonzero(sc > 0):
        per_conv[jq["convs"][i]].append(sc[i])
    exp = sorted(
        ((AGG_FN[score_mode](v), c, len(v)) for c, v in per_conv.items()),
        key=lambda r: (-r[0], r[1]),
    )[:10]
    t = jq["engine"].search_has_child(query, k=10, score_mode=score_mode)
    got = list(
        zip(t["score"].to_pylist(), t["conv_id"].to_pylist(),
            t["n_children"].to_pylist())
    )
    assert len(got) == len(exp)
    for (es, ec, en), (gs, gc, gn) in zip(exp, got):
        assert (ec, en) == (gc, gn)
        assert gs == pytest.approx(es, abs=1e-9)


def test_has_child_children_bounds(jq):
    sc = jq["bm25"]("the run")
    per_conv: dict[str, list[float]] = defaultdict(list)
    for i in np.flatnonzero(sc > 0):
        per_conv[jq["convs"][i]].append(sc[i])
    exp = sorted(
        ((max(v), c, len(v)) for c, v in per_conv.items()
         if 3 <= len(v) <= 8),
        key=lambda r: (-r[0], r[1]),
    )[:10]
    t = jq["engine"].search_has_child(
        "the run", k=10, min_children=3, max_children=8
    )
    got = list(
        zip(t["score"].to_pylist(), t["conv_id"].to_pylist(),
            t["n_children"].to_pylist())
    )
    assert [(c, nc) for _, c, nc in exp] == [(c, nc) for _, c, nc in got]
    assert all(3 <= nc <= 8 for _, _, nc in got)


def test_has_child_score_mode_none_is_conv_ordered(jq):
    sc = jq["bm25"]("call ok")
    matched = sorted({jq["convs"][i] for i in np.flatnonzero(sc > 0)})
    t = jq["engine"].search_has_child("call ok", k=10, score_mode="none")
    assert t["conv_id"].to_pylist() == matched[:10]
    assert set(t["score"].to_pylist()) <= {1.0}


@pytest.mark.parametrize("query", QUERIES)
def test_has_parent_matches_bruteforce(jq, query):
    sc = jq["bm25"](query)
    parents = sorted(
        ((sc[i], jq["convs"][i]) for i in np.flatnonzero(sc > 0)
         if jq["turns"][i] == 0),
        key=lambda r: (-r[0], r[1]),
    )
    kids: dict[str, list[int]] = defaultdict(list)
    for i in range(jq["n"]):
        if jq["turns"][i] >= 1:
            kids[jq["convs"][i]].append(jq["turns"][i])
    exp = []
    for s, c in parents:
        for ti in sorted(kids[c]):
            exp.append((c, ti, s))
            if len(exp) == 10:
                break
        if len(exp) == 10:
            break
    t = jq["engine"].search_has_parent(query, k=10)
    got = list(
        zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
            t["score"].to_pylist())
    )
    assert len(got) == len(exp)
    for (ec, et, es), (gc, gt, gs) in zip(exp, got):
        assert (ec, et) == (gc, gt)
        assert gs == pytest.approx(es, abs=1e-9)


def test_has_parent_score_none_is_docid_ordered(jq):
    sc = jq["bm25"]("the run")
    matched = sorted(
        {jq["convs"][i] for i in np.flatnonzero(sc > 0)
         if jq["turns"][i] == 0}
    )
    kids = sorted(
        (jq["convs"][i], jq["turns"][i])
        for i in range(jq["n"])
        if jq["turns"][i] >= 1 and jq["convs"][i] in set(matched)
    )
    t = jq["engine"].search_has_parent("the run", k=10, score=False)
    got = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    assert got == kids[:10]
    assert set(t["score"].to_pylist()) <= {1.0}


def test_has_parent_exhausts_rare_parent_set(jq):
    # a df-1-ish rare query matches few openers: k far beyond the total
    # child count must return exactly every child, not loop forever
    sc = jq["bm25"]("the run")
    parents = [
        (sc[i], jq["convs"][i])
        for i in np.flatnonzero(sc > 0)
        if jq["turns"][i] == 0
    ]
    total_kids = sum(
        1 for i in range(jq["n"])
        if jq["turns"][i] >= 1
        and jq["convs"][i] in {c for _, c in parents}
    )
    t = jq["engine"].search_has_parent("the run", k=total_kids + 500)
    assert t.num_rows == total_kids


@pytest.mark.parametrize("tie_breaker", [0.0, 0.3])
def test_dismax_matches_bruteforce(jq, tie_breaker):
    qs = ["the run", "call ok"]
    s1, s2 = jq["bm25"](qs[0]), jq["bm25"](qs[1])
    best = np.maximum(s1, s2)
    dm = np.where(best > 0, best + tie_breaker * (s1 + s2 - best), 0.0)
    exp = sorted(
        ((dm[i], jq["convs"][i], jq["turns"][i])
         for i in np.flatnonzero(dm > 0)),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:10]
    t = jq["engine"].search_dismax(qs, k=10, tie_breaker=tie_breaker)
    got = list(
        zip(t["score"].to_pylist(), t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist())
    )
    assert [(c, ti) for _, c, ti in exp] == [(c, ti) for _, c, ti in got]
    for (es, _, _), (gs, _, _) in zip(exp, got):
        assert gs == pytest.approx(es, abs=1e-9)


def test_dismax_absent_subquery_drops_out(jq):
    # dis_max of (real, absent) == plain match of the real subquery
    a = jq["engine"].search_dismax(["call ok", "zzz_absent_term"], k=10)
    b = jq["engine"].search(  # plain match, same analyzer path
        "call ok", k=10
    )
    assert a["docid"].to_pylist() == b["docid"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


@pytest.mark.parametrize(
    "function,kwargs",
    [
        ("saturation", {"pivot": 20.0, "boost": 1.5}),
        ("log", {"scale": 0.5, "boost": 2.0}),
        ("sigmoid", {"pivot": 25.0, "exponent": 2.0, "boost": 1.0}),
    ],
)
def test_rank_feature_matches_bruteforce(jq, function, kwargs):
    q = "the run"
    sc = jq["bm25"](q)
    sc_nz = np.flatnonzero(sc > 0)
    # the feature is the analyzer token count == the indexed doc length
    corpus_dl = jq["corpus_dl"]
    if function == "saturation":
        feat = corpus_dl / (corpus_dl + kwargs["pivot"])
    elif function == "log":
        feat = np.log(kwargs["scale"] * corpus_dl + 1.0)
    else:
        feat = corpus_dl ** kwargs["exponent"] / (
            corpus_dl ** kwargs["exponent"]
            + kwargs["pivot"] ** kwargs["exponent"]
        )
    rf = np.where(sc > 0, sc + kwargs["boost"] * feat, 0.0)
    exp = sorted(
        ((rf[i], jq["convs"][i], jq["turns"][i]) for i in sc_nz),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:10]
    t = jq["engine"].search_rank_feature(q, k=10, function=function,
                                         **kwargs)
    got = list(
        zip(t["score"].to_pylist(), t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist())
    )
    assert [(c, ti) for _, c, ti in exp] == [(c, ti) for _, c, ti in got]
    for (es, _, _), (gs, _, _) in zip(exp, got):
        assert gs == pytest.approx(es, abs=1e-9)


def test_rank_feature_needs_pivot(jq):
    with pytest.raises(ValueError):
        jq["engine"].search_rank_feature("the", function="saturation")


@pytest.mark.parametrize("query", ["the to a and of call", "the run"])
def test_terms_set_matches_bruteforce(jq, query):
    sc = jq["bm25"](query)
    # distinct-matched-terms count per doc, from the same brute force
    nm = np.zeros(jq["n"], dtype=int)
    for t in set(query_terms(query)):
        one = jq["bm25"](t)
        nm += (one > 0).astype(int)
    req = np.maximum(np.asarray(jq["turns"]), 1)
    ts = np.where(nm >= req, sc, 0.0)
    exp = sorted(
        ((ts[i], jq["convs"][i], jq["turns"][i])
         for i in np.flatnonzero(ts > 0)),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:10]
    t = jq["engine"].search_terms_set(query, k=10)
    got = list(
        zip(t["score"].to_pylist(), t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist())
    )
    assert [(c, ti) for _, c, ti in exp] == [(c, ti) for _, c, ti in got]
    for (es, _, _), (gs, _, _) in zip(exp, got):
        assert gs == pytest.approx(es, abs=1e-9)


def test_script_score_matches_bruteforce(jq):
    q = "the run"
    sc = jq["bm25"](q)
    dl = jq["corpus_dl"]
    ti = np.asarray(jq["turns"], dtype=np.float64)
    ss = np.where(sc > 0, sc * 0.5 + np.log(1 + dl) - 0.1 * ti + 2.0, 0.0)
    exp = sorted(
        ((ss[i], jq["convs"][i], jq["turns"][i])
         for i in np.flatnonzero(sc > 0)),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:10]
    t = jq["engine"].search_script_score(
        q, "_score * 0.5 + ln(1 + dl) - 0.1 * turn_idx + w", k=10,
        params={"w": 2.0},
    )
    got = list(
        zip(t["score"].to_pylist(), t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist())
    )
    assert [(c, t_) for _, c, t_ in exp] == [(c, t_) for _, c, t_ in got]
    for (es, _, _), (gs, _, _) in zip(exp, got):
        assert gs == pytest.approx(es, abs=1e-9)


ROLES = ["user", "assistant", "system", "tool"]


@pytest.mark.parametrize("max_per_conv", [None, 2, 1])
def test_sampler_matches_bruteforce(jq, max_per_conv):
    q = "the run"
    sc = jq["bm25"](q)
    # shard = (conv_rank >> convs_per_chunk_bits) % num_shards; the
    # fixture's conv ids are dense and sorted, so rank == numeric id
    rows = []
    for i in np.flatnonzero(sc > 0):
        cr = int(jq["convs"][i].split("-")[1])
        shard = (cr >> CFG.convs_per_chunk_bits) % CFG.num_shards
        rows.append((shard, -sc[i], jq["convs"][i], jq["turns"][i]))
    rows.sort()
    from collections import Counter, defaultdict

    exp: Counter = Counter()
    taken = defaultdict(int)
    per_conv = defaultdict(int)
    for shard, negs, conv, ti in rows:
        if max_per_conv is not None:
            if per_conv[(shard, conv)] >= max_per_conv:
                continue
            per_conv[(shard, conv)] += 1
        if taken[shard] >= 20:
            continue
        taken[shard] += 1
        exp[ROLES[ti % 4]] += 1
    t = jq["engine"].search_sampler(
        q, attr="role", shard_size=20, max_per_conv=max_per_conv
    )
    got = dict(zip(t["role"].to_pylist(), t["doc_count"].to_pylist()))
    assert got == dict(exp)


@pytest.mark.parametrize(
    "bad",
    [
        "__import__('os').system('x')",
        "dl[0]",
        "dl.sum()",
        "x if dl else 2",
        "'a' + 'b'",
        "lambda: 1",
        "unknown_name + 1",
        "min(dl)",
        "(1,2)",
    ],
)
def test_script_score_rejects_non_grammar(jq, bad):
    with pytest.raises(ValueError):
        jq["engine"].search_script_score("the", bad, k=5)


def test_script_score_param_validation(jq):
    with pytest.raises(ValueError):
        jq["engine"].search_script_score(
            "the", "_score + w", k=5, params={"w": "nope"}
        )
    with pytest.raises(ValueError):
        jq["engine"].search_script_score(
            "the", "_score", k=5, params={"dl": 3.0}
        )


@pytest.mark.parametrize(
    "call",
    [
        lambda e: e.search_has_child("the run", k=10, score_mode="sum"),
        lambda e: e.search_has_child("the", k=5, score_mode="avg",
                                     min_children=2),
        lambda e: e.search_has_parent("the run", k=10),
        lambda e: e.search_has_parent("call ok", k=10, score=False),
        lambda e: e.search_dismax(["the run", "call ok"], k=10,
                                  tie_breaker=0.3),
        lambda e: e.search_rank_feature("the run", k=10, pivot=20.0,
                                        boost=1.5),
        lambda e: e.search_terms_set("the to a and of call", k=10),
        lambda e: e.search_script_score(
            "the run", "_score + ln(1 + dl) - 0.1 * turn_idx", k=10
        ),
        lambda e: e.search_sampler("the run", attr="role",
                                   shard_size=20, max_per_conv=2),
    ],
)
def test_actor_parity(jq, call):
    assert call(jq["engine"]).equals(call(jq["actor_engine"]))


@pytest.mark.parametrize("query", ["the run", "call ok"])
def test_has_child_inner_hits_matches_bruteforce(jq, query):
    """inner_hits=N returns each ranked parent's top-N matching
    children (score DESC, turn ASC), parent columns replicated, local
    == actor-served."""
    sc = jq["bm25"](query)
    per_conv: dict[str, list[tuple[float, int]]] = defaultdict(list)
    for i in np.flatnonzero(sc > 0):
        per_conv[jq["convs"][i]].append((sc[i], jq["turns"][i]))
    parents = sorted(
        ((sum(s for s, _ in v), c, len(v)) for c, v in per_conv.items()),
        key=lambda r: (-r[0], r[1]),
    )[:5]

    t = jq["engine"].search_has_child(query, k=5, score_mode="sum",
                                      inner_hits=3)
    rows = list(zip(t["rank"].to_pylist(), t["conv_id"].to_pylist(),
                    t["n_children"].to_pylist(), t["score"].to_pylist(),
                    t["child_turn_idx"].to_pylist(),
                    t["child_score"].to_pylist(),
                    t["child_rank"].to_pylist()))
    # expected flat rows: per parent, top-3 children by (score DESC,
    # turn ASC), child_rank 1-based
    exp = []
    for rk, (ps, c, nc) in enumerate(parents, 1):
        kids = sorted(per_conv[c], key=lambda st: (-st[0], st[1]))[:3]
        for cr, (cs, ti) in enumerate(kids, 1):
            exp.append((rk, c, nc, ps, ti, cs, cr))
    assert len(rows) == len(exp)
    for g, e in zip(rows, exp):
        assert g[:3] == e[:3] and g[4] == e[4] and g[6] == e[6]
        assert g[3] == pytest.approx(e[3], abs=1e-9)
        assert g[5] == pytest.approx(e[5], abs=1e-9)

    # actor pool serves the identical table
    ta = jq["actor_engine"].search_has_child(query, k=5, score_mode="sum",
                                             inner_hits=3)
    assert ta.equals(t)


def test_has_child_inner_hits_validates_and_empties(jq):
    with pytest.raises(ValueError, match="inner_hits"):
        jq["engine"].search_has_child("the", inner_hits=0)
    t = jq["engine"].search_has_child("zzz_absent_only", k=5,
                                      inner_hits=2)
    assert t.num_rows == 0
    assert t.column_names == [
        "rank", "conv_id", "n_children", "score",
        "child_turn_idx", "child_score", "child_rank",
    ]
