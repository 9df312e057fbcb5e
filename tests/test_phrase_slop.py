"""Sloppy phrase matching: windowed in-order semantics (each later term
may trail its exact slot by ≤ slop positions; anchors are first-term
positions). slop=0 must stay bit-identical to exact match_phrase."""

from __future__ import annotations

import math

import numpy as np
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=3, num_shards=4)


@pytest.fixture(scope="module")
def sl(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=30, seed=19)
    idx = str(tmp_path_factory.mktemp("slopidx") / "idx")
    build_index(rd.from_arrow(table), idx, CFG, clear=True)
    return QueryEngine(idx), table


def _anchors(toks: list[str], terms: list[str], slop: int) -> int:
    """Reference windowed-anchor count."""
    n = 0
    for a, t in enumerate(toks):
        if t != terms[0]:
            continue
        ok = True
        for j in range(1, len(terms)):
            if not any(
                a + j + d < len(toks) and toks[a + j + d] == terms[j]
                for d in range(slop + 1)
            ):
                ok = False
                break
        if ok:
            n += 1
    return n


def _oracle_scores(table, terms, slop):
    rows = []
    toks_all = [tokenize(t) for t in table["text"].to_pylist()]
    N = len(toks_all)
    dls = [len(t) for t in toks_all]
    avgdl = sum(dls) / N
    matches = []
    for key, toks, dl in zip(
        zip(table["conv_id"].to_pylist(), table["turn_idx"].to_pylist()),
        toks_all, dls,
    ):
        ptf = _anchors(toks, terms, slop)
        if ptf:
            matches.append((key, ptf, dl))
    df = len(matches)
    if not df:
        return []
    p_idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    for key, ptf, dl in matches:
        s = p_idf * (ptf * 2.2) / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        rows.append(((key[0], int(key[1])), s))
    rows.sort(key=lambda kv: (-kv[1], kv[0]))
    return rows


@pytest.mark.parametrize("phrase,slop", [
    ("the the", 1), ("call run", 2), ("the a of", 1), ("ok the", 3),
])
def test_slop_matches_bruteforce(sl, phrase, slop):
    eng, table = sl
    terms = phrase.split()
    exp = _oracle_scores(table, terms, slop)
    got = eng.search_phrase(phrase, k=len(exp) + 5, slop=slop)
    assert got.num_rows == len(exp)
    assert (
        list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
        == [k for k, _ in exp]
    )
    for g, (_, e) in zip(got["score"].to_pylist(), exp):
        assert g == pytest.approx(e, abs=1e-12)


def test_slop_zero_is_exact_phrase(sl):
    eng, _ = sl
    a = eng.search_phrase("the call", k=20, slop=0)
    b = eng.search_phrase("the call", k=20)
    assert a.equals(b)


def test_slop_widens_monotonically(sl):
    eng, _ = sl
    counts = [
        eng.search_phrase("call run", k=10_000, slop=s).num_rows
        for s in (0, 1, 2, 4)
    ]
    assert counts == sorted(counts)


def test_slop_actor_parity(sl, ray_session):
    eng, _ = sl
    actors = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actors.search_phrase("call run", k=12, slop=2)
        b = eng.search_phrase("call run", k=12, slop=2)
        assert a.equals(b)
    finally:
        actors.close()
