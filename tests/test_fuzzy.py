"""Fuzzy matching (ES fuzziness): Levenshtein expansion over the sorted
term dictionary, scored as a bool-of-terms OR (scoring_boolean rewrite).
Classic Levenshtein — transpositions count 2 (the ES
``transpositions: false`` mode), matching SQL ``levenshtein()``."""

from __future__ import annotations

import numpy as np
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=3, num_shards=4)


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    D = list(range(n + 1))
    for i in range(1, m + 1):
        prev, D[0] = D[0], i
        for j in range(1, n + 1):
            prev, D[j] = D[j], min(
                D[j] + 1, D[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return D[n]


@pytest.fixture(scope="module")
def fz(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=30, seed=5)
    idx = str(tmp_path_factory.mktemp("fuzzyidx") / "idx")
    build_index(rd.from_arrow(table), idx, CFG, clear=True)
    vocab = sorted({t for tx in table["text"].to_pylist() for t in tokenize(tx)})
    return QueryEngine(idx), vocab


@pytest.mark.parametrize("term,d", [("w00001", 1), ("the", 1), ("cal", 2),
                                    ("zzzz", 1)])
def test_expand_fuzzy_matches_bruteforce(fz, term, d):
    eng, vocab = fz
    exp = sorted(
        ((dd, t) for t in vocab if (dd := _lev(term, t)) <= d)
    )[:10]
    got = eng.expand_fuzzy(term, d, max_expansions=10)
    assert got == [t for _, t in exp]


def test_search_fuzzy_scores_expansion_as_or(fz):
    eng, vocab = fz
    exp_terms = eng.expand_fuzzy("cal", 1, max_expansions=50)
    assert exp_terms  # "call" is a hot token
    a = eng.search_fuzzy("cal", k=10, fuzziness=1)
    b = eng.search(" ".join(exp_terms), k=10)
    assert a.equals(b)


def test_auto_fuzziness_ladder():
    f = QueryEngine.auto_fuzziness
    assert (f("ab"), f("abc"), f("abcde"), f("abcdef")) == (0, 1, 1, 2)


def test_prefix_length_restricts_candidates(fz):
    eng, vocab = fz
    full = set(eng.expand_fuzzy("the", 1, max_expansions=1000))
    pfx = set(eng.expand_fuzzy("the", 1, prefix_length=1,
                               max_expansions=1000))
    assert pfx == {t for t in full if t.startswith("t")}


def test_fuzzy_absent_term_empty(fz):
    eng, _ = fz
    t = eng.search_fuzzy("qqqqqqqqqq", k=5, fuzziness=1)
    assert t.num_rows == 0


def test_fuzzy_actor_parity(fz, ray_session):
    eng, _ = fz
    actors = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actors.search_fuzzy("cal the", k=8, fuzziness=1)
        b = eng.search_fuzzy("cal the", k=8, fuzziness=1)
        assert a.equals(b)
    finally:
        actors.close()
