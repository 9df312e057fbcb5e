"""Round-5 search-surface additions: ES ``min_score``, ``script_fields``
(computed fetch-phase columns through the safe expression language) and
the fuzzy completion suggester.

Reference behaviors: ES search ``min_score`` drops sub-threshold hits
before pagination; ``script_fields`` scripts run per RETURNED hit only;
Lucene FuzzyCompletionQuery matches the typed input against term
PREFIXES within an edit budget (the user may stop mid-word)."""

from __future__ import annotations

import numpy as np
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.query.engine import QueryEngine, _min_prefix_lev


@pytest.fixture(scope="module")
def eng(tiny_index):
    idx, _ = tiny_index
    return QueryEngine(idx)


# ---------------------------------------------------------------- min_score


def test_min_score_equals_brute_filter(eng, query_set):
    for q in query_set:
        full = eng.search(q, k=50)
        scores = full["score"].to_numpy()
        if not len(scores):
            continue
        thr = float(np.median(scores))
        got = eng.search(q, k=50, min_score=thr)
        keep = scores >= thr
        assert got["docid"].to_pylist() == (
            full["docid"].to_numpy()[keep].tolist()
        )
        assert got["score"].to_pylist() == scores[keep].tolist()


def test_min_score_composes_with_offset(eng, query_set):
    q = query_set[5]
    full = eng.search(q, k=50, min_score=0.1)
    page = eng.search(q, k=5, offset=3, min_score=0.1)
    assert page["docid"].to_pylist() == full["docid"].to_pylist()[3:8]
    # rank numbers continue from the offset, over the FILTERED ranking
    assert page["rank"].to_pylist() == list(range(4, 4 + page.num_rows))


def test_min_score_extremes(eng, query_set):
    q = query_set[5]
    assert eng.search(q, k=10, min_score=1e9).num_rows == 0
    a = eng.search(q, k=10, min_score=-1.0)
    b = eng.search(q, k=10)
    assert a.equals(b)


# ------------------------------------------------------------ script_fields


def test_script_fields_ranking_untouched(eng, query_set):
    fields = {"s2": "_score * 2.0", "ti": "turn_idx + 0.0"}
    for q in query_set[:6]:
        base = eng.search(q, k=10)
        got = eng.search_script_fields(q, fields, k=10)
        assert got["docid"].to_pylist() == base["docid"].to_pylist()
        assert got["score"].to_pylist() == base["score"].to_pylist()
        np.testing.assert_array_equal(
            got["s2"].to_numpy(), 2.0 * got["score"].to_numpy()
        )
        np.testing.assert_array_equal(
            got["ti"].to_numpy(),
            got["turn_idx"].to_numpy().astype(np.float64),
        )


def test_script_fields_dl_matches_corpus(eng, tiny_table, query_set):
    dl_of = {
        (c, t): len(tokenize(x))
        for c, t, x in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    got = eng.search_script_fields(query_set[5], {"dl_ln": "ln(dl)"}, k=20)
    for c, t, v in zip(
        got["conv_id"].to_pylist(),
        got["turn_idx"].to_pylist(),
        got["dl_ln"].to_pylist(),
    ):
        assert v == pytest.approx(np.log(dl_of[(c, t)]), rel=0, abs=0)


def test_script_fields_params_and_modes(eng, query_set):
    q = query_set[5]
    got = eng.search_script_fields(
        q, {"w3": "_score * w"}, k=10, params={"w": 3.0}, mode="and"
    )
    base = eng.search(q, k=10, mode="and")
    assert got["docid"].to_pylist() == base["docid"].to_pylist()
    np.testing.assert_allclose(
        got["w3"].to_numpy(), 3.0 * got["score"].to_numpy(), rtol=0
    )


def test_script_fields_validation(eng):
    with pytest.raises(ValueError):
        eng.search_script_fields("the", {})
    with pytest.raises(ValueError):
        eng.search_script_fields("the", {"score": "_score"})
    with pytest.raises(ValueError):
        eng.search_script_fields("the", {"x": "__import__('os')"})
    with pytest.raises(ValueError):
        eng.search_script_fields("the", {"x": "_score"},
                                 params={"dl": 1.0})
    with pytest.raises(ValueError):
        eng.search_script_fields("the", {"x": "_score"},
                                 params={"s": "nope"})


def test_script_fields_absent_term(eng):
    t = eng.search_script_fields("term_not_in_corpus", {"x": "_score"})
    assert t.num_rows == 0
    assert "x" in t.column_names


# ----------------------------------------------------------- complete_fuzzy


def _vocab_df(tiny_table):
    from collections import Counter

    df = Counter()
    for x in tiny_table["text"].to_pylist():
        df.update(set(tokenize(x)))
    return df


def test_min_prefix_lev_brute(rng=np.random.default_rng(11)):
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(nd[j - 1] + 1, d[j] + 1,
                              d[j - 1] + (ca != cb)))
            d = nd
        return d[-1]

    alphabet = "abc"
    words = ["".join(w) for n in range(0, 5)
             for w in itertools.product(alphabet, repeat=n)]
    for q in ["a", "ab", "abc", "cab", "bbbb"]:
        got = _min_prefix_lev(np.array(words, dtype=object), q, 2)
        for w, g in zip(words, got.tolist()):
            exp = min(lev(w[:j], q) for j in range(len(w) + 1))
            # beyond the cutoff the kernel may overestimate (documented)
            assert g == exp or (exp > 2 and g > 2), (w, q, g, exp)


def test_complete_fuzzy_vs_bruteforce(eng, tiny_table):
    df = _vocab_df(tiny_table)
    for p in ("tabl", "spak", "th"):
        got = eng.complete_fuzzy(p, k=8, fuzziness=1, prefix_length=1)
        cands = sorted(t for t in df if t.startswith(p[:1]))
        exp = []
        for t in cands:
            d = int(
                _min_prefix_lev(np.array([t], dtype=object), p, 1)[0]
            )
            if d <= 1:
                exp.append((-df[t], t, d))
        exp.sort()
        assert got["term"].to_pylist() == [t for _, t, _ in exp[:8]]
        assert got["dist"].to_pylist() == [d for _, _, d in exp[:8]]
        assert got["df"].to_pylist() == [-n for n, _, _ in exp[:8]]


def test_complete_fuzzy_zero_fuzz_equals_exact(eng, query_set):
    # fuzziness=0 with the whole input as the exact stem IS the exact
    # completion suggester
    p = query_set[1][:2] if len(query_set[1]) >= 2 else "th"
    a = eng.complete_fuzzy(p, k=5, fuzziness=0, prefix_length=len(p))
    b = eng.complete(p, k=5)
    assert a["term"].to_pylist() == b["term"].to_pylist()
    assert a["df"].to_pylist() == b["df"].to_pylist()
    assert set(a["dist"].to_pylist()) <= {0}


def test_complete_fuzzy_bad_args(eng):
    with pytest.raises(ValueError):
        eng.complete_fuzzy("tabl", fuzziness=-1)
    with pytest.raises(ValueError):
        eng.complete_fuzzy("tabl", prefix_length=0)
    assert eng.complete_fuzzy("two words").num_rows == 0


# -------------------------------------------------------------- actor parity


def test_round5_actor_parity(tiny_index, ray_session, query_set):
    idx, _ = tiny_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        q = query_set[5]
        a = actors.search(q, k=10, min_score=0.2)
        b = local.search(q, k=10, min_score=0.2)
        assert a.equals(b)
        fields = {"x": "ln(dl) + _score"}
        a = actors.search_script_fields(q, fields, k=10)
        b = local.search_script_fields(q, fields, k=10)
        assert a.equals(b)
    finally:
        actors.close()


# -------------------------------------------------------- frequent_item_sets


def _fis_brute(txns: dict[str, set], min_support, min_size, max_size, k):
    from itertools import combinations

    n = len(txns)
    counts: dict[tuple, int] = {}
    for items in txns.values():
        for size in range(1, max_size + 1):
            for c in combinations(sorted(items), size):
                counts[c] = counts.get(c, 0) + 1
    freq = {c: v for c, v in counts.items()
            if v / n >= min_support and len(c) >= min_size}
    closed = {
        c: v for c, v in freq.items()
        if not any(
            set(c) < set(d) and w == v for d, w in freq.items()
        )
    }
    rows = sorted(
        (("|".join(c), len(c), v) for c, v in closed.items()),
        key=lambda r: (-r[2], r[1], r[0]),
    )[:k]
    return rows


def _basket_ds(txns: dict[str, set]):
    import pyarrow as pa
    import ray.data as rd

    conv, tool = [], []
    for t, items in txns.items():
        for it in sorted(items):
            # duplicate rows on purpose: distinctness is the op's job
            conv.extend([t, t])
            tool.extend([it, it])
    return rd.from_arrow(pa.table({"conv_id": conv, "tool": tool}))


def test_frequent_item_sets_vs_bruteforce(ray_session):
    from excelastic_ray.pipelines.convs import frequent_item_sets

    rng = np.random.default_rng(5)
    vocab = [f"tool{i}" for i in range(8)]
    txns = {
        f"c{i:03d}": set(
            rng.choice(vocab, size=rng.integers(1, 5), replace=False)
        )
        for i in range(60)
    }
    got = frequent_item_sets(
        _basket_ds(txns), min_support=0.1, max_set_size=3, k=15,
        n_buckets=4,
    )
    exp = _fis_brute(txns, 0.1, 1, 3, 15)
    assert list(zip(
        got["item_set"].to_pylist(), got["size"].to_pylist(),
        got["doc_count"].to_pylist(),
    )) == exp
    n = len(txns)
    for c, s in zip(got["doc_count"].to_pylist(),
                    got["support"].to_pylist()):
        assert s == pytest.approx(
            np.floor(c / n * 1e6 + 0.5) / 1e6, abs=0)


def test_frequent_item_sets_closure_and_min_size(ray_session):
    from excelastic_ray.pipelines.convs import frequent_item_sets

    # a and b always co-occur: the singletons {a} and {b} are NOT
    # closed (superset a|b has the same count) and must not appear
    txns = {f"c{i}": {"a", "b"} for i in range(10)}
    txns["d0"] = {"c"}
    got = frequent_item_sets(_basket_ds(txns), min_support=0.05, k=10)
    assert got["item_set"].to_pylist() == ["a|b", "c"]

    got = frequent_item_sets(
        _basket_ds(txns), min_support=0.05, min_set_size=2, k=10
    )
    assert got["item_set"].to_pylist() == ["a|b"]


def test_frequent_item_sets_budget_and_args(ray_session):
    from excelastic_ray.pipelines.convs import frequent_item_sets

    txns = {f"c{i}": {f"t{j}" for j in range(12)} for i in range(4)}
    with pytest.raises(RuntimeError, match="candidate_budget"):
        frequent_item_sets(
            _basket_ds(txns), min_support=0.05, max_set_size=3,
            candidate_budget=100, n_buckets=1,
        )
    with pytest.raises(ValueError):
        frequent_item_sets(_basket_ds(txns), min_support=0.0)
    with pytest.raises(ValueError):
        frequent_item_sets(_basket_ds(txns), min_set_size=3,
                           max_set_size=2)


# --------------------------------------------------------------- mtermvectors


def test_mtermvectors_equals_per_doc(eng, tiny_table):
    conv0 = tiny_table["conv_id"][0].as_py()
    conv1 = tiny_table["conv_id"].to_pylist()[-1]
    ids = [(conv0, 0), (conv1, 0), (conv0, 1)]
    got = eng.mtermvectors(ids)
    import pyarrow as pa

    parts = []
    for c, t in ids:
        tv = eng.termvectors(c, t)
        parts.append(pa.table({
            "conv_id": pa.array([c] * tv.num_rows, type=pa.string()),
            "turn_idx": pa.array([t] * tv.num_rows, type=pa.int32()),
            "term": tv["term"], "tf": tv["tf"], "df": tv["df"],
        }))
    assert got.equals(pa.concat_tables(parts))


def test_mtermvectors_skips_and_dedupes(eng, tiny_table):
    conv0 = tiny_table["conv_id"][0].as_py()
    got = eng.mtermvectors([
        ("no_such_conv", 0), (conv0, 0), (conv0, 4000), (conv0, 0),
        f"{conv0}#0",
    ])
    # one doc survives, reported once despite three references
    assert set(got["conv_id"].to_pylist()) == {conv0}
    assert set(got["turn_idx"].to_pylist()) == {0}
    assert got.num_rows == eng.termvectors(conv0, 0).num_rows
    assert eng.mtermvectors([("no_such_conv", 0)]).num_rows == 0


def test_mtermvectors_actor_parity(tiny_index, ray_session, tiny_table):
    idx, _ = tiny_index
    conv0 = tiny_table["conv_id"][0].as_py()
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        ids = [(conv0, 0), (conv0, 1), ("nope", 2)]
        assert actors.mtermvectors(ids).equals(local.mtermvectors(ids))
    finally:
        actors.close()


# --------------------------------------------------------- highlight fragments


def test_highlight_fragments_properties(eng, tiny_table, query_set):
    from excelastic_ray.query.engine import highlight_fragments

    texts = {
        (c, t): x
        for c, t, x in zip(tiny_table["conv_id"].to_pylist(),
                           tiny_table["turn_idx"].to_pylist(),
                           tiny_table["text"].to_pylist())
    }
    q = query_set[5]
    got = eng.search(q, k=15, highlight=True, fragment_size=60,
                     number_of_fragments=3)
    terms = set(tokenize(q))
    for key, frags in zip(
        zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()),
        got["highlight"].to_pylist(),
    ):
        assert 1 <= len(frags) <= 3
        text = texts[key]
        for f in frags:
            assert "<em>" in f
            plain = f.replace("<em>", "").replace("</em>", "")
            # every fragment is a literal substring of the source
            assert plain in text
            # wrapped tokens are exactly the query terms
            import re as _re

            for m in _re.finditer(r"<em>(.*?)</em>", f):
                assert m.group(1).lower() in terms
        # deterministic: direct call agrees
        assert frags == highlight_fragments(text, terms, "standard",
                                            60, 3)


def test_highlight_fragments_rule():
    from excelastic_ray.query.engine import highlight_fragments

    text = ("alpha beta gamma delta " * 5 + "NEEDLE one two NEEDLE "
            + "alpha beta gamma delta " * 5 + "NEEDLE")
    frags = highlight_fragments(text, {"needle"}, fragment_size=40,
                                number_of_fragments=1)
    # the two-match passage outscores the single trailing match
    assert len(frags) == 1 and frags[0].count("<em>") == 2
    # no matches -> [] (ES omits the field)
    assert highlight_fragments(text, {"absent"}) == []
    assert highlight_fragments("", {"x"}) == []
    # fragments never split words: boundaries land outside tokens
    frags = highlight_fragments(text, {"needle"}, fragment_size=25,
                                number_of_fragments=5)
    for f in frags:
        plain = f.replace("<em>", "").replace("</em>", "")
        i = text.find(plain)
        assert i >= 0
        if i > 0:
            assert not (text[i - 1].isalnum() and plain[0].isalnum())
        j = i + len(plain)
        if j < len(text):
            assert not (text[j].isalnum() and plain[-1].isalnum())
