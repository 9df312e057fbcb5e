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


def _prefix_anchors(toks: list[str], head: list[str], prefix: str) -> int:
    """Reference anchor count for match_phrase_prefix (slop=0): anchor
    positions where the head matches exactly and the NEXT token starts
    with the prefix — counted once however many completions exist."""
    k = len(head) + 1
    n = 0
    for a in range(len(toks) - k + 1):
        if all(toks[a + j] == t for j, t in enumerate(head)) and toks[
            a + k - 1
        ].startswith(prefix):
            n += 1
    return n


def test_phrase_prefix_matches_bruteforce(sl):
    """Engine match_phrase_prefix == brute-force anchors + pseudo-term
    BM25 over the whole corpus, bit-identical scores."""
    eng, table = sl
    texts = table["text"].to_pylist()
    convs = table["conv_id"].to_pylist()
    turns = table["turn_idx"].to_pylist()
    doc_toks = [tokenize(t) for t in texts]
    n_docs = len(texts)
    avgdl = sum(len(t) for t in doc_toks) / n_docs
    for q in ("the w", "w00", "a w0", "zzzq"):
        toks = tokenize(q)
        head, prefix = toks[:-1], toks[-1]
        ptf = [_prefix_anchors(t, head, prefix) for t in doc_toks]
        df = sum(1 for x in ptf if x)
        got = eng.search_phrase_prefix(q, 1000)
        if df == 0:
            assert got.num_rows == 0
            continue
        from excelastic_ray.query.bm25 import contribution, idf

        p_idf = idf(n_docs, df)
        expect = []
        for i, x in enumerate(ptf):
            if not x:
                continue
            dl = len(doc_toks[i])
            s = float(contribution(p_idf, np.float64(x), np.float64(dl),
                                   avgdl))
            expect.append((convs[i], int(turns[i]), s))
        want = {(c, t): s for c, t, s in expect}
        assert got.num_rows == len(want), q
        for c, t, s in zip(got["conv_id"].to_pylist(),
                           got["turn_idx"].to_pylist(),
                           got["score"].to_pylist()):
            assert want[(c, t)] == s, (q, c, t)


def test_phrase_prefix_actor_parity(sl, ray_session):
    eng, _ = sl
    actor_eng = QueryEngine(eng.reader.index_dir, use_actors=True)
    try:
        for q in ("the w", "w00", "zzzq"):
            a = eng.search_phrase_prefix(q, 25)
            b = actor_eng.search_phrase_prefix(q, 25)
            assert a.to_pydict() == b.to_pydict(), q
    finally:
        actor_eng.close()


def test_phrase_prefix_max_expansions(sl):
    """ES max_expansions: per-shard first-N-by-term-order truncation —
    a huge cap equals uncapped; a tiny cap can only shrink the match
    set (documented recall trade)."""
    eng, _ = sl
    full = eng.search_phrase_prefix("the w", 1000)
    same = eng.search_phrase_prefix("the w", 1000, max_expansions=10**6)
    assert full.to_pydict() == same.to_pydict()
    capped = eng.search_phrase_prefix("the w", 1000, max_expansions=1)
    assert capped.num_rows <= full.num_rows
    got = set(zip(capped["conv_id"].to_pylist(),
                  capped["turn_idx"].to_pylist()))
    have = set(zip(full["conv_id"].to_pylist(),
                   full["turn_idx"].to_pylist()))
    assert got <= have


def test_span_first_brute_force(ray_session, tiny_index, tiny_table):
    """span_first == docs whose FIRST occurrence of the term sits
    inside the first `end` positions, scored exactly like the plain
    term query; actor serving agrees with local."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)

    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    probes = [
        (next(t for t, _ in counts.most_common(1)), 1),
        ([t for t, c in counts.items() if 5 <= c <= 50][0], 3),
    ]
    docs = {
        (c, i): tokenize(t)
        for c, i, t in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    actor_eng = QueryEngine(d, use_actors=True)
    for term, end in probes:
        got = eng.search_span_first(term, end, k=1000)
        keys = set(zip(got["conv_id"].to_pylist(),
                       got["turn_idx"].to_pylist()))
        want = {
            kk for kk, toks in docs.items()
            if term in toks and toks.index(term) + 1 <= end
        }
        assert keys == want
        # scores identical to the plain term query for the same docs
        full = eng.search(term, k=100000)
        full_scores = dict(zip(
            zip(full["conv_id"].to_pylist(), full["turn_idx"].to_pylist()),
            full["score"].to_pylist(),
        ))
        for ck, sc in zip(
            zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()),
            got["score"].to_pylist(),
        ):
            assert full_scores[ck] == sc
        via_actor = actor_eng.search_span_first(term, end, k=1000)
        assert via_actor.equals(got)


def test_span_near_brute_force(ray_session, tiny_index, tiny_table):
    """span_near == docs where min |pos_a - pos_b| <= slop + 1 (either
    order), scored as the two-term sum; actor==local."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    hot = [t for t, _ in counts.most_common(2)]
    docs = {
        (c, i): tokenize(txt)
        for c, i, txt in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    actor_eng = QueryEngine(d, use_actors=True)
    for slop in (0, 1, 3):
        got = eng.search_span_near(f"{hot[0]} {hot[1]}", slop=slop,
                                   k=10**6)
        keys = set(zip(got["conv_id"].to_pylist(),
                       got["turn_idx"].to_pylist()))
        want = set()
        for kk, toks in docs.items():
            pa_ = [i for i, t in enumerate(toks) if t == hot[0]]
            pb_ = [i for i, t in enumerate(toks) if t == hot[1]]
            if pa_ and pb_ and min(
                abs(a - b) for a in pa_ for b in pb_
            ) <= slop + 1:
                want.add(kk)
        assert keys == want, slop
        # scores equal the bool-must two-term sum
        full = eng.search_bool(must=f"{hot[0]} {hot[1]}", k=10**6)
        full_map = dict(zip(
            zip(full["conv_id"].to_pylist(), full["turn_idx"].to_pylist()),
            full["score"].to_pylist(),
        ))
        for ck, sc in zip(
            zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()),
            got["score"].to_pylist(),
        ):
            assert full_map[ck] == sc
        via_actor = actor_eng.search_span_near(
            f"{hot[0]} {hot[1]}", slop=slop, k=10**6
        )
        assert via_actor.equals(got)


def test_span_not_brute_force(ray_session, tiny_index, tiny_table):
    """span_not == docs with an include occurrence having no exclude
    within dist; absent exclude matches wherever include does; scores
    equal the plain term query; actor==local."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    hot = [t for t, _ in counts.most_common(2)]
    docs = {
        (c, i): tokenize(txt)
        for c, i, txt in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    full = eng.search(hot[0], k=10**6)
    full_map = dict(zip(
        zip(full["conv_id"].to_pylist(), full["turn_idx"].to_pylist()),
        full["score"].to_pylist(),
    ))
    actor_eng = QueryEngine(d, use_actors=True)
    for exc, dist in ((hot[1], 0), (hot[1], 2), ("zz_nope", 1)):
        got = eng.search_span_not(hot[0], exc, dist=dist, k=10**6)
        keys = set(zip(got["conv_id"].to_pylist(),
                       got["turn_idx"].to_pylist()))
        want = set()
        for kk, toks in docs.items():
            pa_ = [i for i, t in enumerate(toks) if t == hot[0]]
            pb_ = [i for i, t in enumerate(toks) if t == exc]
            if any(
                all(abs(a - b) > dist for b in pb_) for a in pa_
            ):
                want.add(kk)
        assert keys == want, (exc, dist)
        for ck, sc in zip(
            zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()),
            got["score"].to_pylist(),
        ):
            assert full_map[ck] == sc
        via_actor = actor_eng.search_span_not(hot[0], exc, dist=dist,
                                              k=10**6)
        assert via_actor.equals(got)


def _lucene_anchors(toks: list[str], terms: list[str], slop: int) -> int:
    """Reference move-budget anchor count: a first-term occurrence at
    position a counts when some window start m in [a-slop, a] has
    every term j's ADJUSTED position set {p - j} intersecting
    [m, m + slop] (the engine's documented equivalent of Lucene's
    width = max(p_j - j) - min(p_j - j) <= slop rule, with doc-level
    multiplicity for repeated terms)."""
    from collections import Counter

    mult = Counter(terms)
    cnt = Counter(toks)
    if any(cnt[t] < m for t, m in mult.items()):
        return 0
    adj = [
        [p - j for p, t in enumerate(toks) if t == tj]
        for j, tj in enumerate(terms)
    ]
    if any(not a for a in adj):
        return 0
    n = 0
    for a in adj[0]:
        ok = any(
            all(any(m <= x <= m + slop for x in adj_j) for adj_j in adj)
            for m in range(a - slop, a + 1)
        )
        if ok:
            n += 1
    return n


def _oracle_scores_lucene(table, terms, slop):
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
        ptf = _lucene_anchors(toks, terms, slop)
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
    ("the the", 1), ("call run", 2), ("run call", 2), ("the a of", 2),
    ("ok the", 3), ("a the", 1),
])
def test_lucene_slop_matches_bruteforce(sl, phrase, slop):
    eng, table = sl
    terms = phrase.split()
    exp = _oracle_scores_lucene(table, terms, slop)
    got = eng.search_phrase(phrase, k=len(exp) + 5, slop=slop,
                            slop_mode="lucene")
    assert got.num_rows == len(exp), phrase
    assert (
        list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
        == [k for k, _ in exp]
    )
    for g, (_, e) in zip(got["score"].to_pylist(), exp):
        assert g == pytest.approx(e, abs=1e-12)


def test_lucene_slop_divergence_pinned(ray_session, tmp_path):
    """The ES-visible divergence: '"b a"~2' matches a doc containing
    'a b' under Lucene's move-budget rule (width 2) but NOT under the
    windowed in-order default; '"b a"~1' matches under neither."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "conv_id": ["c0", "c1"],
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "role": ["user", "user"],
            "text": ["alpha beta gamma", "zeta eta theta"],
            "tool": ["", ""],
            "ts": pa.array([0, 0], type=pa.timestamp("us")),
        }
    )
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(t), idx, CFG, clear=True)
    eng = QueryEngine(idx)
    # transposed phrase, slop 2: lucene matches, windowed does not
    assert eng.search_phrase("beta alpha", slop=2).num_rows == 0
    lc = eng.search_phrase("beta alpha", slop=2, slop_mode="lucene")
    assert lc["conv_id"].to_pylist() == ["c0"]
    # slop 1 is below the transposition's width of 2: neither matches
    assert eng.search_phrase("beta alpha", slop=1).num_rows == 0
    assert eng.search_phrase("beta alpha", slop=1,
                             slop_mode="lucene").num_rows == 0
    # in-order phrases agree bit-for-bit at slop=0 in both modes
    a = eng.search_phrase("alpha beta", slop=0)
    b = eng.search_phrase("alpha beta", slop=0, slop_mode="lucene")
    assert a.equals(b) and a.num_rows == 1
    with pytest.raises(ValueError, match="slop_mode"):
        eng.search_phrase("alpha beta", slop=1, slop_mode="exactish")


def test_lucene_slop_repeated_terms_deviation(ray_session, tmp_path):
    """Doc-level multiplicity is enforced (a single 'x' can never
    match 'x x'); the documented deviation — one occurrence serving
    two repeated terms inside a window when the doc holds the
    multiplicity elsewhere — is pinned so a future fix shows up."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "conv_id": ["c0", "c1"],
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "role": ["user", "user"],
            # c0: one 'dup' only; c1: two far-apart 'dup's
            "text": ["dup alone here", "dup one two three four dup"],
            "tool": ["", ""],
            "ts": pa.array([0, 0], type=pa.timestamp("us")),
        }
    )
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(t), idx, CFG, clear=True)
    eng = QueryEngine(idx)
    got = eng.search_phrase("dup dup", slop=1, slop_mode="lucene")
    # c0 excluded by the multiplicity gate; c1 matches HERE although
    # Lucene proper would reject it (its two dups are 5 apart — the
    # window reuses one occurrence for both terms): the pinned corner
    assert got["conv_id"].to_pylist() == ["c1"]


def test_lucene_slop_actor_parity(sl, ray_session):
    eng, _ = sl
    actors = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actors.search_phrase("run call", k=12, slop=2,
                                 slop_mode="lucene")
        b = eng.search_phrase("run call", k=12, slop=2,
                              slop_mode="lucene")
        assert a.equals(b)
    finally:
        actors.close()


def test_lucene_slop_dsl_leaf(sl):
    """{'phrase': {'query', 'slop', 'slop_mode'}} composes in the DSL
    and equals the dedicated API bit-for-bit (same idf convention)."""
    eng, _ = sl
    api = eng.search_phrase("run call", k=15, slop=2,
                            slop_mode="lucene")
    dsl = eng.search_dsl({"phrase": {"query": "run call", "slop": 2,
                                     "slop_mode": "lucene"}}, k=15)
    assert api.num_rows == dsl.num_rows > 0
    assert api["docid"].to_pylist() == dsl["docid"].to_pylist()
    assert api["score"].to_pylist() == dsl["score"].to_pylist()
    # default mode untouched: omitting slop_mode == windowed
    w_api = eng.search_phrase("call run", k=15, slop=2)
    w_dsl = eng.search_dsl({"phrase": {"query": "call run",
                                       "slop": 2}}, k=15)
    assert w_api["docid"].to_pylist() == w_dsl["docid"].to_pylist()
    import pytest as _pt

    with _pt.raises(ValueError, match="slop_mode"):
        eng.search_dsl({"phrase": {"query": "a", "slop_mode": "x"}}, k=5)


def test_span_contain_brute_force(ray_session, tiny_index, tiny_table):
    """span_containing / span_within == docs with a big (a,b) window
    (|pa - pb| <= slop + 1) containing a little occurrence; containing
    scores the big terms' bool-sum, within the little term's plain
    query; actor==local."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    hot = [t for t, _ in counts.most_common(3)]
    docs = {
        (c, i): tokenize(txt)
        for c, i, txt in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    big = f"{hot[0]} {hot[1]}"
    little = hot[2]
    big_full = eng.search_bool(must=big, k=10**6)
    big_map = dict(zip(
        zip(big_full["conv_id"].to_pylist(),
            big_full["turn_idx"].to_pylist()),
        big_full["score"].to_pylist(),
    ))
    lit_full = eng.search(little, k=10**6)
    lit_map = dict(zip(
        zip(lit_full["conv_id"].to_pylist(),
            lit_full["turn_idx"].to_pylist()),
        lit_full["score"].to_pylist(),
    ))
    actor_eng = QueryEngine(d, use_actors=True)
    for slop in (0, 1, 3):
        want = set()
        for kk, toks in docs.items():
            pa_ = [i for i, t in enumerate(toks) if t == hot[0]]
            pb_ = [i for i, t in enumerate(toks) if t == hot[1]]
            pc_ = [i for i, t in enumerate(toks) if t == little]
            if any(
                abs(a - b) <= slop + 1
                and any(min(a, b) <= c <= max(a, b) for c in pc_)
                for a in pa_ for b in pb_
            ):
                want.add(kk)
        for mode, smap in (("containing", big_map), ("within", lit_map)):
            got = eng.search_span_contain(big, little, slop=slop,
                                          k=10**6, mode=mode)
            keys = set(zip(got["conv_id"].to_pylist(),
                           got["turn_idx"].to_pylist()))
            assert keys == want, (mode, slop)
            for ck, sc in zip(
                zip(got["conv_id"].to_pylist(),
                    got["turn_idx"].to_pylist()),
                got["score"].to_pylist(),
            ):
                assert smap[ck] == sc
            via_actor = actor_eng.search_span_contain(
                big, little, slop=slop, k=10**6, mode=mode
            )
            assert via_actor.equals(got)
    import pytest as _pt

    with _pt.raises(ValueError, match="mode"):
        eng.search_span_contain(big, little, mode="bogus")
    with _pt.raises(ValueError, match="distinct"):
        eng.search_span_contain(big, hot[0])


def test_span_or_near_brute_force(ray_session, tiny_index, tiny_table):
    """span_near(span_or(v1, v2), anchor) == docs where ANY variant is
    within slop of the anchor; score = anchor BM25 + each matched
    variant's BM25; actor==local."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    hot = [t for t, _ in counts.most_common(3)]
    anchor, variants = hot[0], [hot[1], hot[2]]
    docs = {
        (c, i): tokenize(txt)
        for c, i, txt in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    term_maps = {}
    for t in [anchor] + variants:
        full = eng.search(t, k=10**6)
        term_maps[t] = dict(zip(
            zip(full["conv_id"].to_pylist(),
                full["turn_idx"].to_pylist()),
            full["score"].to_pylist(),
        ))
    actor_eng = QueryEngine(d, use_actors=True)
    for slop in (0, 2):
        matched_per_v = {}
        for v in variants:
            mv = set()
            for kk, toks in docs.items():
                pv = [i for i, t in enumerate(toks) if t == v]
                pc = [i for i, t in enumerate(toks) if t == anchor]
                if pv and pc and min(
                    abs(a - b) for a in pv for b in pc
                ) <= slop + 1:
                    mv.add(kk)
            matched_per_v[v] = mv
        want = set().union(*matched_per_v.values())
        got = eng.search_span_or_near(" ".join(variants), anchor,
                                      slop=slop, k=10**6)
        keys = set(zip(got["conv_id"].to_pylist(),
                       got["turn_idx"].to_pylist()))
        assert keys == want, slop
        for ck, sc in zip(
            zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()),
            got["score"].to_pylist(),
        ):
            expect = term_maps[anchor][ck] + sum(
                term_maps[v][ck]
                for v in variants if ck in matched_per_v[v]
            )
            assert abs(expect - sc) < 1e-9, ck
        via_actor = actor_eng.search_span_or_near(
            " ".join(variants), anchor, slop=slop, k=10**6
        )
        assert via_actor.equals(got)
    import pytest as _pt

    with _pt.raises(ValueError, match="distinct"):
        eng.search_span_or_near(f"{anchor} {hot[1]}", anchor)


def test_span_multi_near(ray_session, tiny_index, tiny_table):
    """span_multi(prefix/wildcard/regexp) in span_near == manual
    span_or over the capped dictionary expansion (anchor removed AFTER
    the cap); empty expansions return the empty table; actor==local."""
    import pytest as _pt
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(set(tokenize(t)))
    hot = [t for t, _ in counts.most_common(3)]
    anchor = hot[0]
    prefix = hot[1][:2]
    for kind, pat, expand in (
        ("prefix", prefix, lambda: eng.expand_prefix(prefix, 5)),
        ("wildcard", prefix + "*",
         lambda: eng.expand_wildcard(prefix + "*", 5)),
        ("regexp", prefix + "[a-z0-9_]*",
         lambda: eng.expand_regexp(pat_rx, 5)),
    ):
        pat_rx = pat
        vts = [t for t in expand() if t != anchor]
        assert vts, (kind, pat)
        want = eng.search_span_or_near(" ".join(vts), anchor,
                                       slop=1, k=10**6)
        got = eng.search_span_multi_near(pat, anchor, slop=1, k=10**6,
                                         kind=kind, max_expansions=5)
        assert got.equals(want), kind
    # anchor-only expansion and absent patterns → empty result
    assert eng.search_span_multi_near("zzzq", anchor,
                                      kind="prefix").num_rows == 0
    assert eng.search_span_multi_near(
        anchor, anchor, kind="prefix", max_expansions=1
    ).num_rows == 0
    with _pt.raises(ValueError, match="kind"):
        eng.search_span_multi_near(prefix, anchor, kind="bogus")
    with _pt.raises(ValueError, match="anchor"):
        eng.search_span_multi_near(prefix, f"{hot[0]} {hot[1]}")
    actor_eng = QueryEngine(d, use_actors=True)
    via_actor = actor_eng.search_span_multi_near(
        prefix, anchor, slop=1, k=10**6, kind="prefix", max_expansions=5
    )
    assert via_actor.equals(
        eng.search_span_multi_near(prefix, anchor, slop=1, k=10**6,
                                   kind="prefix", max_expansions=5)
    )
