"""Round-3 ES query-surface batch: wildcard queries, the term
suggester, more_like_this, and field collapse — each checked against a
brute-force in-Python oracle over the synthetic corpus."""

from __future__ import annotations

import fnmatch

import numpy as np
import pandas as pd
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(
    turn_bits=8, convs_per_chunk_bits=3, num_shards=4,
    field_index_fields=("role",),
)


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
def qs(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=30, seed=5)
    idx = str(tmp_path_factory.mktemp("surface3") / "idx")
    build_index(rd.from_arrow(table), idx, CFG, clear=True)
    df = table.to_pandas()
    df["toks"] = [tokenize(t) for t in df["text"]]
    vocab = sorted({t for toks in df["toks"] for t in toks})
    dfreq = {}
    for toks in df["toks"]:
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    return QueryEngine(idx), df, vocab, dfreq


# -- wildcard ---------------------------------------------------------------


@pytest.mark.parametrize("pat", ["w0000*", "w?001?", "*all", "ru?", "zz*q"])
def test_expand_wildcard_matches_bruteforce(qs, pat):
    eng, _, vocab, _ = qs
    want = [t for t in vocab if fnmatch.fnmatchcase(t, pat)][:10]
    assert eng.expand_wildcard(pat, max_expansions=10) == want


def test_search_wildcard_scores_expansion_as_or(qs):
    eng, _, _, _ = qs
    terms = eng.expand_wildcard("w0000*", max_expansions=10)
    assert terms
    a = eng.search_wildcard("w0000*", k=10, max_expansions=10)
    b = eng.search(" ".join(terms), k=10)
    assert a.equals(b)


def test_wildcard_trailing_star_equals_prefix_query(qs):
    eng, _, _, _ = qs
    a = eng.search_wildcard("cal*", k=10, max_expansions=5)
    b = eng.search_prefix("cal", k=10, max_expansions=5)
    assert a.equals(b)


def test_wildcard_absent_pattern_empty(qs):
    eng, _, _, _ = qs
    assert eng.search_wildcard("zzzz*qq", k=10).num_rows == 0


def test_wildcard_field_scoped(qs):
    eng, _, _, _ = qs
    # role stream holds exactly the four role tokens
    got = eng.expand_wildcard("*s*", max_expansions=10, field="role")
    assert got == ["assistant", "system", "user"]


# -- regexp -----------------------------------------------------------------


@pytest.mark.parametrize(
    "pat", ["w000[0-3].", "scans?", ".*all", "c(al|ell)l?", "zz+q"]
)
def test_expand_regexp_matches_bruteforce(qs, pat):
    import re as _re

    eng, _, vocab, _ = qs
    rx = _re.compile(pat)
    want = [t for t in vocab if rx.fullmatch(t)][:10]
    assert eng.expand_regexp(pat, max_expansions=10) == want


def test_search_regexp_scores_expansion_as_or(qs):
    eng, _, _, _ = qs
    terms = eng.expand_regexp("w0000.", max_expansions=10)
    assert terms
    a = eng.search_regexp("w0000.", k=10, max_expansions=10)
    b = eng.search(" ".join(terms), k=10)
    assert a.equals(b)


def test_regexp_absent_pattern_empty(qs):
    eng, _, _, _ = qs
    assert eng.search_regexp("zzzz+qq", k=10).num_rows == 0


def test_regexp_field_scoped(qs):
    eng, _, _, _ = qs
    got = eng.expand_regexp(".*s.*", max_expansions=10, field="role")
    assert got == ["assistant", "system", "user"]


def test_regexp_literal_prefix_extraction():
    from excelastic_ray.query.engine import _regex_literal_prefix

    assert _regex_literal_prefix("err(or)?") == "err"
    assert _regex_literal_prefix("ab*c") == "a"
    assert _regex_literal_prefix("scans?") == "scan"
    assert _regex_literal_prefix(".*tion") == ""
    assert _regex_literal_prefix("plain") == "plain"
    assert _regex_literal_prefix("a\\d+") == "a"


# -- termvectors ------------------------------------------------------------


def test_termvectors_matches_bruteforce(qs):
    eng, df, _, dfreq = qs
    row = df.iloc[7]
    tv = eng.termvectors(row["conv_id"], int(row["turn_idx"]))
    toks = row["toks"]
    want_tf = {t: toks.count(t) for t in set(toks)}
    assert tv["term"].to_pylist() == sorted(want_tf)
    got = dict(zip(tv["term"].to_pylist(), tv["tf"].to_pylist()))
    assert got == want_tf
    for t, d in zip(tv["term"].to_pylist(), tv["df"].to_pylist()):
        assert d == dfreq[t]


def test_termvectors_missing_doc_raises(qs):
    eng, _, _, _ = qs
    with pytest.raises(KeyError):
        eng.termvectors("conv-does-not-exist", 0)


# -- term suggester ---------------------------------------------------------


def test_suggest_matches_bruteforce_ranking(qs):
    eng, _, vocab, dfreq = qs
    t = eng.suggest("cal", max_edits=1, max_suggestions=5)
    got = list(
        zip(t["suggestion"].to_pylist(), t["distance"].to_pylist(),
            t["df"].to_pylist())
    )
    want = sorted(
        ((c, _lev("cal", c), dfreq[c]) for c in vocab
         if 1 <= _lev("cal", c) <= 1),
        key=lambda x: (x[1], -x[2], x[0]),
    )[:5]
    assert got == want
    assert t["rank"].to_pylist() == list(range(1, len(want) + 1))


def test_suggest_never_suggests_the_input_term(qs):
    eng, _, _, _ = qs
    t = eng.suggest("call the", max_edits=2, max_suggestions=10)
    for term, sug in zip(t["term"].to_pylist(), t["suggestion"].to_pylist()):
        assert sug != term


def test_suggest_mode_missing_skips_present_terms(qs):
    eng, _, _, dfreq = qs
    assert dfreq.get("call", 0) > 0
    t = eng.suggest("call", max_edits=2, suggest_mode="missing")
    assert t.num_rows == 0
    t2 = eng.suggest("calx", max_edits=2, suggest_mode="missing")
    assert t2.num_rows > 0


# -- more_like_this ---------------------------------------------------------


def test_mlt_excludes_source_and_uses_selected_terms(qs):
    eng, df, _, dfreq = qs
    conv, turn = "conv-000003", 1
    src_docid = eng.reader.docid_of(conv, turn)
    row = df[(df["conv_id"] == conv) & (df["turn_idx"] == turn)].iloc[0]
    tf: dict[str, int] = {}
    for t in row["toks"]:
        tf[t] = tf.get(t, 0) + 1
    sel = sorted(tf, key=lambda t: (-tf[t], dfreq[t], t))[:8]
    got = eng.more_like_this(conv, turn, k=10, max_query_terms=8)
    assert src_docid not in got["docid"].to_pylist()
    want = eng.search(" ".join(sel), k=11)
    keep = [i for i, d in enumerate(want["docid"].to_pylist())
            if d != src_docid][:10]
    assert got["docid"].to_pylist() == [
        want["docid"].to_pylist()[i] for i in keep
    ]
    assert got["rank"].to_pylist() == list(range(1, len(keep) + 1))


def test_mlt_unknown_conv_raises(qs):
    eng, _, _, _ = qs
    with pytest.raises(KeyError):
        eng.more_like_this("conv-999999", 0)


# -- field collapse ---------------------------------------------------------


def _client_collapse(t, attr_of, k):
    """Collapse a full ranking client-side: best hit per group, then
    top-k groups by their best hit (score DESC, docid ASC)."""
    rows = pd.DataFrame(
        {
            "docid": t["docid"].to_pylist(),
            "score": t["score"].to_pylist(),
        }
    )
    rows["grp"] = rows["docid"].map(attr_of)
    rows = rows.sort_values(
        ["score", "docid"], ascending=[False, True]
    ).drop_duplicates("grp")
    return rows.head(k)


@pytest.mark.parametrize("query", ["call the", "w00001", "run ok call"])
def test_collapse_equals_clientside_collapse(qs, query):
    eng, df, _, _ = qs
    full = eng.search(query, k=len(df))
    conv, turn = eng.reader.keys_of(
        np.asarray(full["docid"].to_pylist(), dtype=np.int64)
    )
    key_role = {
        (c, t): r
        for c, t, r in zip(df["conv_id"], df["turn_idx"], df["role"])
    }
    attr_of = dict(
        zip(
            full["docid"].to_pylist(),
            (key_role[(c, int(t))] for c, t in zip(conv, turn)),
        )
    )
    want = _client_collapse(full, attr_of, k=10)
    got = eng.search_collapse(query, "role", k=10)
    assert got["docid"].to_pylist() == want["docid"].tolist()
    assert got["role"].to_pylist() == want["grp"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy()
    )
    # at most one hit per group, by construction
    assert got.num_rows == len(set(got["role"].to_pylist()))


def test_collapse_respects_filters_and_mode(qs):
    eng, _, _, _ = qs
    got = eng.search_collapse(
        "call the", "role", k=10, filters={"role": "user"}
    )
    assert got["role"].to_pylist() == ["user"]
    assert eng.search_collapse("call zzzzabsent", "role", k=10,
                               mode="and").num_rows == 0


def test_collapse_and_wildcard_actor_parity(qs):
    eng, _, _, _ = qs
    actor_eng = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actor_eng.search_collapse("call the", "role", k=10)
        b = eng.search_collapse("call the", "role", k=10)
        assert a.equals(b)
        aw = actor_eng.search_wildcard("w0000*", k=10)
        bw = eng.search_wildcard("w0000*", k=10)
        assert aw.equals(bw)
        asu = actor_eng.suggest("cal", max_edits=1)
        bsu = eng.suggest("cal", max_edits=1)
        assert asu.equals(bsu)
        ar = actor_eng.search_regexp("w000[0-3].", k=10)
        br = eng.search_regexp("w000[0-3].", k=10)
        assert ar.equals(br)
    finally:
        actor_eng.close()


# -- bool queries -----------------------------------------------------------


def _keys_toks(eng, df, table):
    """docid → token set of that doc, via the stored (conv, turn) keys."""
    conv, turn = eng.reader.keys_of(
        np.asarray(table["docid"].to_pylist(), dtype=np.int64)
    )
    by_key = {
        (c, int(t)): set(toks)
        for c, t, toks in zip(df["conv_id"], df["turn_idx"], df["toks"])
    }
    return [by_key[(c, int(t))] for c, t in zip(conv, turn)]


def test_bool_pure_must_equals_operator_and(qs):
    eng, _, _, _ = qs
    a = eng.search_bool(must="call the", k=10)
    b = eng.search("call the", k=10, mode="and")
    assert a.equals(b)


def test_bool_pure_should_default_msm_equals_or(qs):
    eng, _, _, _ = qs
    a = eng.search_bool(should="call the window", k=10)
    b = eng.search("call the window", k=10)
    assert a.equals(b)


def test_bool_must_plus_should_clientside(qs):
    eng, df, _, _ = qs
    must, should = "call", "the window"
    union = " ".join(sorted(set((must + " " + should).split())))
    full = eng.search(union, k=len(df))
    toksets = _keys_toks(eng, df, full)
    keep = [i for i, ts in enumerate(toksets) if "call" in ts][:10]
    want = full.take(keep)
    got = eng.search_bool(must=must, should=should, k=10)
    assert got["docid"].to_pylist() == want["docid"].to_pylist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy()
    )


def test_bool_must_not_excludes(qs):
    eng, df, _, _ = qs
    full = eng.search("call", k=len(df))
    toksets = _keys_toks(eng, df, full)
    keep = [i for i, ts in enumerate(toksets) if "the" not in ts][:10]
    want = full.take(keep)
    got = eng.search_bool(must="call", must_not="the", k=10)
    assert got["docid"].to_pylist() == want["docid"].to_pylist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy()
    )
    # no surviving doc contains the excluded term
    assert all("the" not in ts for ts in _keys_toks(eng, df, got))


def test_bool_minimum_should_match(qs):
    eng, df, _, _ = qs
    terms = "call the window"
    full = eng.search(terms, k=len(df))
    toksets = _keys_toks(eng, df, full)
    tset = set(terms.split())
    keep = [i for i, ts in enumerate(toksets) if len(ts & tset) >= 2][:10]
    want = full.take(keep)
    got = eng.search_bool(should=terms, minimum_should_match=2, k=10)
    assert got["docid"].to_pylist() == want["docid"].to_pylist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy()
    )


def test_bool_edge_cases(qs):
    eng, _, _, _ = qs
    # dead must term → empty, even with live should terms
    assert eng.search_bool(must="zzzzabsent", should="call").num_rows == 0
    # must ∩ must_not contradiction → empty
    assert eng.search_bool(must="call", must_not="call").num_rows == 0
    # msm above the live should count → empty
    assert eng.search_bool(should="call zzzzabsent",
                           minimum_should_match=2).num_rows == 0
    # no scoring clause → ValueError
    with pytest.raises(ValueError):
        eng.search_bool(must_not="call")


def test_bool_actor_parity(qs):
    eng, _, _, _ = qs
    actor_eng = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actor_eng.search_bool(must="call", should="the window",
                                  must_not="w00001", k=10)
        b = eng.search_bool(must="call", should="the window",
                            must_not="w00001", k=10)
        assert a.equals(b)
    finally:
        actor_eng.close()


# -- terms agg + top_hits ---------------------------------------------------


@pytest.mark.parametrize("query,per_k", [("call the", 3), ("run ok", 1),
                                         ("w00001", 5)])
def test_top_hits_equals_clientside_per_group(qs, query, per_k):
    eng, df, _, _ = qs
    full = eng.search(query, k=len(df)).to_pandas()
    key_role = {
        (c, t): r
        for c, t, r in zip(df["conv_id"], df["turn_idx"], df["role"])
    }
    full["role"] = [
        key_role[(c, int(t))]
        for c, t in zip(full["conv_id"], full["turn_idx"])
    ]
    want = (
        full.sort_values(["role", "score", "docid"],
                         ascending=[True, False, True])
        .groupby("role", sort=True)
        .head(per_k)
        .reset_index(drop=True)
    )
    got = eng.search_top_hits(query, "role", per_k=per_k).to_pandas()
    assert got["docid"].tolist() == want["docid"].tolist()
    assert got["role"].tolist() == want["role"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  want["score"].to_numpy())
    # rank restarts at 1 inside each bucket
    assert (got.groupby("role")["rank"].min() == 1).all()
    assert (got.groupby("role")["rank"].max() <= per_k).all()


def test_top_hits_filters_and_actor_parity(qs):
    eng, _, _, _ = qs
    f = eng.search_top_hits("call the", "role", per_k=2,
                            filters={"tool": "sql"})
    assert f.num_rows > 0
    tools = eng.reader.fetch_docs(
        np.asarray(f["docid"].to_pylist(), dtype=np.int64),
        columns=["tool"],
    )["tool"].to_pylist()
    assert set(tools) == {"sql"}
    assert eng.search_top_hits("zzzzabsent", "role").num_rows == 0
    actor_eng = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actor_eng.search_top_hits("call the", "role", per_k=3)
        b = eng.search_top_hits("call the", "role", per_k=3)
        assert a.equals(b)
    finally:
        actor_eng.close()


# -- adjacency_matrix -------------------------------------------------------


def test_adjacency_matrix_equals_bruteforce(qs):
    eng, df, _, _ = qs
    named = {"calls": "call run", "hot": "the", "none": "zzzzabsent"}
    got = eng.adjacency_matrix(named).to_pandas()
    sets = {
        nm: {
            i for i, toks in enumerate(df["toks"])
            if set(q.split()) & set(toks)
        }
        for nm, q in named.items()
    }
    names = sorted(named)
    want = {
        (a, b): len(sets[a] & sets[b])
        for i, a in enumerate(names) for b in names[i:]
    }
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert row["n"] == want[(row["a"], row["b"])], (row["a"], row["b"])
    # zero buckets are present, not dropped
    assert (got[got["a"] == "none"]["n"] == 0).all()
    actor_eng = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actor_eng.adjacency_matrix(named)
        b = eng.adjacency_matrix(named)
        assert a.equals(b)
    finally:
        actor_eng.close()


# -- boosting query ---------------------------------------------------------


def test_boosting_demotes_never_excludes(qs):
    eng, df, _, _ = qs
    full = eng.search("call the", k=len(df)).to_pandas()
    neg_docs = set(
        eng.search("window", k=len(df)).to_pandas()["docid"]
    )
    nb = 0.25
    adj = full.copy()
    adj["score"] = np.where(
        adj["docid"].isin(neg_docs), adj["score"] * nb, adj["score"]
    )
    want = adj.sort_values(["score", "docid"],
                           ascending=[False, True]).head(10)
    got = eng.search_boosting("call the", "window",
                              negative_boost=nb, k=10).to_pandas()
    assert got["docid"].tolist() == want["docid"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy())
    # demoted docs remain retrievable (never excluded like must_not)
    big = eng.search_boosting("call the", "window", negative_boost=nb,
                              k=len(df)).to_pandas()
    assert set(big["docid"]) == set(full["docid"])
    # boost 1.0 == plain search
    same = eng.search_boosting("call the", "window", negative_boost=1.0,
                               k=10)
    assert same.equals(eng.search("call the", k=10))
    actor_eng = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actor_eng.search_boosting("call the", "window",
                                      negative_boost=nb, k=10)
        b = eng.search_boosting("call the", "window",
                                negative_boost=nb, k=10)
        assert a.equals(b)
    finally:
        actor_eng.close()


def test_top_facets_size_and_other(qs):
    eng, _, _, _ = qs
    full = eng.facets("call the", "tool")
    got = eng.top_facets("call the", "tool", size=3).to_pandas()
    ranked = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got["value"].tolist()[:-1] == [v for v, _ in ranked[:3]]
    assert got["n"].tolist()[:-1] == [n for _, n in ranked[:3]]
    assert got["value"].tolist()[-1] == "__other__"
    assert got["n"].tolist()[-1] == sum(n for _, n in ranked[3:])
    # size beyond cardinality: other bucket is 0, all values present
    all_got = eng.top_facets("call the", "tool", size=100).to_pandas()
    assert all_got["n"].tolist()[-1] == 0
    assert len(all_got) == len(full) + 1


# -- rescore ----------------------------------------------------------------


def test_rescore_equals_clientside_combined(qs):
    eng, df, _, _ = qs
    q, ph = "call the run", "the run"
    qw, rw = 1.0, 2.0
    full = eng.search(q, k=len(df)).to_pandas()
    phr = eng.search_phrase(ph, k=len(df)).to_pandas()
    pmap = dict(zip(phr["docid"], phr["score"]))
    comb = full.copy()
    comb["score"] = qw * comb["score"].to_numpy() + rw * np.array(
        [pmap.get(d, 0.0) for d in comb["docid"]]
    )
    want = comb.sort_values(["score", "docid"],
                            ascending=[False, True]).head(10)
    got = eng.search_rescore(q, ph, k=10, window_size=1 << 30,
                             query_weight=qw,
                             rescore_weight=rw).to_pandas()
    assert got["docid"].tolist() == want["docid"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy())


def test_rescore_absent_phrase_and_window(qs):
    eng, _, _, _ = qs
    # absent rescore phrase: combined degrades to query_weight * bm25
    base = eng.search("call the", k=10)
    got = eng.search_rescore("call the", "zzzz absent", k=10,
                             window_size=1 << 30)
    assert got.equals(base)
    # window_size=0: nothing is rescored — original ranking survives
    got0 = eng.search_rescore("call the", "the run", k=10, window_size=0,
                              rescore_weight=5.0)
    assert got0["docid"].to_pylist() == base["docid"].to_pylist()
    actor_eng = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actor_eng.search_rescore("call the", "the run", k=10,
                                     window_size=1 << 30)
        b = eng.search_rescore("call the", "the run", k=10,
                               window_size=1 << 30)
        assert a.equals(b)
    finally:
        actor_eng.close()


def test_significant_text_matches_bruteforce(qs):
    """JLH over the top-N hit sample equals a brute-force computation
    on the same sample."""
    eng, df, _vocab, _dfreq = qs
    hits = eng.search("the call", k=50)
    sample = [
        df[(df.conv_id == c) & (df.turn_idx == t)].iloc[0].text
        for c, t in zip(hits["conv_id"].to_pylist(),
                        hits["turn_idx"].to_pylist())
    ]
    fg = {}
    for tx in sample:
        for term in set(tokenize(tx)):
            fg[term] = fg.get(term, 0) + 1
    n_fg = float(len(sample))
    n_bg = float(len(df))
    bg = {}
    for tx in df.text:
        for term in set(tokenize(tx)):
            bg[term] = bg.get(term, 0) + 1
    rows = []
    for term, c in fg.items():
        if c < 3:
            continue
        fp, bp = c / n_fg, bg[term] / n_bg
        if fp > bp:
            rows.append((term, c, bg[term], (fp - bp) * (fp / bp)))
    rows.sort(key=lambda x: (-x[3], x[0]))
    got = eng.significant_text("the call", k=10, sample_size=50)
    want = rows[:10]
    assert got["term"].to_pylist() == [t for t, *_ in want]
    assert got["fg_df"].to_pylist() == [c for _, c, _, _ in want]
    assert got["df"].to_pylist() == [d for _, _, d, _ in want]
    from excelastic_ray.pipelines.textstats import trunc6

    assert got["score"].to_pylist() == list(
        trunc6(np.array([s for *_, s in want]))
    )


def test_significant_text_empty_query(qs):
    eng = qs[0]
    assert eng.significant_text("zzz_absent", k=5).num_rows == 0


def test_complete_prefix_ranked_by_df(qs):
    eng, _df, vocab, dfreq = qs
    got = eng.complete("w0", k=8)
    want = sorted(
        ((t, dfreq[t]) for t in vocab if t.startswith("w0")),
        key=lambda x: (-x[1], x[0]),
    )[:8]
    assert list(zip(got["term"].to_pylist(), got["df"].to_pylist())) \
        == want
    assert eng.complete("zzznope").num_rows == 0
    assert eng.complete("two words").num_rows == 0  # one token only


# -- phrase suggester -------------------------------------------------------


def _phrase_lm_bruteforce(df, slots, T):
    """Independent add-one bigram LM scorer over the analyzed stream."""
    import itertools
    import math

    ctf: dict = {}
    adj: dict = {}
    for toks in df["toks"]:
        for t in toks:
            ctf[t] = ctf.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            adj[(a, b)] = adj.get((a, b), 0) + 1
    out = []
    for combo in itertools.product(*slots):
        s = math.log((ctf.get(combo[0], 0) + 1.0) / (T + 1.0))
        for a, b in zip(combo, combo[1:]):
            s += math.log((adj.get((a, b), 0) + 1.0)
                          / (ctf.get(a, 0) + 1.0))
        out.append((" ".join(combo), s))
    return out


def test_suggest_phrase_matches_bruteforce(qs):
    """Engine suggestions == the independent LM over the exact slot
    candidate sets (orig-if-indexed + term-suggester top-3)."""
    from excelastic_ray.pipelines.textstats import trunc6

    eng, df, vocab, dfreq = qs
    text = "cal the"
    toks = ["cal", "the"]
    T = float(sum(len(t) for t in df["toks"]))
    slots = []
    for t in toks:
        ranked = sorted(
            ((c, _lev(t, c), dfreq[c]) for c in vocab
             if 1 <= _lev(t, c) <= 2),
            key=lambda x: (x[1], -x[2], x[0]),
        )[:3]
        orig = [t] if dfreq.get(t, 0) > 0 else []
        slots.append(orig + [c for c, _, _ in ranked])
    scored = _phrase_lm_bruteforce(df, slots, T)
    scored = [(s, trunc6(np.array([v]))[0]) for s, v in scored
              if s != " ".join(toks)]
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    got = eng.suggest_phrase(text, max_edits=2, max_term_candidates=3,
                             max_suggestions=5)
    assert got["suggestion"].to_pylist() == [s for s, _ in scored[:5]]
    assert got["score"].to_pylist() == [v for _, v in scored[:5]]
    assert got["rank"].to_pylist() == list(range(1, got.num_rows + 1))


def test_suggest_phrase_recovers_misspelling(qs):
    """A one-edit corruption of the corpus's hottest bigram ranks the
    true bigram first."""
    from collections import Counter

    eng, df, _, _ = qs
    big = Counter()
    for toks in df["toks"]:
        big.update(zip(toks, toks[1:]))
    (w1, w2), _ = big.most_common(1)[0]
    mis = w1[:-1] + ("x" if w1[-1] != "x" else "q")
    got = eng.suggest_phrase(f"{mis} {w2}")
    assert got.num_rows > 0
    assert got["suggestion"].to_pylist()[0] == f"{w1} {w2}"


def test_suggest_phrase_identity_excluded_and_gates(qs):
    eng, df, _, dfreq = qs
    # a clean in-corpus phrase never suggests itself
    toks = df["toks"].iloc[0][:2]
    if len(toks) == 2:
        got = eng.suggest_phrase(" ".join(toks))
        assert " ".join(toks) not in got["suggestion"].to_pylist()
    with pytest.raises(ValueError, match="combo_budget"):
        eng.suggest_phrase("cal the run", combo_budget=2)
    with pytest.raises(ValueError, match="analyzer token"):
        eng.suggest_phrase("   ")


def test_suggest_phrase_actor_parity(qs, ray_session):
    eng, _, _, _ = qs
    actors = QueryEngine(eng.reader, use_actors=True)
    try:
        a = actors.suggest_phrase("cal the")
        b = eng.suggest_phrase("cal the")
        assert a.equals(b)
    finally:
        actors.close()
