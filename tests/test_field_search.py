"""Per-field indexing + field-qualified BM25 (ES dynamic-mapping parity).

The reference indexes EVERY row column as its own ES field
(``ExcelParser.java:222-261`` + ES dynamic mapping) and Kibana users
query ``column:value``. These tests pin the engine's per-field streams:
field-prefixed dictionary keys, per-field dl/avgdl stats, most_fields
scoring, query_string parsing, and isolation from the catch-all stream.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from excelastic_ray.analysis import FIELD_MARK, FIELD_SEP, parse_query_string
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(
    turn_bits=8, convs_per_chunk_bits=3, num_shards=4,
    field_index_fields=("role", "tool"),
)


@pytest.fixture(scope="module")
def field_index(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=40, seed=7)
    idx = str(tmp_path_factory.mktemp("fieldidx") / "idx")
    build_index(rd.from_arrow(table), idx, CFG, clear=True)
    return idx, table


def _field_bm25_oracle(table, field, term, k):
    """Brute-force per-field BM25 over the raw table (None → no tokens;
    single-token fields still normalize by their own dl/avgdl)."""
    from excelastic_ray.analysis import tokenize

    vals = table[field].to_pylist()
    conv = table["conv_id"].to_pylist()
    turn = table["turn_idx"].to_pylist()
    toks = [tokenize(v) if v else [] for v in vals]
    N = len(toks)
    dls = [float(len(t)) for t in toks]
    avgdl = sum(dls) / N
    df = sum(1 for t in toks if term in t)
    t_idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    scored = []
    for c, ti, tk, dl in zip(conv, turn, toks, dls):
        tf = float(tk.count(term))
        if tf:
            s = t_idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
            scored.append(((c, int(ti)), s))
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    return scored[:k]


def test_field_search_matches_bruteforce(field_index):
    idx, table = field_index
    eng = QueryEngine(idx)
    for field, term in (("role", "user"), ("role", "tool"), ("tool", "code")):
        got = eng.search_fields(term, [field], k=8)
        exp = _field_bm25_oracle(table, field, term, 8)
        assert (
            list(zip(got["conv_id"].to_pylist(), got["turn_idx"].to_pylist()))
            == [key for key, _ in exp]
        )
        for g, (_, e) in zip(got["score"].to_pylist(), exp):
            assert g == pytest.approx(e, abs=1e-12)


def test_catchall_field_uses_main_stream(field_index):
    idx, _ = field_index
    eng = QueryEngine(idx)
    a = eng.search_fields("the call run", ["text"], k=10)
    b = eng.search("the call run", k=10)
    assert a["docid"].to_pylist() == b["docid"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_most_fields_sums_per_field_scores(field_index):
    idx, table = field_index
    eng = QueryEngine(idx)
    # "tool" is both a role VALUE and an English word: scoring it in
    # role vs text must differ, and most_fields must sum both clauses
    role_only = eng.search_fields("tool", ["role"], k=1000)
    text_only = eng.search_fields("tool", ["text"], k=1000)
    both = eng.search_fields("tool", ["role", "text"], k=1000)
    sum_map: dict[int, float] = {}
    for t in (role_only, text_only):
        for d, s in zip(t["docid"].to_pylist(), t["score"].to_pylist()):
            sum_map[d] = sum_map.get(d, 0.0) + s
    got = dict(zip(both["docid"].to_pylist(), both["score"].to_pylist()))
    assert set(got) == set(sum_map)
    for d in got:
        assert got[d] == pytest.approx(sum_map[d], rel=1e-12)


def test_query_string_parsing():
    assert parse_query_string("tool:code table role:user") == [
        (None, "table"), ("role", "user"), ("tool", "code"),
    ]
    # analyzer applies inside clauses; bad shapes degrade to bare terms
    assert parse_query_string("Role:USER") == [("Role", "user")]
    assert parse_query_string(":x y:") == [(None, "x"), (None, "y")]


def test_search_qs_mixes_default_and_qualified(field_index):
    idx, _ = field_index
    eng = QueryEngine(idx)
    qs = eng.search_qs("role:user the", k=15)
    manual = eng._search_field_pairs(
        [("role", "user"), (None, "the")], 15, None, 0
    )
    assert qs.equals(manual)


def test_unknown_field_raises(field_index):
    idx, _ = field_index
    eng = QueryEngine(idx)
    with pytest.raises(KeyError):
        eng.search_fields("x", ["ts"], k=5)


def test_field_keys_invisible_to_unqualified_queries(field_index):
    idx, _ = field_index
    eng = QueryEngine(idx)
    # dictionary hygiene: prefix expansion and the term dictionary's
    # unprefixed region never contain field-prefixed keys
    for p in ("u", "c", "t", ""):
        for t in eng.expand_prefix(p, 200):
            assert FIELD_MARK not in t and FIELD_SEP not in t
    # an unqualified search for a role value scores only text occurrences
    r = eng.reader
    s = r.searcher(0)
    lo = int(np.searchsorted(s.terms, FIELD_MARK))
    hi = int(np.searchsorted(s.terms, "\x02"))
    assert hi >= lo  # prefixed region is contiguous at the head
    assert all(str(t).startswith(FIELD_MARK) for t in s.terms[lo:hi])
    assert not any(FIELD_MARK in str(t) for t in s.terms[hi:])


def test_field_dls_not_leaked_as_attrs(field_index):
    idx, _ = field_index
    eng = QueryEngine(idx)
    s = eng.reader.searcher(0)
    assert set(s.field_dls) == {"role", "tool"}
    assert not any(a.startswith("dl@") for a in s.attrs)


def test_field_search_via_actors(field_index, ray_session):
    idx, _ = field_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        a = actors.search_fields("user", ["role"], k=7)
        b = local.search_fields("user", ["role"], k=7)
        assert a.equals(b)
        qa = actors.search_qs("tool:search the", k=7)
        qb = local.search_qs("tool:search the", k=7)
        assert qa.equals(qb)
    finally:
        actors.close()


@pytest.fixture(scope="module")
def multi_tok_field_index(tmp_path_factory, ray_session):
    """Corpus whose `tool` field holds multi-token values — exercises
    field-scoped phrase/prefix against a real per-field stream."""
    import pyarrow as pa
    import ray.data as rd

    tools = [
        "search api v2", "code run fast", "search index api",
        "api search", "run code", None, "search api", "browser page load",
    ]
    n = len(tools)
    table = pa.table(
        {
            "conv_id": pa.array([f"c{i:03d}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"text body {i} search" for i in range(n)]),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(
                np.arange(n).astype("datetime64[s]").astype("datetime64[us]")
            ),
        }
    )
    idx = str(tmp_path_factory.mktemp("mtfidx") / "idx")
    build_index(
        __import__("ray").data.from_arrow(table), idx,
        IndexConfig(turn_bits=4, convs_per_chunk_bits=1, num_shards=2,
                    field_index_fields=("tool",)),
        clear=True,
    )
    return idx, tools


def test_field_phrase_matches(multi_tok_field_index):
    idx, tools = multi_tok_field_index
    eng = QueryEngine(idx)
    got = eng.search_phrase("search api", k=10, field="tool")
    exp_rows = sorted(
        i for i, t in enumerate(tools)
        if t and "search api" in " ".join(t.split())
    )
    assert sorted(got["turn_idx"].to_pylist()) == [0] * len(exp_rows)
    assert sorted(int(c[1:]) for c in got["conv_id"].to_pylist()) == exp_rows
    # scored with the FIELD's stats: brute-force the pseudo-term BM25
    N = len(tools)
    dls = [len(t.split()) if t else 0 for t in tools]
    avgdl = sum(dls) / N
    df = len(exp_rows)
    p_idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
    exp_scores = {}
    for i in exp_rows:
        ptf = 1.0
        dl = dls[i]
        exp_scores[f"c{i:03d}"] = (
            p_idf * (ptf * 2.2)
            / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        )
    for c, s in zip(got["conv_id"].to_pylist(), got["score"].to_pylist()):
        assert s == pytest.approx(exp_scores[c], abs=1e-12)


def test_field_phrase_vs_text_phrase_differ(multi_tok_field_index):
    idx, _ = multi_tok_field_index
    eng = QueryEngine(idx)
    in_tool = eng.search_phrase("search api", k=10, field="tool")
    in_text = eng.search_phrase("search api", k=10)
    assert in_tool.num_rows > 0
    assert in_text.num_rows == 0  # "search api" is never adjacent in text


def test_field_prefix(multi_tok_field_index):
    idx, tools = multi_tok_field_index
    eng = QueryEngine(idx)
    assert eng.expand_prefix("se", 10, field="tool") == ["search"]
    assert eng.expand_prefix("a", 10, field="tool") == ["api"]
    got = eng.search_prefix("ap", k=10, field="tool")
    exp = sorted(
        i for i, t in enumerate(tools) if t and any(
            w.startswith("ap") for w in t.split())
    )
    assert sorted(int(c[1:]) for c in got["conv_id"].to_pylist()) == exp


def test_field_phrase_actor_parity(multi_tok_field_index, ray_session):
    idx, _ = multi_tok_field_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        a = actors.search_phrase("search api", k=5, field="tool")
        b = local.search_phrase("search api", k=5, field="tool")
        assert a.equals(b)
        ap = actors.search_prefix("se", k=5, field="tool")
        bp = local.search_prefix("se", k=5, field="tool")
        assert ap.equals(bp)
    finally:
        actors.close()


def test_append_extends_field_streams(tmp_path, ray_session):
    """append_index must extend per-field streams and keep per-field
    avgdl consistent with a from-scratch build of the union corpus."""
    import ray.data as rd

    from excelastic_ray.index.build import append_index

    full = generate_transcripts(n_convs=30, seed=23)
    convs = sorted(set(full["conv_id"].to_pylist()))
    first = set(convs[:20])
    mask = [c in first for c in full["conv_id"].to_pylist()]
    import pyarrow as pa

    base_t = full.filter(pa.array(mask))
    add_t = full.filter(pa.array([not m for m in mask]))

    idx = str(tmp_path / "fidx")
    build_index(rd.from_arrow(base_t), idx, CFG, clear=True)
    append_index(rd.from_arrow(add_t), idx)

    ref_idx = str(tmp_path / "ref")
    build_index(rd.from_arrow(full), ref_idx, CFG, clear=True)

    import json

    m_a = json.load(open(f"{idx}/manifest.json"))
    m_r = json.load(open(f"{ref_idx}/manifest.json"))
    assert m_a["field_avgdl"] == m_r["field_avgdl"]
    assert m_a["n_docs"] == m_r["n_docs"]

    ea, er = QueryEngine(idx), QueryEngine(ref_idx)
    for q, fields in (("user", ["role"]), ("code", ["tool"]),
                      ("tool the", ["role", "text"])):
        a = ea.search_fields(q, fields, k=20)
        r = er.search_fields(q, fields, k=20)
        # docids differ across the two builds (append ranks after the
        # base) — compare by (conv_id, turn_idx, score)
        ka = list(zip(a["conv_id"].to_pylist(), a["turn_idx"].to_pylist(),
                      a["score"].to_pylist()))
        kr = list(zip(r["conv_id"].to_pylist(), r["turn_idx"].to_pylist(),
                      r["score"].to_pylist()))
        assert ka == kr


def test_best_fields_dismax(field_index):
    """best_fields = max per-field clause-sum + tie_breaker * rest,
    reconstructable from the single-field runs."""
    idx, _ = field_index
    eng = QueryEngine(idx)
    per_field = {}
    for f in ("role", "text"):
        t = eng.search_fields("tool user", [f], k=10_000)
        per_field[f] = dict(zip(t["docid"].to_pylist(),
                                t["score"].to_pylist()))
    for tb in (0.0, 0.3):
        got = eng.search_fields("tool user", ["role", "text"], k=10_000,
                                match_type="best_fields", tie_breaker=tb)
        gmap = dict(zip(got["docid"].to_pylist(), got["score"].to_pylist()))
        docs = set(per_field["role"]) | set(per_field["text"])
        assert set(gmap) == docs
        for d in docs:
            a = per_field["role"].get(d, 0.0)
            b = per_field["text"].get(d, 0.0)
            exp = max(a, b) + tb * (a + b - max(a, b))
            assert gmap[d] == pytest.approx(exp, rel=1e-12)
    # single-listed-field best_fields == most_fields
    a = eng.search_fields("user", ["role"], k=50, match_type="best_fields")
    b = eng.search_fields("user", ["role"], k=50)
    assert a.equals(b)


def test_field_phrase_with_slop(multi_tok_field_index):
    idx, tools = multi_tok_field_index
    eng = QueryEngine(idx)
    # "search ... api" within one gap: matches "search index api" too
    exact = eng.search_phrase("search api", k=10, field="tool")
    sloppy = eng.search_phrase("search api", k=10, field="tool", slop=1)
    exp_sloppy = sorted(
        i for i, t in enumerate(tools)
        if t and any(
            w == "search" and "api" in t.split()[j + 1 : j + 3]
            for j, w in enumerate(t.split())
        )
    )
    assert sorted(int(c[1:]) for c in sloppy["conv_id"].to_pylist()) == exp_sloppy
    assert set(exact["conv_id"].to_pylist()) <= set(sloppy["conv_id"].to_pylist())


def _combined_oracle(table, eng, query, fields, weights, k):
    """Brute-force BM25F: per term, tf = Σ_f w_f·tf_f over the raw
    table, dl = Σ_f w_f·dl_f, df = union doc count; avgdl taken from
    the engine's own per-field averages (one shared definition) and
    contributions from the engine's float kernel so equality is
    exact."""
    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.bm25 import contribution, idf

    import numpy as np

    conv = table["conv_id"].to_pylist()
    turn = table["turn_idx"].to_pylist()
    cols = {}
    for f in fields:
        name = "text" if f is None else f
        vals = table[name].to_pylist()
        cols[f] = [tokenize(v) if v else [] for v in vals]
    N = len(conv)
    avgdls = eng._field_avgdls()
    w = {f: float(weights.get(f, 1.0)) for f in fields}
    avgdl = sum(w[f] * avgdls[f] for f in fields)
    dlv = [sum(w[f] * len(cols[f][i]) for f in fields) for i in range(N)]
    terms = sorted(set(tokenize(query)))
    acc = {}
    for t in terms:
        tfs = [
            sum(w[f] * cols[f][i].count(t) for f in fields)
            for i in range(N)
        ]
        df = sum(1 for v in tfs if v > 0)
        if not df:
            continue
        t_idf = idf(N, df)
        for i, tf in enumerate(tfs):
            if tf > 0:
                c = float(contribution(
                    t_idf, np.float64(tf), np.float64(dlv[i]), avgdl))
                acc[i] = acc.get(i, 0.0) + c
    scored = sorted(
        ((conv[i], int(turn[i]), s) for i, s in acc.items()),
        key=lambda kv: (-kv[2], kv[0], kv[1]),
    )
    return scored[:k]


def test_combined_fields_matches_bruteforce(field_index):
    """combined_fields (BM25F): union df, summed tf/dl — exact vs the
    brute-force oracle, with and without per-field weights; term-
    saturation differs from most_fields by construction."""
    idx, table = field_index
    eng = QueryEngine(idx)
    for query, weights in (
        ("user table", {}),
        ("user", {"role": 2.0}),
        ("tool code window", {None: 1.0, "tool": 3.0}),
    ):
        got = eng.search_combined(query, [None, "role", "tool"], k=12,
                                  weights=weights)
        exp = _combined_oracle(table, eng, query,
                               [None, "role", "tool"], weights, 12)
        assert got.num_rows > 0
        assert [
            (c, t, s) for c, t, s in zip(got["conv_id"].to_pylist(),
                                         got["turn_idx"].to_pylist(),
                                         got["score"].to_pylist())
        ] == exp, (query, weights)


def test_combined_fields_actor_parity_and_errors(field_index):
    idx, _ = field_index
    eng = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        a = actors.search_combined("user table", [None, "role"], k=10)
        b = eng.search_combined("user table", [None, "role"], k=10)
        assert a.equals(b)
    finally:
        actors.close()
    import pytest as _pytest

    with _pytest.raises(KeyError, match="not indexed per-field"):
        eng.search_combined("x", ["nope"])
    with _pytest.raises(ValueError, match="at least one field"):
        eng.search_combined("x", [])
    # saturation: a term in BOTH text and role scores ONCE (union df),
    # so combined != most_fields sum on a doc where both fields match
    comb = eng.search_combined("user", [None, "role"], k=1000)
    most = eng.search_fields("user", ["text", "role"], k=1000,
                             match_type="most_fields")
    assert comb.num_rows == most.num_rows  # same match set (union)


def test_cross_fields_matches_bruteforce(field_index):
    """cross_fields (BlendedTermQuery rule): blended max-df idf,
    per-term best-field contribution, summed over terms — exact vs a
    brute-force oracle sharing the engine's float kernel."""
    import numpy as np

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.bm25 import contribution, idf

    idx, table = field_index
    eng = QueryEngine(idx)
    fields = [None, "role", "tool"]
    conv = table["conv_id"].to_pylist()
    turn = table["turn_idx"].to_pylist()
    cols = {
        f: [tokenize(v) if v else []
            for v in table["text" if f is None else f].to_pylist()]
        for f in fields
    }
    N = len(conv)
    avgdls = eng._field_avgdls()
    for query in ("user table", "tool code", "merge user window"):
        acc = {}
        for t in sorted(set(tokenize(query))):
            dfb = max(sum(1 for tk in cols[f] if t in tk)
                      for f in fields)
            if not dfb:
                continue
            t_idf = idf(N, dfb)
            for i in range(N):
                best = 0.0
                for f in fields:
                    tf = cols[f][i].count(t)
                    if tf:
                        c = float(contribution(
                            t_idf, np.float64(tf),
                            np.float64(len(cols[f][i])), avgdls[f]))
                        best = max(best, c)
                if best:
                    acc[i] = acc.get(i, 0.0) + best
        exp = sorted(
            ((conv[i], int(turn[i]), s) for i, s in acc.items()),
            key=lambda kv: (-kv[2], kv[0], kv[1]),
        )[:12]
        got = eng.search_cross(query, fields, k=12)
        assert got.num_rows > 0
        assert [
            (c, t, s) for c, t, s in zip(got["conv_id"].to_pylist(),
                                         got["turn_idx"].to_pylist(),
                                         got["score"].to_pylist())
        ] == exp, query
    # actor parity
    actors = QueryEngine(idx, use_actors=True)
    try:
        assert actors.search_cross("user table", [None, "role"], k=10) \
            .equals(eng.search_cross("user table", [None, "role"], k=10))
    finally:
        actors.close()


def test_terms_enum_matches_bruteforce_and_pages(field_index, ray_session):
    """ES _terms_enum: ascending prefix enumeration equals the
    brute-force distinct analyzed vocabulary; search_after pages chain
    over the full range exactly once; case folding; field scoping."""
    from excelastic_ray.analysis import tokenize

    idx, table = field_index
    eng = QueryEngine(idx)
    vocab = sorted({t for txt in table["text"].to_pylist()
                    for t in tokenize(txt)})

    # full enumeration via pagination (size smaller than the range)
    got, after = [], None
    while True:
        page = eng.terms_enum("", size=7, search_after=after)["term"]
        if not len(page):
            break
        got.extend(page.to_pylist())
        after = got[-1]
    assert got == vocab  # every term exactly once, ascending

    # prefix scoping + size cap
    for pre in ("a", "th", "zzz"):
        want = [t for t in vocab if t.startswith(pre)][:5]
        assert (eng.terms_enum(pre, size=5)["term"].to_pylist()
                == want)

    # case folding: uppercase probe matches nothing exact-case,
    # everything under case_insensitive
    pre = vocab[0][0].upper()
    assert eng.terms_enum(pre, size=5)["term"].to_pylist() == []
    assert (eng.terms_enum(pre, size=5,
                           case_insensitive=True)["term"].to_pylist()
            == [t for t in vocab if t.startswith(pre.lower())][:5])

    # field scoping: the role stream enumerates role values only
    roles = sorted({r for r in table["role"].to_pylist() if r})
    assert (eng.terms_enum("", size=10, field="role")["term"].to_pylist()
            == roles[:10])
    # pagination inside the field region
    assert (eng.terms_enum("", size=10, field="role",
                           search_after=roles[0])["term"].to_pylist()
            == roles[1:10])

    assert eng.terms_enum("a", size=0)["term"].to_pylist() == []
