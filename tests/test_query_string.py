"""query_string syntax → DSL compiler + field-scoped DSL match leaves.

The parser must produce the documented tree shapes; search_string must
equal the equivalent hand-built DSL query (same executor, same
clause order ⇒ bit-identical scores) and the dedicated query APIs on
the shapes they share.
"""

from __future__ import annotations

import pytest

from excelastic_ray.query.qs import parse_query_string_dsl

CFG_FIELDS = None  # built lazily in the fixture (needs IndexConfig)


@pytest.fixture(scope="module")
def qs_field_index(tmp_path_factory, ray_session):
    import ray.data as rd

    from excelastic_ray.config import IndexConfig
    from excelastic_ray.corpus import generate_transcripts
    from excelastic_ray.index.build import build_index

    cfg = IndexConfig(
        turn_bits=8, convs_per_chunk_bits=3, num_shards=4,
        field_index_fields=("role", "tool"),
    )
    table = generate_transcripts(n_convs=40, seed=7)
    idx = str(tmp_path_factory.mktemp("qsfieldidx") / "idx")
    build_index(rd.from_arrow(table), idx, cfg, clear=True)
    return idx, table


def test_parse_tree_shapes():
    p = parse_query_string_dsl
    assert p("error") == {"match": "error"}
    assert p("error timeout") == {
        "bool": {"should": [{"match": "error"}, {"match": "timeout"}],
                 "minimum_should_match": 1}
    }
    assert p("error timeout", default_operator="and") == {
        "bool": {"must": [{"match": "error"}, {"match": "timeout"}]}
    }
    assert p("a AND b OR c") == {
        "bool": {"should": [
            {"bool": {"must": [{"match": "a"}, {"match": "b"}]}},
            {"match": "c"},
        ], "minimum_should_match": 1}
    }
    assert p("a AND (b OR c)") == {
        "bool": {"must": [
            {"match": "a"},
            {"bool": {"should": [{"match": "b"}, {"match": "c"}],
                      "minimum_should_match": 1}},
        ]}
    }
    assert p("a AND NOT b") == {
        "bool": {"must": [{"match": "a"}], "must_not": [{"match": "b"}]}
    }
    assert p("a && !b") == p("a AND NOT b")
    # OR-level NOT folds into a global must_not (the Lucene rule)
    assert p("a -b") == {
        "bool": {"should": [{"match": "a"}], "minimum_should_match": 1,
                 "must_not": [{"match": "b"}]}
    }
    assert p("a OR NOT b") == p("a -b")
    assert p('"connection reset"~1 OR timeout') == {
        "bool": {"should": [
            {"phrase": {"query": "connection reset", "slop": 1}},
            {"match": "timeout"},
        ], "minimum_should_match": 1}
    }
    assert p("role:user AND error") == {
        "bool": {"must": [
            {"match": {"field": "role", "query": "user"}},
            {"match": "error"},
        ]}
    }
    assert p("retr* AND ti?eout") == {
        "bool": {"must": [{"wildcard": "retr*"}, {"wildcard": "ti?eout"}]}
    }
    assert p("NOT NOT a") == {"match": "a"}
    # lowercase and/or/not are terms, not operators (Lucene rule)
    assert p("a and b", default_operator="and") == {
        "bool": {"must": [{"match": "a"}, {"match": "and"},
                          {"match": "b"}]}
    }


def test_parse_minus_is_not():
    assert parse_query_string_dsl("a AND -b") == {
        "bool": {"must": [{"match": "a"}], "must_not": [{"match": "b"}]}
    }
    # default_operator=and folds juxtaposed -term into must_not
    assert parse_query_string_dsl("a -b", default_operator="and") == {
        "bool": {"must": [{"match": "a"}], "must_not": [{"match": "b"}]}
    }
    # mid-token hyphens stay inside the term
    assert parse_query_string_dsl("foo-bar") == {"match": "foo-bar"}


def test_parse_errors():
    p = parse_query_string_dsl
    for bad in ("", "   ", "NOT a", "NOT a OR NOT b", "(NOT a)",
                "a AND", "AND a", "(a", "a)", 'role:"a phrase"',
                "role:us*r", '""'):
        with pytest.raises(ValueError):
            p(bad)
    with pytest.raises(ValueError, match="default_operator"):
        p("a", default_operator="xor")


def test_search_string_end_to_end(tiny_index, tiny_table):
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(tokenize(t))
    h = [t for t, _ in counts.most_common(6)]

    # string form == hand-built DSL tree (same executor, same order)
    qs = f"{h[0]} AND ({h[1]} OR {h[2]}) AND NOT {h[3]}"
    want = eng.search_dsl({
        "bool": {"must": [
            {"match": h[0]},
            {"bool": {"should": [{"match": h[1]}, {"match": h[2]}],
                      "minimum_should_match": 1}},
        ], "must_not": [{"match": h[3]}]}
    }, k=25)
    got = eng.search_string(qs, k=25)
    assert got.num_rows > 0 and got.equals(want)

    # AND chain == search(mode="and"); single term == search
    a = eng.search_string(f"{h[0]} AND {h[1]}", k=25)
    b = eng.search(f"{h[0]} {h[1]}", k=25, mode="and")
    assert a.equals(b)
    assert eng.search_string(h[0], k=25).equals(eng.search(h[0], k=25))

    # default_operator="and" joins juxtaposed terms conjunctively
    assert eng.search_string(
        f"{h[0]} {h[1]}", k=25, default_operator="and"
    ).equals(b)

    # phrase with slop == search_phrase on the same text
    txt = tiny_table["text"].to_pylist()[0]
    toks = tokenize(txt)[:2]
    if len(toks) == 2:
        ph = f'"{toks[0]} {toks[1]}"~1'
        assert eng.search_string(ph, k=25).equals(
            eng.search_phrase(f"{toks[0]} {toks[1]}", k=25, slop=1))

    # wildcard leaf == search_wildcard (scoring_boolean rewrite)
    pre = h[0][:2]
    got_w = eng.search_string(f"{pre}*", k=25)
    want_w = eng.search_wildcard(f"{pre}*", k=25)
    assert [r for r in zip(got_w["conv_id"].to_pylist(),
                           got_w["turn_idx"].to_pylist(),
                           got_w["score"].to_pylist())] == \
        [r for r in zip(want_w["conv_id"].to_pylist(),
                        want_w["turn_idx"].to_pylist(),
                        want_w["score"].to_pylist())]


def test_search_string_field_clause(qs_field_index):
    """role:user scores in the role stream and restricts matches to
    user turns when conjoined."""
    import pyarrow.compute as pc

    from excelastic_ray.query.engine import QueryEngine

    idx, table = qs_field_index
    eng = QueryEngine(idx)
    res = eng.search_string("role:user AND the", k=25)
    if res.num_rows == 0:  # 'the' may be absent in the tiny corpus
        res = eng.search_string("role:user", k=25)
    assert res.num_rows > 0
    docs = eng.reader.fetch_docs(res["docid"].to_numpy(), ["role"])
    assert pc.all(pc.equal(docs["role"], "user")).as_py()


def test_search_bool_prefix(tiny_index, tiny_table):
    """match_bool_prefix == the equivalent DSL tree; single token ==
    plain prefix query; operator=and requires every clause."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(tokenize(t))
    h = [t for t, _ in counts.most_common(4)]
    pre = h[1][:2]

    got = eng.search_bool_prefix(f"{h[0]} {pre}", k=25)
    want = eng.search_dsl({"bool": {"should": [
        {"term": h[0]},
        {"prefix": {"value": pre, "max_expansions": 50}},
    ], "minimum_should_match": 1}}, k=25)
    assert got.num_rows > 0 and got.equals(want)

    got_and = eng.search_bool_prefix(f"{h[0]} {pre}", k=25,
                                     operator="and")
    want_and = eng.search_dsl({"bool": {"must": [
        {"term": h[0]},
        {"prefix": {"value": pre, "max_expansions": 50}},
    ]}}, k=25)
    assert got_and.equals(want_and)

    # single token == a plain prefix query (scoring_boolean)
    a = eng.search_bool_prefix(pre, k=25)
    b = eng.search_prefix(pre, k=25)
    assert [r for r in zip(a["conv_id"].to_pylist(),
                           a["turn_idx"].to_pylist(),
                           a["score"].to_pylist())] == \
        [r for r in zip(b["conv_id"].to_pylist(),
                        b["turn_idx"].to_pylist(),
                        b["score"].to_pylist())]

    with pytest.raises(ValueError, match="operator"):
        eng.search_bool_prefix("x", operator="xor")
    with pytest.raises(ValueError, match="at least one"):
        eng.search_bool_prefix("")


def test_dsl_field_match_leaf_equals_search_fields(qs_field_index):
    """A standalone field-scoped match leaf must equal multi_match
    most_fields over that single field (same stats, same scoring)."""
    from excelastic_ray.query.engine import QueryEngine

    idx, _ = qs_field_index
    eng = QueryEngine(idx)
    a = eng.search_dsl({"match": {"field": "role", "query": "user"}},
                       k=25)
    b = eng.search_fields("user", ["role"], k=25)
    assert a.num_rows > 0
    assert [r for r in zip(a["conv_id"].to_pylist(),
                           a["turn_idx"].to_pylist(),
                           a["score"].to_pylist())] == \
        [r for r in zip(b["conv_id"].to_pylist(),
                        b["turn_idx"].to_pylist(),
                        b["score"].to_pylist())]
    # unknown field surfaces the indexing contract
    with pytest.raises(KeyError, match="not indexed per-field"):
        eng.search_dsl({"match": {"field": "nope", "query": "x"}})


def test_parse_roundtrip_randomized():
    """Property: render a random DSL-able boolean tree to query_string
    syntax (explicit parens + operators) and parse it back — the
    compiled tree must match the original exactly."""
    import numpy as np

    rng = np.random.default_rng(41)
    words = [f"w{i}" for i in range(8)]

    def gen(depth):
        r = rng.random()
        if depth >= 3 or r < 0.45:
            w = words[int(rng.integers(0, len(words)))]
            return {"match": w}, w
        op = "AND" if r < 0.75 else "OR"
        n = int(rng.integers(2, 4))
        kids = [gen(depth + 1) for _ in range(n)]
        text = f" {op} ".join(f"({t})" for _, t in kids)
        if op == "AND":
            node = {"bool": {"must": [k for k, _ in kids]}}
            # maybe bolt on a NOT clause
            if rng.random() < 0.4:
                w = words[int(rng.integers(0, len(words)))]
                node["bool"]["must_not"] = [{"match": w}]
                text += f" AND NOT ({w})"
            return node, text
        return (
            {"bool": {"should": [k for k, _ in kids],
                      "minimum_should_match": 1}},
            text,
        )

    for _ in range(60):
        node, text = gen(0)
        assert parse_query_string_dsl(text) == node, text


def test_parser_fuzz_never_crashes():
    """Random byte soup either parses to a dict tree or raises
    ValueError — never any other exception (the web surface feeds
    user-typed strings straight in)."""
    import numpy as np

    rng = np.random.default_rng(97)
    alphabet = list("abc ()\"~*?:-!&|AND OR NOT 0123456789_")
    for _ in range(500):
        n = int(rng.integers(1, 24))
        s = "".join(alphabet[int(rng.integers(0, len(alphabet)))]
                    for _ in range(n))
        try:
            out = parse_query_string_dsl(s)
            assert isinstance(out, dict)
        except ValueError:
            pass


def test_search_string_highlight(tiny_index, tiny_table):
    """highlight marks positive-leaf tokens and never must_not ones."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(tokenize(t))
    h = [t for t, _ in counts.most_common(3)]
    res = eng.search_string(f"{h[0]} AND NOT {h[2]}", k=10,
                            highlight=True)
    assert res.num_rows > 0 and "highlight" in res.column_names
    for snip in res["highlight"].to_pylist():
        assert f"<em>{h[0]}</em>" in snip.lower() or h[0] not in \
            tokenize(snip.replace("<em>", " ").replace("</em>", " "))
        assert f"<em>{h[2]}</em>" not in snip.lower()


def test_dsl_fuzzy_leaf(tiny_index, tiny_table):
    """fuzzy DSL leaf == search_fuzzy on the same single token, and
    composes inside bools; validation."""
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(tokenize(t))
    tok = counts.most_common(1)[0][0]
    typo = tok[:-1] + ("x" if tok[-1] != "x" else "y")
    a = eng.search_dsl({"fuzzy": {"value": typo, "fuzziness": 1}}, k=25)
    b = eng.search_fuzzy(typo, k=25, fuzziness=1)
    assert a.num_rows > 0
    assert [r for r in zip(a["conv_id"].to_pylist(),
                           a["turn_idx"].to_pylist(),
                           a["score"].to_pylist())] == \
        [r for r in zip(b["conv_id"].to_pylist(),
                        b["turn_idx"].to_pylist(),
                        b["score"].to_pylist())]
    # composes: must fuzzy + must_not term runs and bounds the set
    a_full = eng.search_dsl({"fuzzy": {"value": typo, "fuzziness": 1}},
                            k=10**6)
    c = eng.search_dsl({"bool": {"must": [{"fuzzy": typo}],
                                 "must_not": [{"term": tok}]}},
                       k=10**6)
    assert c.num_rows < a_full.num_rows
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly one analyzer"):
        eng.search_dsl({"fuzzy": "two tokens"})
    with _pytest.raises(ValueError, match="fuzzy takes"):
        eng.search_dsl({"fuzzy": {"term": "x"}})


def test_parse_fuzzy_suffix():
    p = parse_query_string_dsl
    assert p("tiemout~1") == {"fuzzy": {"value": "tiemout",
                                        "fuzziness": 1}}
    assert p("tiemout~") == {"fuzzy": {"value": "tiemout",
                                       "fuzziness": "AUTO"}}
    assert p("a AND b~2") == {
        "bool": {"must": [{"match": "a"},
                          {"fuzzy": {"value": "b", "fuzziness": 2}}]}
    }
    with pytest.raises(ValueError, match="wildcards with"):
        p("ti*me~1")
    with pytest.raises(ValueError, match="fuzzy field"):
        p("role:user~1")


def test_search_string_fuzzy_suffix(tiny_index, tiny_table):
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(tokenize(t))
    tok = counts.most_common(1)[0][0]
    typo = tok[:-1] + ("x" if tok[-1] != "x" else "y")
    a = eng.search_string(f"{typo}~1", k=25)
    b = eng.search_fuzzy(typo, k=25, fuzziness=1)
    assert a.num_rows > 0
    assert [r for r in zip(a["conv_id"].to_pylist(),
                           a["turn_idx"].to_pylist(),
                           a["score"].to_pylist())] == \
        [r for r in zip(b["conv_id"].to_pylist(),
                        b["turn_idx"].to_pylist(),
                        b["score"].to_pylist())]


def test_parse_field_grouping():
    """Lucene field grouping role:(a OR b) distributes the field over
    the group's bare terms (regression: this used to silently parse
    as the literal term 'role:' OR an unscoped group)."""
    p = parse_query_string_dsl
    assert p("role:(user OR assistant)") == {
        "bool": {"should": [
            {"match": {"field": "role", "query": "user"}},
            {"match": {"field": "role", "query": "assistant"}},
        ], "minimum_should_match": 1}
    }
    assert p("role:(user assistant)", default_operator="and") == {
        "bool": {"must": [
            {"match": {"field": "role", "query": "user"}},
            {"match": {"field": "role", "query": "assistant"}},
        ]}
    }
    assert p("error AND role:(user OR NOT assistant)") == {
        "bool": {"must": [
            {"match": "error"},
            {"bool": {
                "should": [{"match": {"field": "role",
                                      "query": "user"}}],
                "minimum_should_match": 1,
                "must_not": [{"match": {"field": "role",
                                        "query": "assistant"}}],
            }},
        ]}
    }
    # non-term leaves keep their field:value restrictions; dangling
    # field prefixes now raise instead of matching the literal token
    for bad in ('role:("a b")', "role:(us*r)", "role:(usr~1)",
                "role:(tool:search)", "role:", "role: user",
                "role:()", "3role:(a)"):
        with pytest.raises(ValueError):
            p(bad)


def test_search_string_field_grouping(qs_field_index):
    """role:(user OR assistant) == the hand-built DSL bool of the two
    field-scoped leaves, bit-identical; conjoined grouping restricts
    matches exactly like the single field clause union."""
    from excelastic_ray.query.engine import QueryEngine

    idx, _ = qs_field_index
    eng = QueryEngine(idx)
    got = eng.search_string("role:(user OR assistant)", k=50)
    want = eng.search_dsl(
        {"bool": {"should": [
            {"match": {"field": "role", "query": "user"}},
            {"match": {"field": "role", "query": "assistant"}},
        ], "minimum_should_match": 1}}, k=50)
    assert got.num_rows > 0
    assert got.equals(want)
    docs = eng.reader.fetch_docs(got["docid"].to_numpy(), ["role"])
    assert set(docs["role"].to_pylist()) <= {"user", "assistant"}
