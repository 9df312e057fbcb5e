"""simple_query_string → DSL compiler: tree shapes, the leniency
repair rules, ES flag gating, and executor identity with the
equivalent query_string / hand-built DSL trees (one executor, so
identical trees must give bit-identical tables)."""

from __future__ import annotations

import pytest

from excelastic_ray.query.sqs import parse_simple_query_string_dsl

P = parse_simple_query_string_dsl


def test_parse_tree_shapes():
    assert P("error") == {"match": "error"}
    # ES-documented precedence example: foo | bar + baz
    assert P("foo | bar + baz") == {
        "bool": {"should": [
            {"match": "foo"},
            {"bool": {"must": [{"match": "bar"}, {"match": "baz"}]}},
        ], "minimum_should_match": 1}
    }
    # juxtaposition = default operator
    assert P("a b", default_operator="and") == {
        "bool": {"must": [{"match": "a"}, {"match": "b"}]}
    }
    # clause-initial '-' folds into must_not at its bool level
    assert P("a -b") == {
        "bool": {"should": [{"match": "a"}], "minimum_should_match": 1,
                 "must_not": [{"match": "b"}]}
    }
    assert P("a + -b") == {
        "bool": {"must": [{"match": "a"}], "must_not": [{"match": "b"}]}
    }
    # phrase with slop, prefix, fuzzy leaves
    assert P('"connection reset"~2 timeout') == {
        "bool": {"should": [
            {"phrase": {"query": "connection reset", "slop": 2}},
            {"match": "timeout"},
        ], "minimum_should_match": 1}
    }
    assert P("wind*") == {"prefix": "wind"}
    assert P("foo~1") == {"fuzzy": {"value": "foo", "fuzziness": 1}}
    assert P("foo~") == {"fuzzy": {"value": "foo", "fuzziness": "AUTO"}}
    # parens group
    assert P("(a | b) + c") == {
        "bool": {"must": [
            {"bool": {"should": [{"match": "a"}, {"match": "b"}],
                      "minimum_should_match": 1}},
            {"match": "c"},
        ]}
    }


def test_no_query_string_syntax_leaks():
    """query_string-only syntax is LITERAL text here: no field:value,
    no mid-term wildcards, no AND/OR/NOT keywords."""
    assert P("role:user") == {"match": "role:user"}
    assert P("pa?t") == {"match": "pa?t"}
    assert P("pa*t") == {"match": "pa*t"}  # '*' only trailing
    assert P("a AND b") == {
        "bool": {"should": [{"match": "a"}, {"match": "AND"},
                            {"match": "b"}],
                 "minimum_should_match": 1}
    }
    # mid-term '-' stays in the term (analyzer splits it later)
    assert P("foo-bar") == {"match": "foo-bar"}


def test_lenient_repairs():
    # unmatched ')' dropped; unmatched '(' closes at end
    assert P("((a b") == P("a b")
    assert P("a) b)") == P("a b")
    # dangling / doubled operators dropped
    assert P("| a | | b +") == P("a | b")
    assert P("+ a") == P("a")
    assert P("a -") == P("a")
    # empty groups vanish
    assert P("a ( ) b") == P("a b")
    # unclosed quote swallows the rest as the phrase (Lucene SQP rule)
    assert P('a "b c') == {
        "bool": {"should": [
            {"match": "a"},
            {"phrase": {"query": "b c", "slop": 0}},
        ], "minimum_should_match": 1}
    }
    # pure punctuation terms drop (a literal '+' with AND disabled)
    assert P("a .,;", flags="ALL") == {"match": "a"}


def test_escapes():
    # escaped operator chars are literal term text
    assert P(r"a \+ b") == P("a b")  # '+' alone analyzes to nothing
    assert P(r"foo\*") == {"match": "foo*"}  # escaped '*': not a prefix
    assert P(r"foo\~2") == {"match": "foo~2"}  # escaped '~': not fuzzy
    assert P(r'\"not a phrase\"') == {
        "bool": {"should": [{"match": '"not'}, {"match": "a"},
                            {"match": 'phrase"'}],
                 "minimum_should_match": 1}
    }


def test_flags_gate_operators():
    # PREFIX off: trailing '*' is literal (analyzer drops it)
    assert P("wind*", flags="OR|AND") == {"match": "wind*"}
    # FUZZY off: '~1' stays in the term
    assert P("foo~1", flags="PHRASE") == {"match": "foo~1"}
    # NOT off: '-' is literal (term survives, '-a' analyzes fine)
    assert P("b -a", flags="OR|AND|WHITESPACE") == {
        "bool": {"should": [{"match": "b"}, {"match": "-a"}],
                 "minimum_should_match": 1}
    }
    # NONE: every char literal, one term per... no whitespace split
    assert P("foo+bar", flags="NONE") == {"match": "foo+bar"}
    # SLOP is the ES alias of NEAR
    assert P('"a b"~1', flags="PHRASE|SLOP") == {
        "phrase": {"query": "a b", "slop": 1}}
    # NEAR off: the '~1' after the quote is literal text (a term the
    # analyzer reduces to '1'), exactly like ES
    assert P('"a b"~1', flags="PHRASE") == {
        "bool": {"should": [{"phrase": {"query": "a b", "slop": 0}},
                            {"match": "~1"}],
                 "minimum_should_match": 1}}
    with pytest.raises(ValueError, match="unknown flags"):
        P("a", flags="BOGUS")
    with pytest.raises(ValueError, match="NONE excludes"):
        P("a", flags="NONE|OR")


def test_refusals():
    for bad in ("", "   ", "+ | ( )", "-foo", "-a -b"):
        with pytest.raises(ValueError):
            P(bad)
    with pytest.raises(ValueError, match="default_operator"):
        P("a", default_operator="xor")


def test_search_simple_string_end_to_end(tiny_index, tiny_table):
    from collections import Counter

    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    counts = Counter()
    for t in tiny_table["text"].to_pylist():
        counts.update(tokenize(t))
    h = [t for t, _ in counts.most_common(6)]

    # SQS form == hand-built DSL tree (same executor, same order)
    got = eng.search_simple_string(
        f"{h[0]} + ({h[1]} | {h[2]}) -{h[3]}", k=25,
        default_operator="and")
    want = eng.search_dsl({
        "bool": {"must": [
            {"match": h[0]},
            {"bool": {"should": [{"match": h[1]}, {"match": h[2]}],
                      "minimum_should_match": 1}},
        ], "must_not": [{"match": h[3]}]}
    }, k=25)
    assert got.num_rows > 0 and got.equals(want)

    # same algebra as the query_string syntax (shared executor)
    qs_want = eng.search_string(
        f"{h[0]} AND ({h[1]} OR {h[2]}) AND NOT {h[3]}", k=25)
    assert got.equals(qs_want)

    # a MALFORMED query still answers: stray parens/ops repaired
    messy = eng.search_simple_string(
        f"))+ {h[0]} | | {h[1]} (", k=25)
    clean = eng.search_simple_string(f"{h[0]} | {h[1]}", k=25)
    assert messy.equals(clean)

    # prefix leaf == search_wildcard's scoring_boolean rewrite
    pre = h[0][:2]
    got_w = eng.search_simple_string(f"{pre}*", k=25)
    want_w = eng.search_prefix(pre, k=25)
    assert got_w["docid"].to_pylist() == want_w["docid"].to_pylist()
    assert got_w["score"].to_pylist() == want_w["score"].to_pylist()

    # highlight marks positive-leaf tokens only
    hl = eng.search_simple_string(f"{h[0]} -{h[1]}", k=5, highlight=True)
    assert "highlight" in hl.column_names
    for s in hl["highlight"].to_pylist():
        assert f"<em>{h[1]}</em>" not in s
