"""English analyzer preset: stopword removal + light stemming, kept in
ONE definition shared by engine, Python oracle, and the DuckDB SQL twin
(analysis.py discipline). The reference's ``--mapping`` selects ES-side
analysis the same way (ImportEvent.java:43,60; ElasticWriter.java:160-161).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from excelastic_ray.analysis import (
    STOP_EN,
    analyze_tokens,
    analyzer_sql,
    stem_en,
    stem_sql,
    tokenize,
)
from excelastic_ray.config import IndexConfig
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine
from excelastic_ray.query.oracle import BM25Oracle

CFG = IndexConfig(turn_bits=6, convs_per_chunk_bits=2, num_shards=2,
                  analyzer="english")

TEXTS = [
    "the runner was running fast and the race was long",
    "she runs daily but he ran yesterday with the dogs",
    "running indexes requires merged segments and sorted postings",
    "a study of studies: the studied cases were indexed",
    "boxes and glasses are stored in the stores",
    "stopped processes restart; the process stops cleanly",
    "run the query engine",
    "these queries use stemming",
    "mass is not a plural; class passes okay",
    "the the the and and of of",  # pure stopwords
]


def _table() -> pa.Table:
    n = len(TEXTS)
    base = np.datetime64("2026-01-01T00:00:00", "us")
    return pa.table(
        {
            "conv_id": pa.array([f"c{i // 2:04d}" for i in range(n)]),
            "turn_idx": pa.array([i % 2 for i in range(n)], type=pa.int32()),
            "role": pa.array(["user", "assistant"][i % 2] for i in range(n)),
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array([base + np.timedelta64(i, "m") for i in range(n)]),
            "text": pa.array(TEXTS),
        }
    )


@pytest.fixture(scope="module")
def en_index(tmp_path_factory, ray_session):
    import ray.data as rd

    t = _table()
    idx = str(tmp_path_factory.mktemp("enidx") / "idx")
    build_index(rd.from_arrow(t), idx, CFG, clear=True)
    return QueryEngine(idx), BM25Oracle(t, CFG), t


def test_stemmer_examples():
    assert stem_en("studies") == "study"
    assert stem_en("boxes") == "boxe"      # Harman rule 2 keeps the e
    assert stem_en("runs") == "run"
    assert stem_en("running") == "run"     # ing strip + dedouble
    assert stem_en("stopped") == "stop"    # ed strip + dedouble
    assert stem_en("indexed") == "index"
    assert stem_en("mass") == "mass"       # -ss guard
    assert stem_en("ties") == "tie"        # rule 2 drops the s
    assert stem_en("this") == "thi"        # raw stem; "this" is a
    # stopword, so the analyzer CHAIN never stems it (stop before stem)
    assert stem_en("bonus") == "bonus"     # -us guard
    assert stem_en("sing") == "sing"       # ing length guard


def test_analyze_tokens_chain():
    # stopwords removed BEFORE stemming; order and duplicates kept
    toks = tokenize("The runner was running and RUNS", "english")
    assert toks == ["runner", "run", "run"]
    assert analyze_tokens(["the"], "english") == []


def test_stem_sql_matches_python():
    """The DuckDB stem expression must equal stem_en on every analyzer
    token of the corpus plus an adversarial generated set."""
    import duckdb

    words = sorted(
        {t for x in TEXTS for t in x.replace(";", " ").replace(":", " ")
         .replace(",", " ").lower().split()}
    )
    words += [
        "aies", "eies", "dies", "oes", "aes", "ees", "es", "s", "ss",
        "us", "ing", "ring", "string", "strings", "seeing", "freed",
        "feed", "reed", "red", "sled", "added", "a1s", "x_es", "9es",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE w(t VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    got = dict(con.execute(f"SELECT t, {stem_sql('t')} FROM w").fetchall())
    for w in words:
        assert got[w] == stem_en(w), w


def test_analyzer_sql_matches_tokenize():
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE d(text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?)", [(t,) for t in TEXTS])
    rows = con.execute(
        f"SELECT {analyzer_sql('text', 'english')} FROM d"
    ).fetchall()
    for (got,), raw in zip(rows, TEXTS):
        assert got == tokenize(raw, "english"), raw


def test_search_rank_identical_to_oracle(en_index):
    eng, oracle, _ = en_index
    for q in ("running", "runs", "the study", "stopped queries",
              "boxes engine", "the and of"):
        assert eng.search_topk(q, k=10) == oracle.search(q, k=10), q


def test_stemming_conflates_variants(en_index):
    eng, _, t = en_index
    # "running" and "runs" analyze to the same term and return the
    # same ranking
    a = eng.search("running", k=10)
    b = eng.search("runs", k=10)
    assert a.equals(b)
    assert a.num_rows >= 4  # run/runs/ran?/running docs (ran doesn't stem)


def test_stopwords_never_match(en_index):
    eng, _, _ = en_index
    assert eng.search("the", k=10).num_rows == 0
    assert eng.count("the and of") == 0


def test_phrase_over_analyzed_stream(en_index):
    """Positions are assigned over the ANALYZED stream: 'run the query
    engine' indexes as [run, query, engine], so the stop-removed phrase
    'run query' matches with slop 0."""
    eng, oracle, _ = en_index
    got = eng.search_phrase("run query", k=10)
    assert got.num_rows >= 1
    assert eng.search_phrase("run query", k=10).equals(
        eng.search_phrase("run the query", k=10)
    )  # the stopword vanishes before position assignment
    assert (
        [(d, s) for d, s in zip(got["docid"].to_pylist(),
                                got["score"].to_pylist())]
        == oracle.phrase_search("run query", k=10)
    )


def test_highlight_stemmed_terms(en_index):
    eng, _, _ = en_index
    t = eng.search("running", k=10, include_source=True, highlight=True)
    hl = "\n".join(t["highlight"].to_pylist())
    assert "<em>" in hl
    # surface forms of the stem are highlighted, not just the query form
    assert "<em>runs</em>" in hl or "<em>running</em>" in hl


def test_rebuild_refuses_analyzer_mismatch(en_index):
    """The analyzer is part of the index identity: building onto an
    existing index with a different analyzer (without clear) refuses,
    exactly like any other config change. (append_index reads its
    config from the manifest, so it can never drift by construction.)"""
    import ray.data as rd

    eng, _, _ = en_index
    with pytest.raises(Exception, match="different config"):
        build_index(
            rd.from_arrow(_table()),
            eng.reader.index_dir,
            IndexConfig(turn_bits=6, convs_per_chunk_bits=2, num_shards=2,
                        analyzer="standard"),
            clear=False,
        )


def test_standard_default_unchanged():
    assert IndexConfig().analyzer == "standard"
    assert tokenize("The Runner runs") == ["the", "runner", "runs"]
    assert analyze_tokens(["the", "runs"]) == ["the", "runs"]


def test_stopword_list_is_sorted_ascii():
    assert list(STOP_EN) == sorted(STOP_EN)
    assert all(w.isascii() and w.islower() for w in STOP_EN)


def test_actor_mode_matches_local_english(en_index):
    """Analyzer-aware query analysis happens on the driver; the shard
    actors score pre-analyzed terms — actor-served results must equal
    in-process results on the english index."""
    eng, _, _ = en_index
    actor_eng = QueryEngine(eng.reader.index_dir, use_actors=True)
    try:
        for q in ("running", "the study", "stopped queries"):
            assert actor_eng.search_topk(q, 10) == eng.search_topk(q, 10)
    finally:
        actor_eng.close()


def test_synonym_members_run_through_index_analyzer(en_index):
    """A synonym member like "running" must stem to the dictionary form
    on an english index, or the synonym silently contributes nothing
    (round-4 review fix: members used the standard analyzer)."""
    eng, _, _ = en_index
    # "sprint" is absent from the corpus; its synonym member "running"
    # stems to "run", which IS in the dictionary — the group must score
    got = eng.search_synonyms("sprint", {"sprint": ["running"]}, 10)
    assert got.num_rows > 0
    # and the group behaves like searching the stemmed member directly
    direct = eng.search("run", 10)
    assert got["conv_id"].to_pylist() == direct["conv_id"].to_pylist()
    assert got["turn_idx"].to_pylist() == direct["turn_idx"].to_pylist()
