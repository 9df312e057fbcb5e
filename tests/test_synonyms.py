"""Query-time synonym expansion (Lucene SynonymQuery semantics):
group tf = Σ member tfs, group df = max member df, one contribution
per group."""

from __future__ import annotations

import numpy as np
import pytest

from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.bm25 import contribution, idf
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=3, num_shards=4)


@pytest.fixture(scope="module")
def syn(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=30, seed=9)
    idx = str(tmp_path_factory.mktemp("synidx") / "idx")
    build_index(rd.from_arrow(table), idx, CFG, clear=True)
    return QueryEngine(idx), table.to_pandas()


def test_no_synonyms_equals_plain_search(syn):
    """An empty synonym table degenerates to the standard per-term
    BM25 ranking, bit-identical."""
    eng, _ = syn
    a = eng.search("the call tool", k=25)
    b = eng.search_synonyms("the call tool", {}, k=25)
    assert a["docid"].to_pylist() == b["docid"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_synonym_group_scores_as_one_pseudo_term(syn):
    """Hand-check one doc: score("a", syn={a: [b]}) must equal the
    BM25 contribution of tf_a+tf_b with idf from max(df_a, df_b)."""
    from excelastic_ray.analysis import tokenize

    eng, df = syn
    t1, t2 = "run", "call"  # both common in the generated corpus
    res = eng.search_synonyms(t1, {t1: [t2]}, k=5)
    assert res.num_rows > 0
    r = eng.reader
    df1, df2 = (int(x) for x in eng._global_dfs([t1, t2]))
    assert df1 > 0 and df2 > 0
    g_idf = idf(r.n_docs, max(df1, df2))
    avgdl = r.avgdl
    row = res.to_pylist()[0]
    doc = df[(df.conv_id == row["conv_id"])
             & (df.turn_idx == row["turn_idx"])].iloc[0]
    toks = tokenize(doc.text)
    tf = float(toks.count(t1) + toks.count(t2))
    want = contribution(g_idf, np.array([tf]), np.array([len(toks)]),
                        avgdl, CFG.k1, CFG.b)[0]
    assert row["score"] == want


def test_absent_synonyms_do_not_change_df(syn):
    """Members absent from the corpus add no df (max rule) and no tf:
    ranking identical to the plain query."""
    eng, _ = syn
    a = eng.search("run the", k=20)
    b = eng.search_synonyms(
        "run the", {"run": ["zzzneverseen"], "the": ["qqqabsent"]}, k=20
    )
    assert a["docid"].to_pylist() == b["docid"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_synonym_recall_superset(syn):
    """Docs containing ONLY the synonym (not the base term) enter the
    result set."""
    eng, _ = syn
    base = {r for r in eng.search("w00007", k=100000)["docid"].to_pylist()}
    fused = {
        r
        for r in eng.search_synonyms(
            "w00007", {"w00007": ["w00013"]}, k=100000
        )["docid"].to_pylist()
    }
    only_syn = {
        r for r in eng.search("w00013", k=100000)["docid"].to_pylist()
    }
    assert fused == base | only_syn and only_syn - base


def test_actor_path_identical(syn):
    eng, _ = syn
    local = eng.search_synonyms("run the call", {"run": ["call"]}, k=15)
    actors = QueryEngine(eng.reader.index_dir, use_actors=True)
    try:
        remote = actors.search_synonyms("run the call", {"run": ["call"]},
                                        k=15)
        assert local["docid"].to_pylist() == remote["docid"].to_pylist()
        assert local["score"].to_pylist() == remote["score"].to_pylist()
    finally:
        actors.close()
