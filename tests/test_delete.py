"""ES ``_delete_by_query`` analog: tombstoned docs vanish from every
result path (search / count / facets / sorted / fetch) while BM25
collection stats (df, N, avgdl) stay pre-merge — Elasticsearch's own
delete-before-segment-merge semantics. Reference behavior: the engine
the reference delegates to (Website.java POSTs bulk deletes via the
ES client when an import runs with ``clear``); here delete is a
first-class query-driven lifecycle op."""

from __future__ import annotations

import numpy as np
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=3, num_shards=4)


@pytest.fixture()
def idx(tmp_path, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=30, seed=11)
    path = str(tmp_path / "idx")
    build_index(rd.from_arrow(table), path, CFG, clear=True)
    return path, table.to_pandas()


def test_delete_by_filter_drops_docs_keeps_stats(idx):
    path, df = idx
    eng = QueryEngine(path)
    before = eng.search("the tool run", k=100000)
    stats_before = (eng.reader.n_docs, eng.reader.avgdl)
    n_tool = int((df["role"] == "tool").sum())

    n = eng.delete_by_query(filters={"role": "tool"})
    assert n == n_tool

    eng2 = QueryEngine(path)  # tombstones load at open
    after = eng2.search("the tool run", k=100000)
    roles = df.set_index(["conv_id", "turn_idx"])["role"]
    got = list(zip(after["conv_id"].to_pylist(),
                   after["turn_idx"].to_pylist()))
    assert got, "query should still match non-tool docs"
    assert all(roles.loc[k] != "tool" for k in got)
    # ES pre-merge semantics: scores of surviving docs are UNCHANGED
    # (df/N/avgdl still count the deleted docs)
    bd = {
        (c, t): s
        for c, t, s in zip(before["conv_id"].to_pylist(),
                           before["turn_idx"].to_pylist(),
                           before["score"].to_pylist())
    }
    for k, s in zip(got, after["score"].to_pylist()):
        assert k in bd and abs(bd[k] - s) < 1e-12
    assert (eng2.reader.n_docs, eng2.reader.avgdl) == stats_before


def test_delete_by_query_terms_and_idempotent(idx):
    path, df = idx
    eng = QueryEngine(path)
    # docs containing the token 'run' (OR-mode single term)
    want = {
        (c, t)
        for c, t, x in zip(df["conv_id"], df["turn_idx"], df["text"])
        if "run" in tokenize(x)
    }
    n1 = eng.delete_by_query("run")
    assert n1 == len(want)
    n2 = eng.delete_by_query("run")  # idempotent / monotone union
    assert n2 == n1
    eng2 = QueryEngine(path)
    t = eng2.search("run", k=500)
    assert t.num_rows == 0
    # count/facet paths exclude tombstones too
    assert eng2.count("run") == 0


def test_delete_match_all_and_live_paths(idx):
    path, df = idx
    eng = QueryEngine(path)
    n = eng.delete_by_query()  # match_all
    assert n == len(df)
    eng2 = QueryEngine(path)
    assert eng2.search("the", k=10).num_rows == 0
    assert eng2.count("the") == 0
    t = eng2.search_sorted("the", k=10)
    assert t.num_rows == 0


def test_delete_and_mode_requires_all_terms(idx):
    path, df = idx
    eng = QueryEngine(path)
    toks = [set(tokenize(x)) for x in df["text"]]
    want = sum(1 for s in toks if {"the", "run"} <= s)
    n = eng.delete_by_query("the run", mode="and")
    assert n == want


def test_delete_bumps_manifest_rev(idx):
    path, _ = idx
    from excelastic_ray.index import segments as seg

    eng = QueryEngine(path)
    r0 = seg.load_global_manifest(path).get("deletes_rev", 0)
    eng.delete_by_query(filters={"role": "tool"})
    assert seg.load_global_manifest(path)["deletes_rev"] == r0 + 1


# -- update_by_query (Lucene updateDocValues analog) ------------------------


def test_update_by_filter_changes_facets_not_scores(idx):
    path, df = idx
    eng = QueryEngine(path)
    before = eng.search("the run", k=100000)
    n_user = int((df["role"] == "user").sum())
    n = eng.update_by_query(filters={"role": "user"},
                            set_values={"tool": "archived"})
    assert n == n_user
    eng2 = QueryEngine(path)  # overlay loads at open
    after = eng2.search("the run", k=100000)
    assert after.equals(before)  # postings untouched: identical ranking
    # facet context sees the overlay
    fac = eng2.facets("the run", "tool")
    roles = df.set_index(["conv_id", "turn_idx"])["role"]
    got = list(zip(after["conv_id"].to_pylist(),
                   after["turn_idx"].to_pylist()))
    want_archived = sum(1 for kk in got if roles.loc[kk] == "user")
    assert fac.get("archived", 0) == want_archived
    # filter context matches on the NEW value
    t = eng2.search("the run", k=100000,
                    filters={"tool": "archived"})
    assert t.num_rows == want_archived


def test_update_keep_last_and_in_place(idx):
    path, df = idx
    eng = QueryEngine(path)
    eng.update_by_query(filters={"role": "tool"},
                        set_values={"tool": "first"})
    # same engine serves the overlay without reopen
    assert "first" in eng.facets("the", "tool")
    eng.update_by_query(filters={"role": "tool"},
                        set_values={"tool": "second"})
    eng2 = QueryEngine(path)
    fac = eng2.facets("the", "tool")
    assert "first" not in fac and "second" in fac


def test_update_by_query_terms_and_ts_attr(idx):
    path, df = idx
    eng = QueryEngine(path)
    want = {
        (c, t)
        for c, t, x in zip(df["conv_id"], df["turn_idx"], df["text"])
        if "run" in tokenize(x)
    }
    n = eng.update_by_query("run",
                            set_values={"ts": "2030-01-01T00:00:00"})
    assert n == len(want)
    eng2 = QueryEngine(path)
    t = eng2.search("the run", k=100000,
                    filters={"ts": {"gte": "2030-01-01"}})
    got = set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    hits = set(
        zip(*[
            eng2.search("the run", k=100000)[c].to_pylist()
            for c in ("conv_id", "turn_idx")
        ])
    )
    assert got == (want & hits)


def test_update_unknown_attr_raises(idx):
    path, _ = idx
    eng = QueryEngine(path)
    with pytest.raises(KeyError):
        eng.update_by_query("the", set_values={"nope": "x"})
    with pytest.raises(ValueError):
        eng.update_by_query("the")


def test_update_bumps_manifest_rev(idx):
    path, _ = idx
    from excelastic_ray.index import segments as seg

    eng = QueryEngine(path)
    r0 = seg.load_global_manifest(path).get("updates_rev", 0)
    eng.update_by_query(filters={"role": "tool"},
                        set_values={"tool": "x"})
    assert seg.load_global_manifest(path)["updates_rev"] == r0 + 1
