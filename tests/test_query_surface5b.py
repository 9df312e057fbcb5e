"""Round-5 batch 3: collapse inner_hits, indices_boost, _validate."""

from __future__ import annotations

import numpy as np
import pytest

from excelastic_ray.query.engine import QueryEngine


@pytest.fixture(scope="module")
def eng(tiny_index):
    idx, _ = tiny_index
    return QueryEngine(idx)


def test_collapse_inner_vs_components(eng, query_set):
    # group ranking == search_collapse; per-group hits == the
    # top_hits buckets of the winning groups; group's first inner
    # hit IS the collapse hit
    for q in query_set[:6]:
        got = eng.search_collapse_inner(q, "role", k=3, inner_hits=3)
        grp = eng.search_collapse(q, "role", 3)
        th = eng.search_top_hits(q, "role", 3)
        order = []
        for v in grp["role"].to_pylist():
            if v not in order:
                order.append(v)
        seen = []
        for v in got["role"].to_pylist():
            if v not in seen:
                seen.append(v)
        assert seen == order
        # first inner hit per group equals the collapse winner
        firsts = {
            v: (c, t, s)
            for v, r, c, t, s in zip(
                got["role"].to_pylist(), got["inner_rank"].to_pylist(),
                got["conv_id"].to_pylist(), got["turn_idx"].to_pylist(),
                got["score"].to_pylist(),
            )
            if r == 1
        }
        for v, c, t, s in zip(grp["role"].to_pylist(),
                              grp["conv_id"].to_pylist(),
                              grp["turn_idx"].to_pylist(),
                              grp["score"].to_pylist()):
            assert firsts[v] == (c, t, s)
        # inner hits match the top_hits buckets for winning groups
        th_rows = {
            (v, r): (c, t, s)
            for v, r, c, t, s in zip(
                th["role"].to_pylist(), th["rank"].to_pylist(),
                th["conv_id"].to_pylist(), th["turn_idx"].to_pylist(),
                th["score"].to_pylist(),
            )
        }
        for v, r, c, t, s in zip(
            got["role"].to_pylist(), got["inner_rank"].to_pylist(),
            got["conv_id"].to_pylist(), got["turn_idx"].to_pylist(),
            got["score"].to_pylist(),
        ):
            assert th_rows[(v, r)] == (c, t, s)
        # group_score equals each group's best hit score
        for v, gs, r, s in zip(got["role"].to_pylist(),
                               got["group_score"].to_pylist(),
                               got["inner_rank"].to_pylist(),
                               got["score"].to_pylist()):
            if r == 1:
                assert gs == s


def test_collapse_inner_actor_parity(tiny_index, ray_session, query_set):
    idx, _ = tiny_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        q = query_set[5]
        a = actors.search_collapse_inner(q, "role", k=2, inner_hits=2)
        b = local.search_collapse_inner(q, "role", k=2, inner_hits=2)
        assert a.equals(b)
    finally:
        actors.close()


def test_indices_boost(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray.data as rd

    from excelastic_ray.config import IndexConfig
    from excelastic_ray.corpus import generate_transcripts
    from excelastic_ray.hashing import fnv1a_rows
    from excelastic_ray.index.build import build_index
    from excelastic_ray.query.multi import MultiIndexEngine

    root = tmp_path_factory.mktemp("ib")
    tbl = generate_transcripts(n_convs=30, seed=4)
    cfg = IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=2)
    dirs = []
    for parity in (0, 1):
        h = fnv1a_rows(
            [c.encode() for c in tbl["conv_id"].to_pylist()]
        ) % np.uint64(2)
        part = tbl.filter(pa.array(h == parity))
        d = str(root / f"p{parity}")
        build_index(rd.from_arrow(part), d, cfg, clear=True)
        dirs.append(d)
    me = MultiIndexEngine(dirs)
    # exhaustive k: the plain rows are then the FULL match set, so
    # rescale+resort reconstructs the boosted ranking exactly
    plain = me.search("the call", k=100000)
    boosted = me.search("the call", k=100000, boosts={"p0": 3.0})
    # expected: rescale the plain rows and re-sort
    rows = list(zip(plain["score"].to_pylist(),
                    plain["conv_id"].to_pylist(),
                    plain["turn_idx"].to_pylist(),
                    plain["index"].to_pylist()))
    exp = sorted(
        ((s * (3.0 if i == "p0" else 1.0), c, t, i)
         for s, c, t, i in rows),
        key=lambda r: (-r[0], r[1], r[2]),
    )
    assert list(zip(boosted["score"].to_pylist(),
                    boosted["conv_id"].to_pylist(),
                    boosted["turn_idx"].to_pylist(),
                    boosted["index"].to_pylist())) == exp
    with pytest.raises(KeyError):
        me.search("the", boosts={"nope": 2.0})


def test_validate_endpoint(ray_session, tmp_path):
    import json
    import urllib.request

    import ray.data as rd

    from excelastic_ray.config import IndexConfig
    from excelastic_ray.corpus import generate_transcripts
    from excelastic_ray.index.build import build_index
    from excelastic_ray.web import ImportServer

    root = str(tmp_path / "val")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=8, seed=2)),
        f"{root}/a",
        IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=2),
        clear=True,
    )
    srv = ImportServer(root).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        def post(body):
            req = urllib.request.Request(
                base + "/api/validate?index=a",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        ok = post({"query": {"bool": {"must": [{"match": "the"}]}}})
        assert ok == {"valid": True}
        bad = post({"query": {"bool": {"mustt": [{"match": "the"}]}}})
        assert bad["valid"] is False and bad["error"]
    finally:
        srv.stop()


def test_collapse_inner_and_boost_over_http(ray_session, tmp_path):
    import json
    import urllib.request

    import pyarrow as pa
    import ray.data as rd

    from excelastic_ray.config import IndexConfig
    from excelastic_ray.corpus import generate_transcripts
    from excelastic_ray.hashing import fnv1a_rows
    from excelastic_ray.index.build import build_index
    from excelastic_ray.index.snapshot import update_aliases
    from excelastic_ray.query.engine import QueryEngine
    from excelastic_ray.query.multi import MultiIndexEngine
    from excelastic_ray.web import ImportServer

    root = str(tmp_path / "b3")
    tbl = generate_transcripts(n_convs=20, seed=4)
    cfg = IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=2)
    dirs = []
    for parity in (0, 1):
        h = fnv1a_rows(
            [c.encode() for c in tbl["conv_id"].to_pylist()]
        ) % np.uint64(2)
        part = tbl.filter(pa.array(h == parity))
        d = f"{root}/p{parity}"
        build_index(rd.from_arrow(part), d, cfg, clear=True)
        dirs.append(d)
    update_aliases(root, [
        {"add": {"alias": "both", "index": "p0"}},
        {"add": {"alias": "both", "index": "p1"}},
    ])
    srv = ImportServer(root).start()
    base = f"http://127.0.0.1:{srv.port}"

    def get(url):
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    try:
        hits = get(base + "/api/search?index=both&q=the+call&k=10"
                   "&indices_boost=p0:2.5")["hits"]
        exp = MultiIndexEngine(dirs).search("the call", k=10,
                                            boosts={"p0": 2.5})
        assert [(h["index"], h["conv_id"]) for h in hits] == list(
            zip(exp["index"].to_pylist(), exp["conv_id"].to_pylist()))

        hits = get(base + "/api/search?index=p0&q=the+call&k=6"
                   "&collapse=role&inner_hits=2")["hits"]
        exp = QueryEngine(dirs[0]).search_collapse_inner(
            "the call", "role", k=6, inner_hits=2)
        assert [h["docid"] for h in hits] == exp["docid"].to_pylist()
        assert [h["inner_rank"] for h in hits] == \
            exp["inner_rank"].to_pylist()
    finally:
        srv.stop()


# ----------------------------------------------------------- script query


def test_script_query_equals_brute_filter(eng, tiny_table, query_set):
    from excelastic_ray.analysis import tokenize

    dl_of = {
        (c, t): len(tokenize(x))
        for c, t, x in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    for q in query_set[:6]:
        full = eng.search(q, k=100000)
        got = eng.search_script_query(
            q, "dl > 10 and not (turn_idx >= 8)", k=100000)
        exp = [
            (c, t, s)
            for c, t, s in zip(full["conv_id"].to_pylist(),
                               full["turn_idx"].to_pylist(),
                               full["score"].to_pylist())
            if dl_of[(c, t)] > 10 and t < 8
        ]
        assert list(zip(got["conv_id"].to_pylist(),
                        got["turn_idx"].to_pylist(),
                        got["score"].to_pylist())) == exp


def test_script_query_grammar_and_validation(eng):
    with pytest.raises(ValueError, match="boolean"):
        eng.search_script_query("the", "dl + 1")
    with pytest.raises(ValueError, match="chained"):
        eng.search_script_query("the", "1 < dl < 9")
    with pytest.raises(ValueError, match="unknown names"):
        eng.search_script_query("the", "xx > 1")
    with pytest.raises(ValueError):
        eng.search_script_query("the", "dl > lo", params={"lo": "x"})
    with pytest.raises(ValueError):
        eng.search_script_query("the", "__import__('os') > 1")
    # or / == / constant-true predicates work
    a = eng.search_script_query("the", "dl > 0 or turn_idx == 0", k=20)
    b = eng.search("the", k=20)
    assert a.equals(b)


def test_script_query_actor_parity(tiny_index, ray_session, query_set):
    idx, _ = tiny_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        q = query_set[5]
        a = actors.search_script_query(q, "dl >= 12 and turn_idx < 9")
        b = local.search_script_query(q, "dl >= 12 and turn_idx < 9")
        assert a.equals(b)
    finally:
        actors.close()


def test_cli_round5_flags(ray_session, tmp_path):
    import contextlib
    import io as _io
    import os

    import pyarrow.parquet as pq

    from excelastic_ray.__main__ import main
    from excelastic_ray.corpus import generate_transcripts

    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(generate_transcripts(n_convs=30, seed=1),
                   os.path.join(src, "p.parquet"))
    idx = str(tmp_path / "idx")
    out = _io.StringIO()
    with contextlib.redirect_stdout(out):
        assert main(["build", src, idx, "--clear", "--shards", "2"]) == 0
        assert main(["search", idx, "the call", "-k", "3",
                     "--min-score", "0.1"]) == 0
        assert main(["search", idx, "the call", "-k", "3",
                     "--script", "dl > 5 and turn_idx < 20"]) == 0
        assert main(["search", idx, "the call", "-k", "3",
                     "--collapse", "role", "--inner-hits", "2"]) == 0
        assert main(["search", idx, "the", "-k", "2", "--highlight",
                     "--fragments", "60"]) == 0
        assert main(["search", idx, "t", "-k", "4",
                     "--terms-enum"]) == 0
        assert main(["search", idx, "t", "-k", "4", "--terms-enum",
                     "--after", "the"]) == 0
    text = out.getvalue()
    assert "inner_rank" in text and "<em>" in text
    assert "the" in text  # the terms-enum page printed


# -------------------------------------------------- review-fix regressions


def test_mtermvectors_out_of_range_turn_skips(eng, tiny_table):
    # turn >= max_turns would alias into ANOTHER doc's id via the bit
    # arithmetic; it must skip, never report the aliased doc
    conv0 = tiny_table["conv_id"][0].as_py()
    mt = eng.reader.cfg.max_turns
    got = eng.mtermvectors([(conv0, mt), (conv0, -1), (conv0, 0)])
    assert set(got["turn_idx"].to_pylist()) == {0}
    assert eng.mtermvectors([(conv0, mt)]).num_rows == 0
    # same rule on the ids query
    t = eng.search_ids([(conv0, mt), (conv0, 0)])
    assert t["turn_idx"].to_pylist() == [0]


def test_script_fields_unknown_name_fails_on_driver(eng):
    with pytest.raises(ValueError, match="unknown names"):
        eng.search_script_fields("the", {"x": "scor * 2"})
    # a zero-hit query with a typo must ALSO raise (previously the
    # shards never evaluated the script and the typo passed silently)
    with pytest.raises(ValueError, match="unknown names"):
        eng.search_script_fields("term_not_in_corpus", {"x": "zz + 1"})


def test_frequent_item_sets_rejects_separator_items(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from excelastic_ray.pipelines.convs import frequent_item_sets

    ds = rd.from_arrow(pa.table({
        "conv_id": ["c1", "c1"], "tool": ["a|b", "c"],
    }))
    with pytest.raises(Exception, match="separator"):
        frequent_item_sets(ds, n_buckets=1).to_pandas()


def test_web_min_score_on_special_mode_raises(ray_session, tmp_path):
    import json
    import urllib.error
    import urllib.request

    import ray.data as rd

    from excelastic_ray.config import IndexConfig
    from excelastic_ray.corpus import generate_transcripts
    from excelastic_ray.index.build import build_index
    from excelastic_ray.web import ImportServer

    root = str(tmp_path / "msr")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=6, seed=2)),
        f"{root}/a",
        IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=2),
        clear=True,
    )
    srv = ImportServer(root).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        for bad in ("&phrase=1&min_score=1.0",
                    "&collapse=role&min_score=1.0",
                    "&fragment_size=50",               # no highlight
                    "&phrase=1&highlight=1&fragment_size=50"):
            try:
                urllib.request.urlopen(
                    base + "/api/search?index=a&q=the" + bad)
                raise AssertionError(f"expected 500 for {bad}")
            except urllib.error.HTTPError as e:
                assert e.code == 500
        # validate reports unknown-field typos as valid=false, not 400
        req = urllib.request.Request(
            base + "/api/validate?index=a",
            data=json.dumps({"query": {"match": {
                "field": "nope", "query": "x"}}}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["valid"] is False and "nope" in out["error"]
    finally:
        srv.stop()
