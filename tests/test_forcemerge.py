"""ES _forcemerge analog: shard-count compaction from the retained
level-0 segments, search-identical before and after."""

from __future__ import annotations

import pytest

from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index, force_merge
from excelastic_ray.index.segments import load_global_manifest
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=6)


def _snapshot_results(idx):
    eng = QueryEngine(idx)
    out = {}
    for q in ("the call run", "w00007", "tool the"):
        t = eng.search(q, k=100000)
        out[q] = list(zip(t["docid"].to_pylist(), t["score"].to_pylist()))
    t = eng.search_phrase("the call", k=50)
    out["phrase"] = list(zip(t["docid"].to_pylist(),
                             t["score"].to_pylist()))
    out["count"] = eng.count("the")
    return out


def test_force_merge_is_search_identical(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=40, seed=6)),
        idx, CFG, clear=True,
    )
    before = _snapshot_results(idx)
    m0 = load_global_manifest(idx)
    assert m0["num_shards"] == 6

    m1 = force_merge(idx, num_shards=1)
    assert m1["num_shards"] == 1 and m1["status"] == "complete"
    assert m1["build_id"] != m0["build_id"]
    import os

    names = sorted(os.listdir(os.path.join(idx, "shards")))
    assert names == ["shard=00000"]
    assert _snapshot_results(idx) == before

    # widening again also works (2 < chunks) and stays identical
    m2 = force_merge(idx, num_shards=2)
    assert m2["num_shards"] == 2
    assert _snapshot_results(idx) == before

    # no-op at the current fan-out
    assert force_merge(idx, num_shards=2)["build_id"] == m2["build_id"]


def test_force_merge_refuses_overlays(ray_session, tmp_path):
    import ray.data as rd

    idx = str(tmp_path / "idx2")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=20, seed=8)),
        idx, CFG, clear=True,
    )
    eng = QueryEngine(idx)
    assert eng.delete_by_query(filters={"role": "tool"}) > 0
    with pytest.raises(RuntimeError, match="reindex"):
        force_merge(idx, num_shards=1)


def test_force_merge_over_http_and_cli(ray_session, tmp_path):
    import contextlib
    import io as _io
    import json as _json
    import urllib.request

    import ray.data as rd

    from excelastic_ray.__main__ import main
    from excelastic_ray.web import ImportServer

    root = str(tmp_path / "root")
    idx = f"{root}/a"
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=20, seed=9)),
        idx, CFG, clear=True,
    )
    before = _snapshot_results(idx)
    srv = ImportServer(root).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/forcemerge"
            f"?index=a&max_num_segments=1",
            data=b"",
        )
        with urllib.request.urlopen(req) as r:
            out = _json.loads(r.read())
        assert out["num_shards"] == 1
        # search through the server picks up the merged index
        hits = srv.search("a", "the call run", k=5)["hits"]
        assert len(hits) == 5
    finally:
        srv.stop()
    assert _snapshot_results(idx) == before

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["forcemerge", idx, "--shards", "3"]) == 0
    assert '"num_shards": 3' in buf.getvalue()
    assert _snapshot_results(idx) == before


def test_force_merge_validates_and_resumes(ray_session, tmp_path):
    """Review fixes: num_shards < 1 refuses before touching files, and
    a crashed merge (status force_merging) re-runs even at the
    recorded fan-out instead of no-op'ing on a broken index."""
    import ray.data as rd

    from excelastic_ray.index.segments import (
        load_global_manifest,
        save_global_manifest,
    )

    idx = str(tmp_path / "idx3")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=20, seed=10)),
        idx, CFG, clear=True,
    )
    before = _snapshot_results(idx)
    with pytest.raises(ValueError, match=">= 1"):
        force_merge(idx, num_shards=-1)
    with pytest.raises(ValueError, match=">= 1"):
        force_merge(idx, num_shards=0)
    assert _snapshot_results(idx) == before  # nothing was touched

    # simulate a crash mid-merge: status flipped, shard manifests gone
    import os as _os
    import shutil as _shutil

    m = load_global_manifest(idx)
    m["status"] = "force_merging"
    save_global_manifest(idx, m)
    _shutil.rmtree(_os.path.join(idx, "shards", "shard=00003"))
    out = force_merge(idx, num_shards=m["num_shards"])
    assert out["status"] == "complete"
    assert _snapshot_results(idx) == before
