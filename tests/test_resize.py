"""ES ``_shrink`` / ``_split`` analogs: a NEW index at a different
shard fan-out built by hard-linking the immutable chunk segments and
re-running only the deterministic shard merge — byte-identical to a
fresh build at the target fan-out, search-identical to the source."""

from __future__ import annotations

import os

import pytest

from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index, shrink_index, split_index
from excelastic_ray.index.segments import load_global_manifest
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=4)


def _results(idx):
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


def _shard_bytes(idx, shard, name="postings.parquet"):
    p = os.path.join(idx, "shards", f"shard={shard:05d}", name)
    with open(p, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def src_index(ray_session, tmp_path_factory):
    import ray.data as rd

    root = tmp_path_factory.mktemp("resize")
    idx = str(root / "src")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=40, seed=6)),
        idx, CFG, clear=True,
    )
    return idx, str(root)


def test_shrink_and_split_are_search_identical(src_index):
    idx, root = src_index
    before = _results(idx)

    m2 = shrink_index(idx, f"{root}/shrunk", 2)
    assert m2["num_shards"] == 2 and m2["status"] == "complete"
    assert _results(f"{root}/shrunk") == before
    # the source is untouched
    assert load_global_manifest(idx)["num_shards"] == 4
    assert _results(idx) == before

    m8 = split_index(idx, f"{root}/split", 8)
    assert m8["num_shards"] == 8 and m8["status"] == "complete"
    assert _results(f"{root}/split") == before


def test_resize_matches_fresh_build_byte_identically(src_index):
    import ray.data as rd

    idx, root = src_index
    shrink_index(idx, f"{root}/shrunk_bi", 2)
    fresh = f"{root}/fresh2"
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=40, seed=6)),
        fresh,
        IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=2),
        clear=True,
    )
    for s in range(2):
        for name in ("postings.parquet", "docs.parquet"):
            assert _shard_bytes(f"{root}/shrunk_bi", s, name) == \
                _shard_bytes(fresh, s, name), (s, name)


def test_resize_factor_rules(src_index):
    idx, root = src_index
    with pytest.raises(ValueError, match="factor"):
        shrink_index(idx, f"{root}/bad1", 3)  # 4 % 3 != 0
    with pytest.raises(ValueError, match="factor"):
        shrink_index(idx, f"{root}/bad2", 8)  # shrink can't grow
    with pytest.raises(ValueError, match="multiple"):
        split_index(idx, f"{root}/bad3", 6)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="multiple"):
        split_index(idx, f"{root}/bad4", 2)  # split can't shrink
    with pytest.raises(ValueError, match="chunk segments"):
        split_index(idx, f"{root}/bad5", 40)  # > chunk count
    with pytest.raises(ValueError):
        shrink_index(idx, f"{root}/bad6", 0)


def test_resize_refuses_nonempty_target_and_overlays(src_index,
                                                     tmp_path):
    import ray.data as rd

    idx, root = src_index
    os.makedirs(f"{root}/occupied", exist_ok=True)
    open(f"{root}/occupied/x", "w").close()
    with pytest.raises(RuntimeError, match="not empty"):
        shrink_index(idx, f"{root}/occupied", 2)

    from excelastic_ray.index.build import delete_doc

    dirty = str(tmp_path / "dirty")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=8, seed=3)),
        dirty,
        IndexConfig(turn_bits=8, convs_per_chunk_bits=1, num_shards=4),
        clear=True,
    )
    eng = QueryEngine(dirty)
    t = eng.search("the", k=1)
    delete_doc(dirty, t["conv_id"][0].as_py(),
               int(t["turn_idx"][0].as_py()))
    with pytest.raises(RuntimeError, match="overlay"):
        shrink_index(dirty, str(tmp_path / "dirty2"), 2)


def test_resize_over_http(src_index):
    import json
    import urllib.request

    from excelastic_ray.web import ImportServer

    idx, root = src_index
    # the server serves indexes out of its repo root; the module
    # fixture's src index lives there already as "src"
    srv = ImportServer(root).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        req = urllib.request.Request(
            base + "/api/shrink?index=src&target=http_shrunk"
            "&num_shards=2",
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["num_shards"] == 2 and out["status"] == "complete"

        with urllib.request.urlopen(
            base + "/api/search?index=http_shrunk&q=the+call&k=5"
        ) as r:
            hits = json.loads(r.read())["hits"]
        eng = QueryEngine(idx)
        exp = eng.search("the call", k=5)
        assert [h["docid"] for h in hits] == exp["docid"].to_pylist()

        # factor violation surfaces as a 400
        req = urllib.request.Request(
            base + "/api/split?index=src&target=bad&num_shards=6",
            method="POST",
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_resize_resumes_after_crash(src_index):
    import json

    idx, root = src_index
    dst = f"{root}/resume"
    m = shrink_index(idx, dst, 2)
    before = _results(dst)
    # simulate a crash mid-merge: status still 'resizing', one shard's
    # manifest gone (its merge "didn't finish")
    m["status"] = "resizing"
    with open(os.path.join(dst, "manifest.json"), "w") as f:
        json.dump(m, f)
    os.unlink(os.path.join(dst, "shards", "shard=00001",
                           "MANIFEST.json"))
    m2 = shrink_index(idx, dst, 2)
    assert m2["status"] == "complete" and m2["num_shards"] == 2
    assert _results(dst) == before
    # a COMPLETE target (or any foreign dir) still refuses
    with pytest.raises(RuntimeError, match="not empty"):
        shrink_index(idx, dst, 2)


def test_resize_distributed_census_index(ray_session, tmp_path):
    """convs.parquet is a DIRECTORY on distributed-census builds
    (driver_conv_budget=0); resize must link it recursively."""
    import ray.data as rd

    src = str(tmp_path / "dsrc")
    build_index(
        rd.from_arrow(generate_transcripts(n_convs=40, seed=6)),
        src,
        IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=4,
                    driver_conv_budget=0),
        clear=True,
    )
    assert os.path.isdir(os.path.join(src, "convs.parquet"))
    before = _results(src)
    m = shrink_index(src, str(tmp_path / "dshrunk"), 2)
    assert m["num_shards"] == 2 and m["status"] == "complete"
    assert _results(str(tmp_path / "dshrunk")) == before


def test_resize_crash_before_any_link_resumes(src_index, tmp_path):
    """The 'resizing' manifest lands before the link phase, so a
    crash at ANY point leaves a resumable target."""
    import json

    idx, root = src_index
    dst = str(tmp_path / "early")
    # simulate the earliest possible crash: manifest written, nothing
    # else (what the fixed ordering guarantees exists)
    os.makedirs(dst)
    m = dict(load_global_manifest(idx))
    m["config"] = {**m["config"], "num_shards": 2}
    m["num_shards"] = 2
    m["status"] = "resizing"
    with open(os.path.join(dst, "manifest.json"), "w") as f:
        json.dump(m, f)
    m2 = shrink_index(idx, dst, 2)
    assert m2["status"] == "complete"
    assert _results(dst) == _results(idx)
