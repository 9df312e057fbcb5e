"""Append lifecycle: add new conversations to a complete index."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from excelastic_ray.index.build import ValidationError, append_index, build_index
from excelastic_ray.query.engine import QueryEngine
from excelastic_ray.query.oracle import BM25Oracle


def _split_corpus(tiny_table):
    convs = sorted(set(tiny_table["conv_id"].to_pylist()))
    cut = set(convs[: len(convs) // 2])
    mask = pa.array([c in cut for c in tiny_table["conv_id"].to_pylist()])
    return tiny_table.filter(mask), tiny_table.filter(pa.compute.invert(mask))


@pytest.fixture(scope="module")
def appended_index(tmp_path_factory, tiny_table, tiny_config):
    import ray.data as rd

    base_t, new_t = _split_corpus(tiny_table)
    d = str(tmp_path_factory.mktemp("append") / "idx")
    build_index(rd.from_arrow(base_t), d, tiny_config, clear=True)
    res = append_index(rd.from_arrow(new_t), d)
    return d, res, base_t, new_t


def test_append_counts_and_stats(appended_index, tiny_table, tiny_oracle):
    d, res, base_t, new_t = appended_index
    assert res.n_docs == tiny_table.num_rows
    assert res.n_convs == 120
    assert res.avgdl == pytest.approx(tiny_oracle.avgdl)


def test_append_scores_match_combined_oracle(appended_index, tiny_oracle, query_set):
    """Global stats (N, avgdl, df) after append equal a from-scratch
    build; scores are docid-independent, so the full (conv, turn, score)
    result set must match the combined-corpus oracle exactly (k large
    enough to capture every match, so tie ordering is irrelevant)."""
    d, *_ = appended_index
    eng = QueryEngine(d)
    for q in query_set:
        expect = {
            (tiny_oracle.keys_of(docid), round(score, 12))
            for docid, score in tiny_oracle.search(q, 10_000)
        }
        t = eng.search(q, 10_000)
        got = {
            ((c, ti), round(s, 12))
            for c, ti, s in zip(
                t["conv_id"].to_pylist(),
                t["turn_idx"].to_pylist(),
                t["score"].to_pylist(),
            )
        }
        assert got == expect, q


def test_append_rejects_duplicate_convs(appended_index):
    import ray.data as rd

    d, _, base_t, _ = appended_index
    with pytest.raises(ValidationError):
        append_index(rd.from_arrow(base_t.slice(0, 20)), d)


def test_append_docstore_complete(appended_index, tiny_table):
    from excelastic_ray.index.segments import read_docstore

    d, *_ = appended_index
    store = read_docstore(d, columns=["conv_id", "turn_idx"]).to_pandas()
    src = tiny_table.select(["conv_id", "turn_idx"]).to_pandas()
    got = set(zip(store["conv_id"], store["turn_idx"]))
    want = set(zip(src["conv_id"], src["turn_idx"]))
    assert got == want


def test_append_requires_complete_base(tmp_path, tiny_table, tiny_config):
    import ray.data as rd

    d = str(tmp_path / "noidx")
    with pytest.raises((ValidationError, FileNotFoundError)):
        append_index(rd.from_arrow(tiny_table.slice(0, 10)), d)


def test_kill_mid_build_then_resume(tmp_path, tiny_corpus_dir, tiny_config):
    """Literal kill-and-resume: SIGKILL a build subprocess once its first
    chunk manifests land, then resume in-process — the index completes
    and matches a clean build byte-for-byte."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from excelastic_ray.index.build import build_index

    d = str(tmp_path / "killed_idx")
    d_clean = str(tmp_path / "clean_idx")
    code = f"""
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from excelastic_ray.config import IndexConfig
from excelastic_ray.index.build import build_index
cfg = IndexConfig(**{tiny_config.to_dict()!r})
build_index({tiny_corpus_dir!r}, {d!r}, cfg, clear=True)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    # wait for the first chunk manifest, then kill hard
    seg_root = os.path.join(d, "segments")
    deadline = time.time() + 120
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — resume is then a no-op
        done = (
            [n for n in os.listdir(seg_root) if n.startswith("chunk=")]
            if os.path.isdir(seg_root)
            else []
        )
        if any(
            os.path.exists(os.path.join(seg_root, n, "MANIFEST.json"))
            for n in done
        ):
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.2)
    proc.wait(timeout=60)

    res = build_index(tiny_corpus_dir, d, tiny_config, resume=True)
    assert res.n_docs > 0
    build_index(tiny_corpus_dir, d_clean, tiny_config, clear=True)
    for name in sorted(os.listdir(os.path.join(d_clean, "segments"))):
        a = open(os.path.join(d, "segments", name, "postings.parquet"), "rb").read()
        b = open(
            os.path.join(d_clean, "segments", name, "postings.parquet"), "rb"
        ).read()
        assert a == b, name
    assert killed or res.chunks_skipped > 0


def test_append_onto_distributed_built_base(ray_session, tmp_path, tiny_table,
                                            tiny_config, tiny_oracle,
                                            query_set):
    """Appending onto a base built via the DISTRIBUTED rank path (dir-
    shaped convs.parquet) works: the extended conv table collapses to a
    file and queries match the combined-corpus oracle."""
    import os
    from dataclasses import replace

    import ray.data as rd

    base_t, new_t = _split_corpus(tiny_table)
    d = str(tmp_path / "idx_dist_append")
    cfg = replace(tiny_config, driver_conv_budget=0)
    build_index(rd.from_arrow(base_t), d, cfg, clear=True)
    assert os.path.isdir(os.path.join(d, "convs.parquet"))
    res = append_index(rd.from_arrow(new_t), d)
    assert res.n_convs == 120
    assert os.path.isfile(os.path.join(d, "convs.parquet"))
    eng = QueryEngine(d)
    full_oracle = BM25Oracle(tiny_table, cfg)
    for q in query_set[:4]:
        got = eng.search_topk(q, 10)
        exp = full_oracle.search(q, 10)
        # append reorders conv ranks (appended convs rank AFTER the
        # base), so compare (conv_id, turn_idx, score) not docids
        g = [(eng.reader.keys_of(np.array([d_]))[0][0],
              int(eng.reader.keys_of(np.array([d_]))[1][0]), s)
             for d_, s in got]
        e = [(full_oracle.keys_of(d_)[0], full_oracle.keys_of(d_)[1], s)
             for d_, s in exp]
        assert sorted(g) == sorted(e), q
