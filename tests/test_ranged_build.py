"""Ranged (no-shuffle) chunk phase: a conv-sorted parquet source builds
without the groupby exchange — one plain task per chunk reads its
contiguous row range — and the result is byte-identical to the shuffle
build. A source whose row-group statistics pass the sortedness screen
but whose rows are scattered WITHIN a row group is detected by the
per-chunk membership check and falls back to the shuffle path."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import excelastic_ray.index.build as build_mod
from excelastic_ray.index.build import _sorted_layout, build_index


def _conv_sorted(table: pa.Table) -> pa.Table:
    df = (
        table.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


@pytest.fixture(scope="module")
def sorted_corpus_dir(tmp_path_factory, tiny_table):
    """The tiny corpus re-written conv-sorted: 3 files, 2 row groups
    each, so ranged reads cross both file and row-group boundaries."""
    d = str(tmp_path_factory.mktemp("sorted_corpus"))
    t = _conv_sorted(tiny_table)
    per = (t.num_rows + 2) // 3
    for i in range(3):
        part = t.slice(i * per, per)
        if part.num_rows:
            pq.write_table(
                part,
                os.path.join(d, f"part-{i:05d}.parquet"),
                row_group_size=max(per // 2, 1),
            )
    return d


def test_sorted_layout_evidence(sorted_corpus_dir, tiny_corpus_dir):
    layout = _sorted_layout(sorted_corpus_dir)
    assert layout is not None
    assert sum(n for _, _, n in layout) > 0
    # files arrive in sorted-path order, row groups in file order
    paths = [p for p, _, _ in layout]
    assert paths == sorted(paths)
    # the interleaved corpus has overlapping per-file conv ranges
    assert _sorted_layout(tiny_corpus_dir) is None


def test_ranged_build_matches_shuffle_build(
    tmp_path, sorted_corpus_dir, tiny_corpus_dir, tiny_config, monkeypatch
):
    ranged_dir = str(tmp_path / "idx_ranged")
    # prove the ranged path is the one that runs: the shuffle chunk
    # phase must never be entered for the sorted source
    def _boom(*a, **k):  # noqa: ANN001
        raise AssertionError("shuffle chunk phase used for a sorted source")

    monkeypatch.setattr(build_mod, "_chunk_phase", _boom)
    monkeypatch.setattr(build_mod, "_chunk_phase_joined", _boom)
    res_r = build_index(sorted_corpus_dir, ranged_dir, tiny_config, clear=True)
    monkeypatch.undo()

    shuffle_dir = str(tmp_path / "idx_shuffle")
    res_s = build_index(tiny_corpus_dir, shuffle_dir, tiny_config, clear=True)

    assert res_r.n_docs == res_s.n_docs
    assert res_r.n_convs == res_s.n_convs
    assert res_r.n_postings == res_s.n_postings
    assert res_r.total_dl == res_s.total_dl

    # shard postings are byte-identical: same rows -> same chunks ->
    # same deterministic merge, regardless of which phase built them
    for shard in range(res_r.num_shards):
        a = os.path.join(
            ranged_dir, "shards", f"shard={shard:05d}", "postings.parquet"
        )
        b = os.path.join(
            shuffle_dir, "shards", f"shard={shard:05d}", "postings.parquet"
        )
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"shard {shard} differs"


def test_ranged_query_identical_to_oracle(
    tmp_path, sorted_corpus_dir, tiny_config, tiny_oracle, query_set
):
    from excelastic_ray.query.engine import QueryEngine

    d = str(tmp_path / "idx_q")
    build_index(sorted_corpus_dir, d, tiny_config, clear=True)
    eng = QueryEngine(d)
    for q in query_set:
        assert eng.search_topk(q, 10) == tiny_oracle.search(q, 10)


def test_ranged_dist_census_byte_identical(
    tmp_path, sorted_corpus_dir, tiny_config, monkeypatch
):
    """driver_conv_budget=0 forces the DISTRIBUTED census; a conv-sorted
    source must still take the ranged phase (the dist variant assembles
    each chunk's conv slice from the rank-ordered convs.parquet
    directory) and produce byte-identical shards."""
    from dataclasses import replace

    cfg_dist = replace(tiny_config, driver_conv_budget=0)

    def _boom(*a, **k):  # noqa: ANN001
        raise AssertionError("shuffle chunk phase used for a sorted source")

    monkeypatch.setattr(build_mod, "_chunk_phase", _boom)
    monkeypatch.setattr(build_mod, "_chunk_phase_joined", _boom)
    dist_dir = str(tmp_path / "idx_dist_ranged")
    res_d = build_index(sorted_corpus_dir, dist_dir, cfg_dist, clear=True)
    monkeypatch.undo()

    base_dir = str(tmp_path / "idx_broadcast")
    res_b = build_index(sorted_corpus_dir, base_dir, tiny_config, clear=True)
    assert res_d.n_docs == res_b.n_docs
    assert res_d.n_postings == res_b.n_postings
    for shard in range(res_d.num_shards):
        a = os.path.join(dist_dir, "shards", f"shard={shard:05d}",
                         "postings.parquet")
        b = os.path.join(base_dir, "shards", f"shard={shard:05d}",
                         "postings.parquet")
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"shard {shard} differs"


def test_scattered_rowgroup_falls_back(tmp_path, tiny_table, tiny_config):
    """A single-row-group file trivially passes the statistics screen,
    but its interleaved rows put foreign conversations inside every
    chunk's row range — the membership check must catch it and the
    build must COMPLETE via the shuffle fallback with a correct index."""
    d = str(tmp_path / "scattered")
    os.makedirs(d)
    # interleaved order, one giant row group: stats say [min,max] only
    pq.write_table(
        tiny_table,
        os.path.join(d, "part-00000.parquet"),
        row_group_size=tiny_table.num_rows,
    )
    assert _sorted_layout(d) is not None  # screen passes...
    idx = str(tmp_path / "idx_fallback")
    res = build_index(d, idx, tiny_config, clear=True)  # ...build still lands
    assert res.n_docs == tiny_table.num_rows

    # and the fallback index answers identically to a clean build
    from excelastic_ray.query.engine import QueryEngine

    eng = QueryEngine(idx)
    t = eng.search("the", 5)
    assert t.num_rows >= 0  # smoke: engine serves; rank identity below
    ref = str(tmp_path / "idx_ref")
    build_index(d, ref, tiny_config, clear=True, parallelism=2)
    ref_eng = QueryEngine(ref)
    for q in ("the", "a b", "term_not_in_corpus"):
        assert eng.search_topk(q, 10) == ref_eng.search_topk(q, 10)


def test_ranged_append_matches_shuffle_append(
    tmp_path, sorted_corpus_dir, tiny_config, monkeypatch
):
    """A conv-sorted increment appends with NO shuffle and produces the
    same index as the shuffle append (query-identical; same counters)."""
    from excelastic_ray.corpus import generate_transcripts
    from excelastic_ray.index.build import append_index
    from excelastic_ray.query.engine import QueryEngine

    # new conversations, disjoint ids (z-prefixed), written conv-sorted
    raw = generate_transcripts(n_convs=24, seed=7).to_pandas()
    raw["conv_id"] = "znew_" + raw["conv_id"].astype(str)
    new = _conv_sorted(pa.Table.from_pandas(raw, preserve_index=False))
    inc = str(tmp_path / "increment")
    os.makedirs(inc)
    pq.write_table(new, os.path.join(inc, "part-00000.parquet"),
                   row_group_size=max(new.num_rows // 3, 1))

    def _build_base(d):
        return build_index(sorted_corpus_dir, d, tiny_config, clear=True)

    a = str(tmp_path / "idx_a")
    _build_base(a)

    def _boom(*args, **kw):  # noqa: ANN001
        raise AssertionError("shuffle chunk phase used for sorted append")

    monkeypatch.setattr(build_mod, "_chunk_phase", _boom)
    monkeypatch.setattr(build_mod, "_chunk_phase_joined", _boom)
    res_a = append_index(inc, a)
    monkeypatch.undo()

    b = str(tmp_path / "idx_b")
    _build_base(b)
    # force the shuffle path by denying sortedness evidence
    monkeypatch.setattr(build_mod, "_sorted_layout", lambda src: None)
    res_b = append_index(inc, b)
    monkeypatch.undo()

    assert res_a.n_docs == res_b.n_docs
    assert res_a.n_postings == res_b.n_postings
    ea, eb = QueryEngine(a), QueryEngine(b)
    for q in ("the", "znew", "a b c", "term_not_in_corpus"):
        assert ea.search_topk(q, 20) == eb.search_topk(q, 20)
