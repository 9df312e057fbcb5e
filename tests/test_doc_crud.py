"""Single-document CRUD (ES ``_index`` / ``_delete`` one doc): add a
turn, overwrite a turn, tombstone a turn — reusing the chunk builder,
the streaming shard merge, and the deletes.parquet machinery. The
compaction path for tombstones is ``reindex`` (force_merge refuses
overlays by design); force_merge after clean writes preserves docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from excelastic_ray.config import IndexConfig
from excelastic_ray.index.build import (
    ValidationError,
    build_index,
    delete_doc,
    force_merge,
    index_doc,
    reindex,
)
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=6, convs_per_chunk_bits=2, num_shards=3)


def _corpus() -> pa.Table:
    convs, turns, texts = [], [], []
    for c in range(10):
        for t in range(3):
            convs.append(f"c{c:04d}")
            turns.append(t)
            texts.append(f"alpha bravo token{c} turn{t}")
    n = len(texts)
    base = np.datetime64("2026-01-01T00:00:00", "us")
    return pa.table(
        {
            "conv_id": pa.array(convs),
            "turn_idx": pa.array(turns, type=pa.int32()),
            "role": pa.array(["user", "assistant", "tool"][i % 3]
                             for i in range(n)),
            "tool": pa.array(
                ["search" if i % 3 == 2 else None for i in range(n)],
                type=pa.string(),
            ),
            "ts": pa.array([base + np.timedelta64(i, "m") for i in range(n)]),
            "text": pa.array(texts),
        }
    )


@pytest.fixture()
def crud_index(tmp_path, ray_session):
    import ray.data as rd

    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(_corpus()), idx, CFG, clear=True)
    return idx


def test_index_doc_new_conversation(crud_index):
    docid = index_doc(
        crud_index,
        {"conv_id": "zzz_new", "turn_idx": 0, "role": "user",
         "text": "zulu unique sentinel"},
    )
    eng = QueryEngine(crud_index)
    t = eng.search("zulu sentinel", k=5)
    assert t.num_rows == 1
    assert t["conv_id"][0].as_py() == "zzz_new"
    assert t["docid"][0].as_py() == docid
    # source round-trips
    src = eng.reader.fetch_docs([docid], columns=["text"])
    assert src["text"][0].as_py() == "zulu unique sentinel"


def test_index_doc_new_turn_existing_conv(crud_index):
    docid = index_doc(
        crud_index,
        {"conv_id": "c0004", "turn_idx": 10, "role": "assistant",
         "text": "golf hotel brandnewturn"},
    )
    eng = QueryEngine(crud_index)
    t = eng.search("brandnewturn", k=5)
    assert t.num_rows == 1
    assert (t["conv_id"][0].as_py(), t["turn_idx"][0].as_py()) == ("c0004", 10)
    # the rest of the conversation is untouched
    assert eng.search("token4", k=10).num_rows == 3
    assert eng.reader.n_docs == 31
    del docid


def test_index_doc_refuses_duplicate_without_overwrite(crud_index):
    with pytest.raises(ValidationError, match="overwrite"):
        index_doc(
            crud_index,
            {"conv_id": "c0001", "turn_idx": 0, "role": "user",
             "text": "clobber"},
        )


def test_index_doc_overwrite_replaces_text_and_stats(crud_index):
    old = QueryEngine(crud_index)
    assert old.search("token1", k=10).num_rows == 3
    index_doc(
        crud_index,
        {"conv_id": "c0001", "turn_idx": 0, "role": "user",
         "text": "replacement uniqueword"},
        overwrite=True,
    )
    eng = QueryEngine(crud_index)
    assert eng.reader.n_docs == 30  # replaced, not added
    t = eng.search("uniqueword", k=5)
    assert t.num_rows == 1
    assert (t["conv_id"][0].as_py(), t["turn_idx"][0].as_py()) == ("c0001", 0)
    # the old text no longer matches for that turn
    assert eng.search("token1", k=10).num_rows == 2
    # df/avgdl reflect the rebuilt chunk (engine == fresh oracle)
    from excelastic_ray.query.oracle import BM25Oracle

    tab = _corpus().to_pandas()
    m = (tab["conv_id"] == "c0001") & (tab["turn_idx"] == 0)
    tab.loc[m, "text"] = "replacement uniqueword"
    oracle = BM25Oracle(pa.Table.from_pandas(tab, preserve_index=False), CFG)
    for q in ("alpha bravo", "uniqueword", "token1 turn2"):
        assert eng.search_topk(q, k=10) == oracle.search(q, k=10), q


def test_delete_doc_tombstones_and_reindex_expunges(crud_index, tmp_path):
    eng0 = QueryEngine(crud_index)
    n_before = eng0.search("token3", k=10).num_rows
    assert n_before == 3
    delete_doc(crud_index, "c0003", 1)
    eng = QueryEngine(crud_index)  # re-open: deletes_rev bumped
    assert eng.search("token3", k=10).num_rows == 2
    # pre-merge semantics: N/df still cover the tombstoned doc
    assert eng.reader.n_docs == 30
    # double delete is the ES 404
    with pytest.raises(KeyError):
        delete_doc(crud_index, "c0003", 1)
    with pytest.raises(KeyError):
        delete_doc(crud_index, "nosuchconv", 0)
    # reindex = the expunge/compaction path
    dst = str(tmp_path / "expunged")
    reindex(crud_index, dst)
    eng2 = QueryEngine(dst)
    assert eng2.reader.n_docs == 29
    assert eng2.search("token3", k=10).num_rows == 2


def test_overwrite_resurrects_tombstoned_doc(crud_index):
    delete_doc(crud_index, "c0002", 2)
    assert QueryEngine(crud_index).search("token2", k=10).num_rows == 2
    index_doc(
        crud_index,
        {"conv_id": "c0002", "turn_idx": 2, "role": "tool",
         "text": "token2 risen again"},
        overwrite=True,
    )
    eng = QueryEngine(crud_index)
    assert eng.search("token2", k=10).num_rows == 3
    assert eng.search("risen", k=5).num_rows == 1


def test_forcemerge_preserves_crud_writes(crud_index):
    index_doc(
        crud_index,
        {"conv_id": "zzz_keep", "turn_idx": 0, "role": "user",
         "text": "persistent needle"},
    )
    index_doc(
        crud_index,
        {"conv_id": "c0005", "turn_idx": 0, "role": "user",
         "text": "rewritten needle"},
        overwrite=True,
    )
    force_merge(crud_index, num_shards=1)
    eng = QueryEngine(crud_index)
    t = eng.search("needle", k=10)
    assert t.num_rows == 2
    assert sorted(t["conv_id"].to_pylist()) == ["c0005", "zzz_keep"]


def test_index_doc_turn_out_of_range(crud_index):
    with pytest.raises(ValidationError, match="turn_idx"):
        index_doc(
            crud_index,
            {"conv_id": "c0001", "turn_idx": 1 << 10, "role": "user",
             "text": "x"},
        )


def test_crud_on_append_created_chunk_effective_shards(tmp_path, ray_session):
    """Regression: the owning shard must come from the manifest's
    EFFECTIVE shard count (build caps num_shards at the chunk count),
    not the config's requested fan-out — an overwrite of a doc in an
    append-created chunk previously re-merged a nonexistent shard and
    the search kept serving the old postings."""
    import numpy as np
    import ray.data as rd

    from excelastic_ray.index.build import index_doc

    t = pa.table(
        {
            "conv_id": pa.array(["a-1", "a-2"]),
            "turn_idx": pa.array([0, 0], type=pa.int32()),
            "role": pa.array(["user", "user"]),
            "tool": pa.array([None, None], type=pa.string()),
            "ts": pa.array([np.datetime64("2026-01-01", "us")] * 2),
            "text": pa.array(["hello world", "goodbye world"]),
        }
    )
    idx = str(tmp_path / "idx")
    # requested fan-out 8, but one chunk → effective num_shards == 1
    build_index(rd.from_arrow(t), idx, IndexConfig(num_shards=8),
                clear=True)
    index_doc(idx, {"conv_id": "crudconv", "turn_idx": 0, "role": "user",
                    "text": "zebra quagga sentinel"})
    assert QueryEngine(idx).search("quagga", k=5).num_rows == 1
    index_doc(idx, {"conv_id": "crudconv", "turn_idx": 0, "role": "user",
                    "text": "zebra okapi rewritten"}, overwrite=True)
    eng = QueryEngine(idx)
    assert eng.search("okapi", k=5).num_rows == 1
    assert eng.search("quagga", k=5).num_rows == 0
    delete_doc(idx, "crudconv", 0)
    assert QueryEngine(idx).search("okapi", k=5).num_rows == 0


def test_update_doc_overlays_attrs(crud_index):
    from excelastic_ray.index.build import update_doc

    update_doc(crud_index, "c0001", 0, {"role": "assistant"})
    eng = QueryEngine(crud_index)
    # filter context sees the new value; scoring text unchanged
    t = eng.search("token1", k=10, filters={"role": "assistant"})
    assert ("c0001", 0) in list(
        zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
    )
    t2 = eng.search("token1", k=10, filters={"role": "user"})
    assert ("c0001", 0) not in list(
        zip(t2["conv_id"].to_pylist(), t2["turn_idx"].to_pylist())
    )
    # keep-last: a second update of the same attr wins
    update_doc(crud_index, "c0001", 0, {"role": "tool"})
    eng2 = QueryEngine(crud_index)
    t3 = eng2.search("token1", k=10, filters={"role": "tool"})
    assert ("c0001", 0) in list(
        zip(t3["conv_id"].to_pylist(), t3["turn_idx"].to_pylist())
    )
    # validation: unknown attr / missing doc
    from excelastic_ray.index.build import update_doc as ud
    with pytest.raises(KeyError):
        ud(crud_index, "c0001", 0, {"nope": "x"})
    with pytest.raises(KeyError):
        ud(crud_index, "ghost", 0, {"role": "user"})
    # composes with update_by_query's overlay (same file, keep-last)
    eng3 = QueryEngine(crud_index)
    n = eng3.update_by_query(query="token2", set_values={"role": "user"})
    assert n == 3
