"""ES point-in-time (_pit) analog: an opaque id pins the tombstone +
doc-values-update state a search sees, so concurrent delete_by_query /
update_by_query calls don't shift pagination or results under a
consumer. The id is stateless encoded generation numbers (like ES's
encoded segment handle), backed by the generational
``deletes_g{rev}`` / ``updates_g{rev}`` copies every mutation writes."""

from __future__ import annotations

import pytest

from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=3, num_shards=4)


@pytest.fixture()
def idx(tmp_path, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=30, seed=17)
    path = str(tmp_path / "idx")
    build_index(rd.from_arrow(table), path, CFG, clear=True)
    return path, table.to_pandas()


def _hits(t):
    return list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                    t["score"].to_pylist()))


def test_pit_pins_tombstones_across_deletes(idx):
    path, df = idx
    eng = QueryEngine(path)
    before = _hits(eng.search("the tool run", k=100000))
    pit0 = eng.open_pit()
    # a PIT at the live generation is served by the engine itself
    assert eng.pit(pit0) is eng

    eng.delete_by_query(filters={"role": "tool"})
    live = _hits(eng.search("the tool run", k=100000))
    assert len(live) < len(before)
    # the pinned view still serves the pre-delete ranking bit-identically
    assert _hits(eng.pit(pit0).search("the tool run", k=100000)) == before

    # a PIT opened NOW pins the current tombstones even after more
    # deletes (each mutation writes a generational copy)
    pit1 = eng.open_pit()
    eng.delete_by_query(filters={"role": "user"})
    live2 = _hits(eng.search("the tool run", k=100000))
    assert len(live2) < len(live)
    assert _hits(eng.pit(pit1).search("the tool run", k=100000)) == live
    assert _hits(eng.pit(pit0).search("the tool run", k=100000)) == before

    # pinned views are cached per generation pair
    assert eng.pit(pit0) is eng.pit(pit0)
    # a fresh engine resolves the same stateless ids identically
    eng2 = QueryEngine(path)
    assert _hits(eng2.pit(pit0).search("the tool run", k=100000)) == before
    assert _hits(eng2.pit(pit1).search("the tool run", k=100000)) == live


def test_pit_pins_doc_value_updates(idx):
    path, df = idx
    eng = QueryEngine(path)
    q = "the tool run"
    before = _hits(eng.search(q, k=100000, filters={"role": "user"}))
    assert before, "need user-role matches for the probe query"
    pit0 = eng.open_pit()

    eng.update_by_query(filters={"role": "user"},
                        set_values={"role": "annotator"})
    assert eng.search(q, k=100000,
                      filters={"role": "user"}).num_rows == 0
    assert _hits(eng.search(q, k=100000,
                            filters={"role": "annotator"})) == before
    view = eng.pit(pit0)
    # the pinned view filters on the ORIGINAL doc values
    assert _hits(view.search(q, k=100000,
                             filters={"role": "user"})) == before
    assert view.search(q, k=100000,
                       filters={"role": "annotator"}).num_rows == 0


def test_pit_expiry_close_and_validation(idx):
    path, _df = idx
    eng = QueryEngine(path)
    stale = eng.open_pit(keep_alive_s=-1.0)
    with pytest.raises(KeyError, match="expired"):
        eng.pit(stale)
    with pytest.raises(ValueError, match="point-in-time id"):
        eng.pit("not_a_pit")

    pit0 = eng.open_pit()
    eng.delete_by_query(filters={"role": "tool"})
    view = eng.pit(pit0)
    assert view is not eng
    assert eng.close_pit(pit0) is True   # evicts the cached view
    assert eng.close_pit(pit0) is False  # already gone
    # the id is stateless: reopening after close still works
    assert eng.pit(pit0) is not view
