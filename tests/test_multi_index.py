"""Multi-index (ES index-pattern) search: combined-stats scoring over a
partition of the corpus is bit-identical to the single-index engine —
scores, counts, facets, time-ordered view and deep paging."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.hashing import fnv1a_rows
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine
from excelastic_ray.query.multi import MultiIndexEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=3, num_shards=4)


@pytest.fixture(scope="module")
def split(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=40, seed=13)
    root = tmp_path_factory.mktemp("multi")
    full, a, b = str(root / "full"), str(root / "even"), str(root / "odd")
    build_index(rd.from_arrow(table), full, CFG, clear=True)
    h = fnv1a_rows(
        [c.encode() for c in table["conv_id"].to_pylist()]
    ) % np.uint64(2)
    build_index(rd.from_arrow(table.filter(pa.array(h == 0))), a, CFG,
                clear=True)
    build_index(rd.from_arrow(table.filter(pa.array(h == 1))), b, CFG,
                clear=True)
    return QueryEngine(full), MultiIndexEngine([a, b])


@pytest.mark.parametrize("query", ["the call run", "table", "w00001 ok"])
def test_multi_equals_single_scores(split, query):
    se, me = split
    s = se.search(query, k=15).to_pandas()
    m = me.search(query, k=15).to_pandas()
    assert s["conv_id"].tolist() == m["conv_id"].tolist()
    assert s["turn_idx"].tolist() == m["turn_idx"].tolist()
    np.testing.assert_array_equal(s["score"].to_numpy(),
                                  m["score"].to_numpy())
    # every hit is attributed to the index that holds it
    par = {"even": 0, "odd": 1}
    for conv, idx in zip(m["conv_id"], m["index"]):
        assert int(fnv1a_rows([conv.encode()])[0] % np.uint64(2)) == par[idx]


def test_multi_count_facets_and_filters(split):
    se, me = split
    assert se.count("the call") == me.count("the call")
    assert se.facets("the call", "role") == me.facets("the call", "role")
    s = se.search("the call", k=10, filters={"role": "user"}).to_pandas()
    m = me.search("the call", k=10, filters={"role": "user"}).to_pandas()
    assert s["conv_id"].tolist() == m["conv_id"].tolist()
    assert me.search("zzz_absent", k=5).num_rows == 0
    assert me.count("zzz_absent") == 0


@pytest.mark.parametrize("order", ["asc", "desc"])
def test_multi_sorted_and_deep_paging(split, order):
    se, me = split
    want = se.search_sorted("the", k=40, order=order).to_pandas()
    got = me.search_sorted("the", k=40, order=order).to_pandas()
    assert want["conv_id"].tolist() == got["conv_id"].tolist()
    assert want["ts"].tolist() == got["ts"].tolist()
    pages, after = [], None
    for _ in range(4):
        pg = me.search_sorted("the", k=10, order=order,
                              search_after=after).to_pandas()
        pages.append(pg)
        after = (pg["ts"].iloc[-1], pg["conv_id"].iloc[-1],
                 int(pg["turn_idx"].iloc[-1]))
    gp = pd.concat(pages, ignore_index=True)
    assert gp["conv_id"].tolist() == want["conv_id"].tolist()
    assert gp["turn_idx"].tolist() == want["turn_idx"].tolist()
