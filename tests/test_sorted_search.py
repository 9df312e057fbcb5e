"""Sort-by-field results + search_after deep pagination (ES
sort/search_after; Kibana Discover's default time-ordered view)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=3, num_shards=4)


@pytest.fixture(scope="module")
def ts_index(tmp_path_factory, ray_session):
    import ray.data as rd

    table = generate_transcripts(n_convs=40, seed=11)
    idx = str(tmp_path_factory.mktemp("tsidx") / "idx")
    build_index(rd.from_arrow(table), idx, CFG, clear=True)
    return idx, table


def _client_side(table, terms, order, role=None):
    """Full expected ordering: matching docs sorted by (ts, docid)."""
    rows = []
    for c, ti, tx, r, ts in zip(
        table["conv_id"].to_pylist(), table["turn_idx"].to_pylist(),
        table["text"].to_pylist(), table["role"].to_pylist(),
        table["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
    ):
        if role is not None and r != role:
            continue
        toks = set(tokenize(tx))
        if any(t in toks for t in terms):
            rows.append((int(ts), c, int(ti)))
    # docid order == (conv_id, turn_idx) order, so it is the tie-break
    rows.sort(key=lambda x: ((x[0] if order == "asc" else -x[0]), x[1], x[2]))
    return rows


def test_sorted_matches_full_ordering(ts_index):
    idx, table = ts_index
    eng = QueryEngine(idx)
    for order in ("asc", "desc"):
        exp = _client_side(table, ["the", "call"], order)
        got = eng.search_sorted("the call", k=len(exp) + 10, order=order)
        assert got.num_rows == len(exp)
        assert (
            list(
                zip(
                    got["ts"].to_numpy().astype(np.int64).tolist(),
                    got["conv_id"].to_pylist(),
                    got["turn_idx"].to_pylist(),
                )
            )
            == exp
        )


def test_search_after_paging_equals_slice(ts_index):
    idx, table = ts_index
    eng = QueryEngine(idx)
    for order in ("asc", "desc"):
        full = eng.search_sorted("the", k=60, order=order)
        pages = []
        cursor = None
        while True:
            page = eng.search_sorted("the", k=7, order=order,
                                     search_after=cursor)
            if page.num_rows == 0:
                break
            pages.append(page)
            cursor = (
                page["ts"][page.num_rows - 1].as_py(),
                page["docid"][page.num_rows - 1].as_py(),
            )
            if sum(p.num_rows for p in pages) >= 60:
                break
        paged = pa.concat_tables(pages).slice(0, full.num_rows)
        assert paged["docid"].to_pylist() == full["docid"].to_pylist()
        assert paged["ts"].to_pylist() == full["ts"].to_pylist()


def test_sorted_with_filters(ts_index):
    idx, table = ts_index
    eng = QueryEngine(idx)
    exp = _client_side(table, ["the"], "desc", role="user")
    got = eng.search_sorted("the", k=len(exp) + 5, order="desc",
                            filters={"role": "user"})
    assert got.num_rows == len(exp)
    assert got["conv_id"].to_pylist() == [c for _, c, _ in exp]


def test_sorted_actor_parity(ts_index, ray_session):
    idx, _ = ts_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        a = actors.search_sorted("the call", k=13, order="desc")
        b = local.search_sorted("the call", k=13, order="desc")
        assert a.equals(b)
    finally:
        actors.close()


def test_sorted_bad_args(ts_index):
    idx, _ = ts_index
    eng = QueryEngine(idx)
    with pytest.raises(Exception):
        eng.search_sorted("the", order="sideways")
    with pytest.raises(KeyError):
        eng.search_sorted("the", sort="nope")


# ---------------------------------------------------------------------------
# function_score gauss date decay (search_decay)
# ---------------------------------------------------------------------------

def _decay_bruteforce(table, oracle, query, origin_us, scale_us, base, k):
    """All matching docs BM25-scored by the oracle, multiplied by the
    identical decay expression, re-ranked on the decayed score."""
    ts_of = {}
    for c, ti, ts in zip(
        table["conv_id"].to_pylist(), table["turn_idx"].to_pylist(),
        table["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
    ):
        ts_of[(c, int(ti))] = int(ts)
    full = oracle.search(query, k=10**9)
    rows = []
    for docid, s in full:
        ts = ts_of[oracle.keys_of(docid)]
        r = abs(np.int64(ts) - np.int64(origin_us)) / scale_us
        rows.append((docid, float(s * np.power(base, r * r))))
    rows.sort(key=lambda x: (-x[1], x[0]))
    return rows[:k]


def test_decay_vs_bruteforce(ts_index):
    from excelastic_ray.query.oracle import BM25Oracle

    idx, table = ts_index
    eng = QueryEngine(idx)
    oracle = BM25Oracle(table, CFG)
    origin = "2026-01-05 00:00:00"
    scale_us = 2.0 * 86_400_000_000
    for q in ("the call", "run ok to", "the"):
        got = eng.search_decay(q, k=10, origin=origin, scale=int(scale_us),
                               decay=0.5)
        origin_us = int(np.datetime64(origin, "us").astype(np.int64))
        want = _decay_bruteforce(table, oracle, q, origin_us, scale_us,
                                 0.5, 10)
        assert got["docid"].to_pylist() == [d for d, _ in want]
        # identical float ops end-to-end -> exact equality
        assert got["score"].to_pylist() == [s for _, s in want]
    # decay actually reorders vs relevance ranking for a hot term
    plain = eng.search("the", k=10)
    dec = eng.search_decay("the", k=10, origin=origin, scale=int(scale_us))
    assert plain["docid"].to_pylist() != dec["docid"].to_pylist()


def test_decay_actor_parity_and_args(ts_index, ray_session):
    idx, _ = ts_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        a = actors.search_decay("the call", k=9, origin="2026-01-03",
                                scale="36h")
        b = local.search_decay("the call", k=9, origin="2026-01-03",
                               scale="36h")
        assert a.equals(b)
    finally:
        actors.close()
    with pytest.raises(ValueError, match="origin"):
        local.search_decay("the", k=5)
    with pytest.raises(ValueError, match="span"):
        local.search_decay("the", k=5, origin="2026-01-03", scale="2fort")
    # absent term -> empty result, stable schema
    empty = local.search_decay("zzzzmissing", k=5, origin="2026-01-03")
    assert empty.num_rows == 0


def test_relevance_search_after_pages_equal_slices(ts_index):
    """Score-sort search_after: chaining (score, docid) cursors walks
    the ENTIRE ranking in k-sized pages identical to the full ranking's
    slices (stateless; O(k) per shard per page)."""
    idx, _ = ts_index
    eng = QueryEngine(idx)
    full = eng.search("the call run w00004", k=100000)
    ranking = list(zip(full["docid"].to_pylist(),
                       full["score"].to_pylist()))
    assert len(ranking) > 25

    paged, cursor = [], None
    while True:
        page = eng.search("the call run w00004", k=7, search_after=cursor)
        if page.num_rows == 0:
            break
        rows = list(zip(page["docid"].to_pylist(),
                        page["score"].to_pylist()))
        paged.extend(rows)
        cursor = (rows[-1][1], rows[-1][0])
        assert page["rank"].to_pylist() == list(range(1, len(rows) + 1))
    assert paged == ranking

    # equal-score runs must not be skipped or duplicated across a page
    # boundary (the docid tiebreak half of the cursor)
    scores = [s for _, s in ranking]
    assert len(set(scores)) < len(scores), "fixture must contain ties"


def test_search_after_matches_offset(ts_index):
    idx, _ = ts_index
    eng = QueryEngine(idx)
    p1 = eng.search("the call", k=10)
    cursor = (p1["score"][-1].as_py(), p1["docid"][-1].as_py())
    via_cursor = eng.search("the call", k=10, search_after=cursor)
    via_offset = eng.search("the call", k=10, offset=10)
    assert via_cursor["docid"].to_pylist() == via_offset["docid"].to_pylist()
    assert via_cursor["score"].to_pylist() == via_offset["score"].to_pylist()
    with pytest.raises(ValueError, match="exclusive"):
        eng.search("the", k=5, offset=5, search_after=cursor)


def test_search_after_deep_paging_bounded_work(tmp_path_factory,
                                               ray_session):
    """The ES deep-paging trap, pinned: paging tens of thousands of
    rows deep via search_after keeps EVERY shard's per-page return at
    <= k rows (offset paging would ship offset+k), and the
    concatenated pages equal one global sort bit-for-bit."""
    import ray.data as rd

    from excelastic_ray.config import IndexConfig
    from excelastic_ray.corpus import generate_transcripts
    from excelastic_ray.index.build import build_index
    from excelastic_ray.query.engine import QueryEngine, ShardSearcher

    table = generate_transcripts(n_convs=2000, seed=31)
    cfg = IndexConfig(turn_bits=8, convs_per_chunk_bits=4, num_shards=4)
    idx = str(tmp_path_factory.mktemp("deeppage") / "idx")
    build_index(rd.from_arrow(table), idx, cfg, clear=True)
    eng = QueryEngine(idx)

    # a term matching (nearly) every turn so the walk is genuinely deep
    total = eng.search_sorted("the", k=10**6, order="asc")
    depth = total.num_rows
    assert depth > 5_000

    per_page_sizes: list[int] = []
    orig = ShardSearcher.sorted_matches

    def spy(self, *a, **kw):
        out = orig(self, *a, **kw)
        per_page_sizes.append(len(out[0]))
        return out

    ShardSearcher.sorted_matches = spy
    try:
        k = 1000
        pages = []
        cursor = None
        while True:
            page = eng.search_sorted("the", k=k, order="asc",
                                     search_after=cursor)
            if page.num_rows == 0:
                break
            pages.append(page)
            cursor = (page["ts"][-1].as_py(),
                      page["docid"][-1].as_py())
        import pyarrow as pa

        walked = pa.concat_tables(pages)
        assert walked.num_rows == depth
        # bit-identical to slicing the one-shot global ordering
        for col in ("docid", "ts"):
            assert walked[col].to_pylist() == total[col].to_pylist()
        # the bounded-work invariant: no shard ever returned more than
        # k rows for any page, however deep the cursor
        assert per_page_sizes and max(per_page_sizes) <= k
    finally:
        ShardSearcher.sorted_matches = orig
