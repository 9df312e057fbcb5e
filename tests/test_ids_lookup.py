"""ES ids query + terms-lookup query: brute-force match-set equality,
constant-score semantics, silent-skip of unknown ids, actor==local."""

import numpy as np


def test_ids_query_brute_force(ray_session, tiny_index, tiny_table):
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    keys = sorted(zip(tiny_table["conv_id"].to_pylist(),
                      tiny_table["turn_idx"].to_pylist()))
    present = [keys[0], keys[7], keys[-1]]
    absent = [("conv_zzz_none", 0), (keys[0][0], 63)]  # unknown conv, turn
    probe = present + absent
    got = eng.search_ids(probe, k=100)
    got_keys = list(zip(got["conv_id"].to_pylist(),
                        got["turn_idx"].to_pylist()))
    assert got_keys == sorted(present)  # docid ASC == key order
    assert got["score"].to_pylist() == [1.0] * len(present)
    # string form of _id round-trips
    via_str = eng.search_ids(
        [f"{c}#{t}" for c, t in probe], k=100
    )
    assert via_str.equals(got)
    # k truncates
    assert eng.search_ids(probe, k=2).num_rows == 2
    # all-absent → empty
    assert eng.search_ids(absent, k=10).num_rows == 0
    actor_eng = QueryEngine(d, use_actors=True)
    assert actor_eng.search_ids(probe, k=100).equals(got)


def test_terms_lookup_brute_force(ray_session, tiny_index, tiny_table):
    from excelastic_ray.analysis import tokenize
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    conv = tiny_table["conv_id"][0].as_py()
    turn = int(tiny_table["turn_idx"][0].as_py())
    docs = {
        (c, i): set(tokenize(txt))
        for c, i, txt in zip(
            tiny_table["conv_id"].to_pylist(),
            tiny_table["turn_idx"].to_pylist(),
            tiny_table["text"].to_pylist(),
        )
    }
    lookup_terms = docs[(conv, turn)]
    want = sorted(kk for kk, toks in docs.items() if toks & lookup_terms)
    got = eng.search_terms_lookup(conv, turn, k=10**6)
    got_keys = list(zip(got["conv_id"].to_pylist(),
                        got["turn_idx"].to_pylist()))
    assert got_keys == want  # docid ASC == key order, all matches
    assert set(got["score"].to_pylist()) == {1.0}
    # k caps the union without reordering
    k5 = eng.search_terms_lookup(conv, turn, k=5)
    assert list(zip(k5["conv_id"].to_pylist(),
                    k5["turn_idx"].to_pylist())) == want[:5]
    actor_eng = QueryEngine(d, use_actors=True)
    assert actor_eng.search_terms_lookup(conv, turn, k=10**6).equals(got)


def test_any_terms_docs_kcap_per_shard(ray_session, tiny_index):
    """The per-shard union is k-capped BEFORE the driver merge (the
    distributed-top-k contract: k docs per shard, never the corpus)."""
    from excelastic_ray.query.engine import QueryEngine

    d, _ = tiny_index
    eng = QueryEngine(d)
    r = eng.reader
    s = r.searcher(0)
    hot = None
    # find a term matching >3 docs on shard 0
    for t in ("the", "a", "to", "of", "and"):
        ids, _ = (np.zeros(0),) * 2
        slot = s.lookup(t)
        if slot >= 0 and len(s.decoded(slot)[0]) > 3:
            hot = t
            break
    assert hot is not None
    docids, scores = s.any_terms_docs([hot], k=3)
    assert len(docids) == 3
    assert np.all(np.diff(docids) > 0)
    assert np.all(scores == 1.0)
