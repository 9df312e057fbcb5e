"""ES ``search_as_you_type``: index-time word-shingle streams
(._2gram/._3gram subfields) + the multi_match bool_prefix query shape
— root term clauses, last-token prefix expansion, shingle clauses with
the shingle stream's OWN BM25 stats, most_fields sum."""

from __future__ import annotations

import numpy as np
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.config import IndexConfig
from excelastic_ray.corpus import generate_transcripts
from excelastic_ray.index.build import build_index
from excelastic_ray.query.bm25 import contribution, idf
from excelastic_ray.query.engine import QueryEngine

CFG = IndexConfig(turn_bits=8, convs_per_chunk_bits=2, num_shards=4,
                  index_shingles=3)


@pytest.fixture(scope="module")
def say_index(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = generate_transcripts(n_convs=40, seed=6)
    idx = str(tmp_path_factory.mktemp("say") / "idx")
    build_index(rd.from_arrow(tbl), idx, CFG, clear=True)
    return idx, tbl


def _brute_say(tbl, query, k, max_expansions=50, grams=(2, 3)):
    """Independent scorer: per-stream BM25 over Python-tokenized docs."""
    docs = {}
    for c, t, x in zip(tbl["conv_id"].to_pylist(),
                       tbl["turn_idx"].to_pylist(),
                       tbl["text"].to_pylist()):
        docs[(c, t)] = tokenize(x)
    n = len(docs)

    def stream_scores(tok_of_doc, clause_terms):
        dls = {d: len(v) for d, v in tok_of_doc.items()}
        avgdl = sum(dls.values()) / n
        out: dict = {}
        for term in sorted(set(clause_terms)):
            df = sum(1 for v in tok_of_doc.values() if term in v)
            if not df:
                continue
            t_idf = idf(n, df)
            for d, v in tok_of_doc.items():
                tf = v.count(term)
                if tf:
                    out[d] = out.get(d, 0.0) + float(contribution(
                        t_idf, np.float64(tf), np.float64(dls[d]),
                        avgdl, CFG.k1, CFG.b))
        return out

    toks = tokenize(query)
    vocab = sorted({t for v in docs.values() for t in v})
    exps = [t for t in vocab if t.startswith(toks[-1])][:max_expansions]
    scores = stream_scores(docs, toks[:-1] + exps)
    for g in grams:
        sh_docs = {
            d: [" ".join(v[i:i + g]) for i in range(len(v) - g + 1)]
            for d, v in docs.items()
        }
        q_sh = [" ".join(toks[i:i + g])
                for i in range(len(toks) - g + 1)]
        for d, s in stream_scores(sh_docs, q_sh).items():
            scores[d] = scores.get(d, 0.0) + s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return top


def test_say_matches_bruteforce(say_index):
    idx, tbl = say_index
    eng = QueryEngine(idx)
    for q in ("the call ru", "w00042 w001", "tool the cal"):
        got = eng.search_say(q, k=10)
        exp = _brute_say(tbl, q, 10)
        got_keys = list(zip(got["conv_id"].to_pylist(),
                            got["turn_idx"].to_pylist()))
        assert got_keys == [d for d, _ in exp]
        np.testing.assert_allclose(
            got["score"].to_numpy(), [s for _, s in exp],
            rtol=0, atol=1e-12,
        )


def test_say_beats_scattered_terms(say_index):
    # a doc containing the exact word pair must outrank a doc with the
    # same words scattered (the whole point of the shingle subfields):
    # the pair doc earns the _2gram clause on top of the term clauses
    idx, tbl = say_index
    eng = QueryEngine(idx)
    got = eng.search_say("the call", k=50)
    texts = {
        (c, t): x
        for c, t, x in zip(tbl["conv_id"].to_pylist(),
                           tbl["turn_idx"].to_pylist(),
                           tbl["text"].to_pylist())
    }
    keys = list(zip(got["conv_id"].to_pylist(),
                    got["turn_idx"].to_pylist()))
    has_pair = ["the call" in " ".join(tokenize(texts[k]))
                for k in keys]
    assert has_pair[0], "top hit must contain the exact pair"


def test_say_requires_shingled_index(tiny_index):
    idx, _ = tiny_index
    eng = QueryEngine(idx)
    with pytest.raises(ValueError, match="index_shingles"):
        eng.search_say("the call")


def test_say_validation_and_config():
    with pytest.raises(ValueError, match="index_shingles"):
        IndexConfig(index_shingles=1)
    with pytest.raises(ValueError, match="index_shingles"):
        IndexConfig(index_shingles=4)
    assert IndexConfig(index_shingles=3).shingle_streams == \
        ("_2gram", "_3gram")
    assert IndexConfig().shingle_streams == ()
    # config round-trips; pre-shingle manifests default to off
    d = CFG.to_dict()
    assert IndexConfig.from_dict(d) == CFG
    d.pop("index_shingles")
    assert IndexConfig.from_dict(d).index_shingles == 0


def test_say_bad_query(say_index):
    idx, _ = say_index
    eng = QueryEngine(idx)
    with pytest.raises(ValueError, match="token"):
        eng.search_say("...")


def test_say_actor_parity(say_index, ray_session):
    idx, _ = say_index
    local = QueryEngine(idx)
    actors = QueryEngine(idx, use_actors=True)
    try:
        a = actors.search_say("the call ru", k=10)
        b = local.search_say("the call ru", k=10)
        assert a.equals(b)
    finally:
        actors.close()


def test_say_shingle_stats_in_manifest(say_index):
    idx, _ = say_index
    eng = QueryEngine(idx)
    fa = eng.reader.manifest["field_avgdl"]
    assert "_2gram" in fa and "_3gram" in fa
    assert 0 < fa["_3gram"] < fa["_2gram"]
