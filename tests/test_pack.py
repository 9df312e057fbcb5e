"""Sequence packing (concat-and-chunk) invariants: the manifest is an
exact exclusive prefix-sum in doc_id order, parallelism/bucket-count
invariant, and agrees with a brute-force single-threaded oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from excelastic_ray.analysis import tokenize
from excelastic_ray.pipelines.pack import pack_sequences, pack_stats

L = 64


def _corpus(n=137, seed=3):
    rng = np.random.default_rng(seed)
    ids = rng.choice(np.arange(10_000), size=n, replace=False)  # sparse ids
    texts = [
        " ".join(
            f"w{rng.integers(0, 50)}" for _ in range(rng.integers(0, 40))
        )
        for _ in range(n)
    ]
    return pa.table({"doc_id": pa.array(np.sort(ids), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def _oracle(table: pa.Table, seq_len: int, eod: int = 1) -> pd.DataFrame:
    df = table.to_pandas().sort_values("doc_id").reset_index(drop=True)
    nt = np.array([len(tokenize(t)) + eod for t in df["text"]], dtype=np.int64)
    start = np.concatenate([[0], np.cumsum(nt)[:-1]])
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": nt,
            "tok_start": start,
            "seq_first": start // seq_len,
            "seq_off": start % seq_len,
            "seq_last": (start + nt - 1) // seq_len,
        }
    )


def _run(table, **kw) -> pd.DataFrame:
    import ray.data as rd

    out = pack_sequences(rd.from_arrow(table), seq_len=L, **kw)
    return (
        out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def test_manifest_matches_bruteforce(ray_session):
    t = _corpus()
    got = _run(t)
    pd.testing.assert_frame_equal(got, _oracle(t, L), check_dtype=False)


@pytest.mark.parametrize("k", [1, 7, 64, 1000])
def test_bucket_count_invariant(ray_session, k):
    t = _corpus(seed=5)
    got = _run(t, n_buckets=k)
    pd.testing.assert_frame_equal(got, _oracle(t, L), check_dtype=False)


def test_block_split_invariant(ray_session):
    import ray.data as rd

    t = _corpus(seed=7)
    a = _run(t)
    many = pack_sequences(
        rd.from_arrow(t).repartition(13), seq_len=L
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, many, check_dtype=False)


def test_eod_zero_and_empty_text(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["a b c", "", None], type=pa.string()),
        }
    )
    got = _run(t, eod=0)
    assert got["n_tokens"].tolist() == [3, 0, 0]
    assert got["tok_start"].tolist() == [0, 3, 3]


def test_stats_consistency(ray_session):
    import ray.data as rd

    t = _corpus(seed=9)
    man = _oracle(t, L)
    s = pack_stats(rd.from_arrow(t), seq_len=L).to_pandas().iloc[0]
    assert s["docs"] == len(man)
    assert s["tokens"] == man["n_tokens"].sum()
    assert s["n_seqs"] == -(-int(man["n_tokens"].sum()) // L)
    assert s["straddlers"] == int(
        (man["seq_last"] > man["seq_first"]).sum()
    )


def test_chunk_documents_windows(ray_session):
    """Window rule: every token covered, consecutive chunks overlap by
    exactly `overlap` (except the short final window), offsets
    deterministic; empty docs emit nothing; param validation."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from excelastic_ray.analysis import TOKEN_RE
    from excelastic_ray.pipelines.pack import chunk_documents

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{int(rng.integers(0, 50))}"
                 for _ in range(int(rng.integers(0, 40))))
        for _ in range(60)
    ] + ["", "one", " ".join(["x"] * 7)]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    chunk, ov = 6, 2
    stride = chunk - ov
    out = chunk_documents(rd.from_arrow(t), chunk, ov).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    for did, text in enumerate(texts):
        toks = TOKEN_RE.findall(text.lower())
        rows = out[out["doc_id"] == did]
        cnt = len(toks)
        if cnt == 0:
            assert len(rows) == 0
            continue
        want_n = 1 if cnt <= chunk else -(-(cnt - chunk) // stride) + 1
        assert len(rows) == want_n
        assert list(rows["chunk_idx"]) == list(range(want_n))
        covered = set()
        for _, r in rows.iterrows():
            s, n = int(r["start_tok"]), int(r["n_tokens"])
            assert s == int(r["chunk_idx"]) * stride
            assert r["chunk_text"] == " ".join(toks[s:s + n])
            assert n > 0
            covered.update(range(s, s + n))
        assert covered == set(range(cnt))  # full coverage
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(rd.from_arrow(t), 4, 4)
