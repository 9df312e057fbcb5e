import numpy as np
import pytest

from excelastic_ray.codecs import (
    PostingList,
    blockpack_decode,
    blockpack_encode,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def _rand_postings(rng, n, max_doc=1 << 40):
    docids = np.sort(rng.choice(max_doc, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 500, size=n).astype(np.int64)
    dls = rng.integers(1, 10_000, size=n).astype(np.int64)
    return docids, tfs, dls


@pytest.mark.parametrize("vals", [
    [0], [1], [127], [128], [300], [2**32], [2**56 + 7],
    [0, 1, 127, 128, 16383, 16384, 2**31, 2**63 - 1],
])
def test_varint_roundtrip_exact(vals):
    buf, starts = varint_encode(np.array(vals, dtype=np.uint64))
    out = varint_decode(buf)
    assert out.tolist() == vals
    assert starts[0] == 0


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    for scale in (1, 2**7, 2**14, 2**28, 2**40, 2**62):
        a = rng.integers(0, scale, size=1000, dtype=np.uint64)
        buf, _ = varint_encode(a)
        assert (varint_decode(buf) == a).all()


def test_blockpack_roundtrip():
    rng = np.random.default_rng(11)
    for n in (1, 5, 128, 129, 1000):
        a = rng.integers(0, 2**33, size=n, dtype=np.uint64)
        buf, offs = blockpack_encode(a, 128)
        assert (blockpack_decode(buf, n, 128) == a).all()
        assert len(offs) == (n + 127) // 128


@pytest.mark.parametrize("codec", ["varint", "blockpack", "pfor"])
@pytest.mark.parametrize("n", [1, 127, 128, 129, 5000])
def test_postings_roundtrip(codec, n):
    rng = np.random.default_rng(n)
    docids, tfs, dls = _rand_postings(rng, n)
    postings, blockmax, n_blocks = encode_postings(docids, tfs, dls, codec=codec)
    d2, t2 = decode_postings(postings, codec=codec)
    assert (d2 == docids).all()
    assert (t2 == tfs).all()
    assert n_blocks == (n + 127) // 128


@pytest.mark.parametrize("codec", ["varint", "blockpack", "pfor"])
def test_posting_list_block_access(codec):
    rng = np.random.default_rng(3)
    n = 1000
    docids, tfs, dls = _rand_postings(rng, n)
    postings, blockmax, n_blocks = encode_postings(docids, tfs, dls, codec=codec)
    pl = PostingList(postings, blockmax, codec, 128)
    assert pl.n == n and pl.n_blocks == n_blocks
    got_d, got_t = [], []
    for i in range(pl.n_blocks):
        d, t = pl.decode_block(i)
        got_d.append(d); got_t.append(t)
        s, e = i * 128, min((i + 1) * 128, n)
        assert pl.bm[i]["last_id"] == docids[e - 1]
        assert pl.bm[i]["max_tf"] == tfs[s:e].max()
        assert pl.bm[i]["min_dl"] == dls[s:e].min()
    assert (np.concatenate(got_d) == docids).all()
    assert (np.concatenate(got_t) == tfs).all()


def test_encode_postings_rejects_empty():
    with pytest.raises(ValueError):
        encode_postings(np.array([], dtype=np.int64), np.array([]), np.array([]))


def test_pfor_roundtrip_with_exceptions():
    from excelastic_ray.codecs import pfor_decode, pfor_encode

    rng = np.random.default_rng(9)
    # mostly-small deltas with rare huge outliers -> exercises patching
    a = rng.integers(0, 30, size=1000, dtype=np.uint64)
    a[rng.choice(1000, 37, replace=False)] = rng.integers(
        1 << 30, 1 << 45, size=37, dtype=np.uint64
    )
    for bs in (32, 128, 256):
        buf, offs = pfor_encode(a, bs)
        assert (pfor_decode(buf, len(a), bs) == a).all()
    # exception-heavy beats naive wide packing on size for this shape
    wide = len(a) * 8
    assert len(buf) < wide


def test_pfor_block_size_cap():
    from excelastic_ray.config import IndexConfig

    with pytest.raises(ValueError):
        IndexConfig(codec="pfor", block_size=512)
