"""Deduplication operators: exact, MinHash+LSH (Broder, SEQUENCES 1997;
banding per Leskovec/Rajaraman/Ullman "Mining of Massive Datasets"
ch. 3), SimHash (Charikar, STOC 2002), n-gram Jaccard, embedding-cosine
near-dup.

Scale shapes (10^12-doc reasoning, exercised at test scale):

- exact:    hash column in map_batches → groupby(hash) → min-id per
            group. The shuffle moves (hash, id) pairs only.
- MinHash:  shingle→signature per batch (vectorized multiply-shift
            hashing) → explode to (band, band_hash, id) rows → groupby
            bands → candidate pairs → exact-Jaccard verify → connected
            components (union-find over the verified pair set, which is
            output-sized, not corpus-sized).
- SimHash:  64-bit signature per doc; Hamming-≤r candidate recall via
            the pigeonhole band trick (r+1 segments; any pair within
            distance r agrees on ≥1 segment).
- embedding: exact pair search is a broadcast-matrix matmul per batch
            (the small side is ray.put once); the LSH-bucketed variant
            (random hyperplanes) is the scale path when the matrix no
            longer broadcasts.

Verification joins fetch shingle sets via a broadcast dict at test
scale; at 100 TB that broadcast becomes a two-sided hash-partitioned
join keyed by doc id (documented here, same pair semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from excelastic_ray.pipelines.textstats import _tokenize_batch, trunc6

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
_C3 = np.uint64(0x165667B19E3779F9)
_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a_bytes(data: bytes) -> np.uint64:
    h = _FNV_OFFSET
    with np.errstate(over="ignore"):
        for byte in data:
            h = (h ^ np.uint64(byte)) * _FNV_PRIME
    return h


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    """FNV-1a of the raw text bytes (vector loop is C-level per row)."""
    vals = np.empty(batch.num_rows, dtype=np.int64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        vals[i] = np.int64(np.uint64(fnv1a_bytes((t or "").encode())))
    return batch.append_column(out_col, pa.array(vals))


N_BUCKETS = 64  # coarse shuffle buckets: a Ray groupby over millions of
# tiny key groups pays per-group overhead; bucket by hash(key) % 64 and
# run the fine-grained grouping vectorized in pandas inside each bucket.


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id representative per identical text → Dataset of
    (id, content_hash) survivors. Reference note: the reference
    *appends* duplicates on re-import (ElasticWriter.java:186-194 only
    branches on clear) — dedup is the training-data extension."""

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        t = add_content_hash(b, text_col).select([id_col, "content_hash"])
        bucket = t["content_hash"].to_numpy().view(np.uint64) % N_BUCKETS
        return t.append_column("bucket", pa.array(bucket.astype(np.int64)))

    hashed = ds.map_batches(hash_and_bucket, batch_format="pyarrow",
                            batch_size=8192)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        return g.drop_duplicates("content_hash")[[id_col, "content_hash"]]

    return hashed.groupby("bucket").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# Shingles + MinHash
# ---------------------------------------------------------------------------


def _token_hashes(codes, uniques, row_idx):
    """Stable 64-bit hash per token occurrence (hash uniques once)."""
    uh = np.empty(len(uniques), dtype=np.uint64)
    for i, u in enumerate(uniques):
        uh[i] = fnv1a_bytes(str(u).encode())
    return uh[codes] if len(codes) else np.zeros(0, dtype=np.uint64)


def shingle_sets(texts: list, k: int = 3) -> list[np.ndarray]:
    """Per-doc sorted unique hashes of token k-grams (vectorized mix)."""
    codes, uniques, row_idx = _tokenize_batch(texts)
    th = _token_hashes(codes, uniques, row_idx)
    out = []
    bounds = np.searchsorted(row_idx, np.arange(len(texts) + 1))
    with np.errstate(over="ignore"):
        for i in range(len(texts)):
            h = th[bounds[i] : bounds[i + 1]]
            if len(h) < k:
                out.append(np.zeros(0, dtype=np.uint64))
                continue
            s = h[: len(h) - k + 1] * _C1
            for j in range(1, k):
                s = s ^ (h[j : len(h) - k + 1 + j] * (_C2 if j == 1 else _C3))
            out.append(np.unique(s))
    return out


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 7,
) -> pa.Table:
    """→ (id, sig: fixed-size list<uint64>) via multiply-shift hashing.
    Docs with < k tokens get an all-max sentinel signature."""
    a, b = _minhash_params(num_perm, seed)
    sets = shingle_sets(batch[text_col].to_pylist(), shingle_k)
    sigs = np.full((len(sets), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, sh in enumerate(sets):
            if len(sh):
                # (num_perm × n_shingles) multiply-shift, min per perm
                m = (a[:, None] * sh[None, :] + b[:, None]) >> np.uint64(32)
                sigs[i] = m.min(axis=1)
    return pa.table(
        {
            id_col: batch[id_col],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.int64)), num_perm
            ),
        }
    )


def _band_rows(batch: pa.Table, id_col: str, bands: int, rows_per_band: int) -> pa.Table:
    ids = batch[id_col].to_numpy()
    sig = np.asarray(batch["sig"].to_numpy(zero_copy_only=False).tolist(),
                     dtype=np.int64).view(np.uint64)
    n = len(ids)
    band_ids = np.repeat(np.arange(bands, dtype=np.int64), n)
    with np.errstate(over="ignore"):
        bh = np.empty((bands, n), dtype=np.uint64)
        for bi in range(bands):
            acc = np.full(n, _FNV_OFFSET, dtype=np.uint64)
            for r in range(rows_per_band):
                acc = (acc ^ sig[:, bi * rows_per_band + r]) * _FNV_PRIME
            bh[bi] = acc
    return pa.table(
        {
            "band": pa.array(band_ids),
            "bh": pa.array(bh.reshape(-1).astype(np.int64)),
            id_col: pa.array(np.tile(ids, bands)),
        }
    )


def _pairs_within(df: pd.DataFrame, key_cols: list[str], id_col: str,
                  extra_col: str | None = None,
                  max_group: int = 512) -> pd.DataFrame:
    """All (a < b) pairs within each fine-grained key group of ``df``
    (vectorized pandas path; groups larger than max_group are dropped —
    degenerate buckets, logged by size in the caller's counters)."""
    out_a, out_b, out_x = [], [], []
    for _, g in df.groupby(key_cols, sort=False):
        if len(g) < 2 or len(g) > max_group:
            continue
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        ai, bi = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ai])
        out_b.append(ids[bi])
        if extra_col is not None:
            x = g[extra_col].to_numpy()
            out_x.append((x[ai], x[bi]))
    if not out_a:
        cols = {"a": np.zeros(0, np.int64), "b": np.zeros(0, np.int64)}
        if extra_col is not None:
            cols[f"{extra_col}_a"] = np.zeros(0, np.int64)
            cols[f"{extra_col}_b"] = np.zeros(0, np.int64)
        return pd.DataFrame(cols)
    cols = {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
    if extra_col is not None:
        cols[f"{extra_col}_a"] = np.concatenate([x[0] for x in out_x])
        cols[f"{extra_col}_b"] = np.concatenate([x[1] for x in out_x])
    return pd.DataFrame(cols)


def _dedup_pairs(pairs_ds):
    """Distinct (a, b) rows via coarse pair-hash buckets + pandas."""

    def bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (
                b["a"].to_numpy().view(np.uint64) * _C1
                ^ b["b"].to_numpy().view(np.uint64) * _C2
            ) % N_BUCKETS
        return b.append_column("pb", pa.array(h.astype(np.int64)))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    return (
        pairs_ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("pb")
        .map_groups(uniq, batch_format="pandas")
    )


def minhash_candidates(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
):
    """MinHash LSH candidate pairs (a < b), deduplicated across bands."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(
        lambda t: minhash_signatures_batch(t, id_col, text_col, num_perm, shingle_k, seed),
        batch_format="pyarrow",
        batch_size=4096,
    )
    band_rows = sigs.map_batches(
        lambda t: _band_rows(t, id_col, bands, rows_per_band),
        batch_format="pyarrow",
        batch_size=4096,
    )
    # one Ray group per band (16 coarse groups); the fine (band_hash)
    # grouping runs vectorized in pandas inside each
    pairs = band_rows.groupby("band").map_groups(
        lambda g: _pairs_within(g, ["bh"], id_col), batch_format="pandas"
    )
    return _dedup_pairs(pairs)


def verify_jaccard(
    pairs_ds,
    shingle_ref,
    threshold: float = 0.5,
):
    """Exact-Jaccard check of candidate pairs against a broadcast
    {doc_id: sorted shingle array} dict (ray.put once; the two-sided
    partitioned join is the >-broadcast-scale variant)."""

    class Verify:
        def __init__(self, ref):
            import ray

            self.sets = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = []
            for a, b in zip(batch["a"], batch["b"]):
                sa, sb = self.sets.get(int(a)), self.sets.get(int(b))
                if sa is None or sb is None or not len(sa) or not len(sb):
                    continue
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    out.append((int(a), int(b), float(trunc6(j))))
            return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    return pairs_ds.map_batches(
        Verify, fn_constructor_args=(shingle_ref,), batch_format="pandas",
        batch_size=4096, concurrency=2, num_cpus=1,
    )


def collect_shingle_sets(ds, id_col: str = "doc_id", text_col: str = "text",
                         shingle_k: int = 3) -> dict[int, np.ndarray]:
    """Driver-side {id: shingle set} (test scale / broadcast side)."""
    out: dict[int, np.ndarray] = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        ids = batch[id_col].to_pylist()
        for i, sh in zip(ids, shingle_sets(batch[text_col].to_pylist(), shingle_k)):
            out[int(i)] = sh
    return out


def connected_components(pairs: pd.DataFrame, all_ids=None) -> pd.DataFrame:
    """Union-find over verified duplicate pairs → (doc_id, rep) with rep
    = min id of the component. Pair set is output-sized, driver-safe."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    ids = sorted(parent) if all_ids is None else sorted(all_ids)
    return pd.DataFrame({"doc_id": ids, "rep": [find(i) for i in ids]})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """64-bit SimHash over the token multiset (tf-weighted bit votes;
    tie at 0 → bit clear)."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    codes, uniques, row_idx = _tokenize_batch(texts)
    th = _token_hashes(codes, uniques, row_idx)
    votes = np.zeros((n, 64), dtype=np.int64)
    if len(th):
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        ) * 2 - 1
        np.add.at(votes, row_idx, bits)
    packed = (
        (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
    ).sum(axis=1, dtype=np.uint64)
    return pa.table(
        {id_col: batch[id_col], "simhash": pa.array(packed.astype(np.int64))}
    )


def simhash_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """Near-dup pairs by SimHash Hamming distance ≤ r via the pigeonhole
    band trick (r+1 = 4 segments of 16 bits → exact recall for r ≤ 3)."""
    sigs = ds.map_batches(
        lambda t: simhash_batch(t, id_col, text_col),
        batch_format="pyarrow", batch_size=4096,
    )

    def seg_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        h = batch["simhash"].to_numpy().view(np.uint64)
        segs, seg_vals, hh, ii = [], [], [], []
        for s in range(4):
            segs.append(np.full(len(ids), s, dtype=np.int64))
            seg_vals.append(((h >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64))
            hh.append(h.astype(np.int64))
            ii.append(ids)
        return pa.table(
            {
                "seg": pa.array(np.concatenate(segs)),
                "segval": pa.array(np.concatenate(seg_vals)),
                id_col: pa.array(np.concatenate(ii)),
                "simhash": pa.array(np.concatenate(hh)),
            }
        )

    def seg_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cand = _pairs_within(g, ["segval"], id_col, extra_col="simhash")
        if not len(cand):
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        xor = cand["simhash_a"].to_numpy().view(np.uint64) ^ cand[
            "simhash_b"
        ].to_numpy().view(np.uint64)
        ham = np.asarray([bin(int(x)).count("1") for x in xor], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "a": cand["a"].to_numpy()[keep],
                "b": cand["b"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    # one Ray group per 16-bit segment (4 coarse groups)
    pairs = (
        sigs.map_batches(seg_rows, batch_format="pyarrow", batch_size=4096)
        .groupby("seg")
        .map_groups(seg_pairs, batch_format="pandas")
    )

    def bucket(b: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (
                b["a"].to_numpy().view(np.uint64) * _C1
                ^ b["b"].to_numpy().view(np.uint64) * _C2
            ) % N_BUCKETS
        return b.append_column("pb", pa.array(h.astype(np.int64)))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b", "hamming"]]

    return (
        pairs.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("pb")
        .map_groups(uniq, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pair metric; SQL-oracle-checkable)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.2,
):
    """Exact all-pairs token-k-gram Jaccard ≥ threshold.

    The full shingle-set dict is broadcast (ray.put) and each batch
    compares its docs against all ids > its own — an O(n²/P) blocked
    pairwise sweep. This is the exact baseline the MinHash-LSH path
    approximates; at corpus scale you run the LSH candidates + verify
    instead (same output schema).
    """
    import ray

    sets = collect_shingle_sets(ds, id_col, text_col, shingle_k)
    ref = ray.put(sets)

    class PairSweep:
        def __init__(self, ref):
            self.sets = ray.get(ref)
            self.all_ids = np.asarray(sorted(self.sets), dtype=np.int64)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            out = []
            for a in batch[id_col].to_pylist():
                sa = self.sets[int(a)]
                if not len(sa):
                    continue
                for b_id in self.all_ids[self.all_ids > a]:
                    sb = self.sets[int(b_id)]
                    if not len(sb):
                        continue
                    inter = len(np.intersect1d(sa, sb, assume_unique=True))
                    if not inter:
                        continue
                    j = inter / (len(sa) + len(sb) - inter)
                    if j >= threshold:
                        out.append((int(a), int(b_id), float(trunc6(j))))
            return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    return ds.select_columns([id_col]).map_batches(
        PairSweep, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=256, concurrency=2, num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
):
    """Exact cosine-similar pairs (a < b, cos ≥ threshold): broadcast
    the normalized matrix once, per-batch float64 matmul against it."""
    import ray

    ids_all, mat = collect_embedding_matrix(ds, id_col, vec_col)
    ref = ray.put((ids_all, mat))

    class CosSweep:
        def __init__(self, ref):
            self.ids, self.mat = ray.get(ref)
            self.pos = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            rows = [self.pos[int(v)] for v in batch[id_col].to_pylist()]
            sims = self.mat[rows] @ self.mat.T  # (batch × all)
            out_a, out_b, out_s = [], [], []
            for r, a in zip(sims, (int(self.ids[i]) for i in rows)):
                cand = np.flatnonzero(r >= threshold)
                for c in cand:
                    b = int(self.ids[c])
                    if b > a:
                        out_a.append(a)
                        out_b.append(b)
                        out_s.append(float(trunc6(r[c])))
            return pd.DataFrame({"a": out_a, "b": out_b, "cos": out_s})

    return ds.select_columns([id_col]).map_batches(
        CosSweep, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=512, concurrency=2, num_cpus=1,
    )


def collect_embedding_matrix(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Driver-side (ids, L2-normalized float64 matrix) — the broadcast
    small side. Zero vectors stay zero (cos = 0 with everything)."""
    ids, vecs = [], []
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids.append(batch[id_col].to_numpy())
        vecs.append(
            np.asarray(batch[vec_col].to_numpy(zero_copy_only=False).tolist(),
                       dtype=np.float64)
        )
    ids = np.concatenate(ids)
    mat = np.concatenate(vecs)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms
