"""Similarity search over an embedding column (list<float>).

- :func:`cosine_topk` — exact brute-force top-k per query: the query
  matrix is broadcast once (ray.put), every batch does one float64
  matmul and emits only its per-batch top-k partials, and a final
  k-sized merge per query runs in a tiny groupby. At 100 TB this is
  the baseline scan: O(n·q·d) flops streamed with no shuffle of the
  embedding data itself.
- :func:`lsh_bucket_topk` — scale path A: random-hyperplane LSH
  buckets (signed projections → bucket id) built per batch; queries
  probe only their own bucket (plus optional neighbor probes).
  Approximate — recall depends on bucket bits/probes.
- :func:`ivf_topk` — scale path B: IVF (inverted-file) index.
  Deterministic k-means centroids (seeded init + fixed Lloyd
  iterations, each iteration = one map_batches partial-sum pass +
  driver combine), vectors assigned to their nearest centroid, queries
  scored only against the ``nprobe`` nearest cells. Approximate;
  recall grows with nprobe (nprobe == n_centroids → exact).
- :func:`pq_topk` — scale path D: product quantization. Per-subspace
  codebooks (same distributed Lloyd shape), ADC table-lookup scan over
  m-byte codes, exact float64 rerank of the survivors. The
  memory-traffic path: a stored codes column is m bytes per vector vs
  8·dim for raw floats.

Execution shape: every stage's only state is a broadcast ObjectRef, so
the stages run as plain Ray TASKS (one per block — full parallelism
with zero actor-pool startup); ``ray.get`` of a numpy payload inside a
task is a zero-copy plasma read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from excelastic_ray.pipelines.textstats import trunc6


def _as_matrix(col) -> np.ndarray:
    return np.asarray(col.to_numpy(zero_copy_only=False).tolist(), dtype=np.float64)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _final_topk_fn(k: int, id_col: str):
    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        cos = g["cos"].to_numpy()
        order = np.lexsort((ids, -cos))[:k]
        return pd.DataFrame(
            {
                "query_id": g["query_id"].to_numpy()[order],
                id_col: ids[order],
                "cos": trunc6(cos[order]),
            }
        )

    return final_topk


def cosine_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: tuple[str, set] | None = None,
    rank_trunc6: bool = False,
):
    """Exact cosine top-k per query → Dataset (query_id, vec_id, cos)
    with ties broken (cos DESC, vec_id ASC); cos truncated to 6
    decimals for oracle comparison.

    ``where=(col, allowed_values)`` is the ES 8 ``knn`` filter clause:
    candidates are restricted BEFORE scoring (pre-filter, so the
    result is the exact top-k of the filtered set — never fewer than k
    survivors because a post-filter dropped them).

    ``rank_trunc6=True`` truncates similarities to 6 decimals BEFORE
    ranking (partial cut, final cut, and tie-breaks all on the
    truncated value + id). Use when the RANKS feed further computation
    that must match a SQL twin exactly (hybrid RRF): engine and SQL
    compute raw cosine with different float summation orders, so
    ranking raw risks boundary flips on near-ties; ranking the
    truncated value is identical on both sides by construction."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    ref = ray.put((qids, q))

    def partial(batch: pa.Table) -> pd.DataFrame:
        b_qids, b_q = ray.get(ref)
        if where is not None:
            col, allowed = where
            keep = np.isin(
                batch[col].to_numpy(zero_copy_only=False),
                np.asarray(sorted(allowed)),
            )
            batch = batch.filter(pa.array(keep))
            if not batch.num_rows:
                return pd.DataFrame(
                    {"query_id": np.zeros(0, np.int64),
                     id_col: np.zeros(0, np.int64),
                     "cos": np.zeros(0, np.float64)}
                )
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        sims = mat @ b_q.T  # (batch × queries)
        if rank_trunc6:
            sims = trunc6(sims)
        out_q, out_v, out_s = [], [], []
        kk = min(k, len(ids))
        for j, qid in enumerate(b_qids):
            col = sims[:, j]
            # per-batch partial top-k with (cos DESC, id ASC) ties
            order = np.lexsort((ids, -col))[:kk]
            out_q.append(np.full(kk, qid, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(col[order])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_v),
                "cos": np.concatenate(out_s),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(
        _final_topk_fn(k, id_col), batch_format="pandas"
    )


def lsh_bucket_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 11,
):
    """Approximate cosine top-k: sign-of-projection LSH buckets.

    Vectors and queries hash to a ``n_planes``-bit bucket; each query
    only scores vectors in its bucket. Deterministic (seeded planes).
    Returns the same schema as :func:`cosine_topk`; recall < 1 by
    design — this is the 100 TB path where the full matmul is too
    expensive and the bucket groupby replaces the full scan.
    """
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    dim = q.shape[1]
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    qbucket = (q @ planes > 0) @ (1 << np.arange(n_planes))
    by_bucket: dict[int, list[int]] = {}
    for j, qb in enumerate(qbucket):
        by_bucket.setdefault(int(qb), []).append(j)
    ref = ray.put((qids, q, planes, by_bucket))

    def bucket_score(batch: pa.Table) -> pd.DataFrame:
        b_qids, b_q, b_planes, b_by_bucket = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        buckets = (mat @ b_planes > 0) @ (1 << np.arange(b_planes.shape[1]))
        frames = []
        for qb, qjs in b_by_bucket.items():
            mask = buckets == qb
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sims = mat[mask] @ b_q[qjs].T
            kk = min(k, len(sub_ids))
            for col, j in zip(sims.T, qjs):
                order = np.lexsort((sub_ids, -col))[:kk]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(kk, b_qids[j]),
                            id_col: sub_ids[order],
                            "cos": col[order],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame({"query_id": [], id_col: [], "cos": []})
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(bucket_score, batch_format="pyarrow",
                              batch_size=4096)
    return partials.groupby("query_id").map_groups(
        _final_topk_fn(k, id_col), batch_format="pandas"
    )


def kmeans_centroids(
    ds,
    n_centroids: int = 16,
    n_iter: int = 5,
    vec_col: str = "embedding",
    seed: int = 13,
) -> np.ndarray:
    """Deterministic distributed k-means over normalized vectors.

    Init: seeded gaussian directions (data-independent → deterministic
    regardless of partitioning). Each Lloyd iteration is one
    ``map_batches`` pass emitting per-batch (sum, count) partials per
    centroid and a driver-side combine — the partial+final pattern, so
    the shuffle moves n_centroids×dim floats per batch, never vectors.
    """
    import ray

    first = next(iter(ds.iter_batches(batch_size=1, batch_format="pyarrow")))
    dim = len(first[vec_col][0])
    rng = np.random.default_rng(seed)
    cents = _normalize(rng.standard_normal((n_centroids, dim)))

    for _ in range(n_iter):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pd.DataFrame:
            b_cents = ray.get(ref)
            mat = _normalize(_as_matrix(batch[vec_col]))
            assign = (mat @ b_cents.T).argmax(axis=1)
            kc, d = b_cents.shape
            sums = np.zeros((kc, d))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=kc)
            return pd.DataFrame(
                {
                    "cid": np.arange(kc, dtype=np.int64),
                    "n": counts,
                    "vsum": [sums[i].tobytes() for i in range(kc)],
                }
            )

        parts = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=4096
        ).to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for row in parts.itertuples(index=False):
            sums[int(row.cid)] += np.frombuffer(row.vsum, dtype=np.float64)
            counts[int(row.cid)] += int(row.n)
        nonzero = counts > 0
        cents = cents.copy()
        cents[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
    return cents


def ivf_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 13,
):
    """Approximate cosine top-k via an IVF coarse quantizer: each query
    scores only the vectors assigned to its ``nprobe`` nearest centroid
    cells. Same output schema as :func:`cosine_topk`; with nprobe ==
    n_centroids this is exactly the brute-force result."""
    import ray

    cents = kmeans_centroids(ds, n_centroids, vec_col=vec_col, seed=seed)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (q × nprobe)
    ref = ray.put((qids, q, cents, probes))

    def cell_score(batch: pa.Table) -> pd.DataFrame:
        b_qids, b_q, b_cents, b_probes = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        assign = (mat @ b_cents.T).argmax(axis=1)
        frames = []
        for j, qid in enumerate(b_qids):
            mask = np.isin(assign, b_probes[j])
            if not mask.any():
                continue
            sub_ids = ids[mask]
            col = mat[mask] @ b_q[j]
            kk = min(k, len(sub_ids))
            order = np.lexsort((sub_ids, -col))[:kk]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(kk, qid),
                        id_col: sub_ids[order],
                        "cos": col[order],
                    }
                )
            )
        if not frames:
            return pd.DataFrame({"query_id": [], id_col: [], "cos": []})
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(cell_score, batch_format="pyarrow",
                              batch_size=4096)
    return partials.groupby("query_id").map_groups(
        _final_topk_fn(k, id_col), batch_format="pandas"
    )


def sq8_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Scale path C: scalar-quantized (int8) scan + exact rerank.

    Each batch quantizes its normalized vectors to int8 with a per-batch
    scale (max |component|), scores queries against the int8 matrix (an
    int32 matmul — 4× less memory traffic than float64, the reason SQ8
    is the default memory-bound scan in FAISS-class systems), keeps the
    top ``rerank × k`` candidates per query, and rescores ONLY those in
    float64. The final merge is the same tiny per-query groupby as
    cosine_topk. Exact-top-k whenever the true k-th neighbor survives
    the candidate cut — rerank is the recall knob (pytest pins
    recall == 1.0 on the fixture corpus; the default 4× is generous for
    normalized embeddings where int8 error is ≤ 1/127 per component).

    → Dataset (query_id, vec_id, cos) — same schema/ties as cosine_topk.
    """
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    ref = ray.put((qids, q))

    def partial(batch: pa.Table) -> pd.DataFrame:
        b_qids, b_q = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        scale = np.abs(mat).max() or 1.0
        q8 = np.clip(np.rint(mat / scale * 127.0), -127, 127).astype(np.int8)
        approx = q8.astype(np.int32) @ np.clip(
            np.rint(b_q / scale * 127.0), -127, 127
        ).astype(np.int32).T  # (batch × queries), int32 scores
        kk = min(rerank * k, len(ids))
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(b_qids):
            cand = np.argpartition(-approx[:, j], kk - 1)[:kk]
            # exact float64 rescore of the survivors only
            cos = mat[cand] @ b_q[j]
            order = np.lexsort((ids[cand], -cos))[: min(k, kk)]
            sel = cand[order]
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(cos[order])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_v),
                "cos": np.concatenate(out_s),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(
        _final_topk_fn(k, id_col), batch_format="pandas"
    )


def pq_codebooks(
    ds,
    m: int = 8,
    nbits: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    seed: int = 13,
) -> np.ndarray:
    """Deterministic product-quantization codebooks: the vector space
    split into ``m`` contiguous subspaces, each trained by the same
    distributed Lloyd passes as :func:`kmeans_centroids` (seeded
    data-independent init; one ``map_batches`` partial-sum pass + a
    driver combine per iteration, ALL subspaces in the one pass — the
    exchange moves m × ksub × dsub floats per batch, never vectors).

    → ndarray (m, 2**nbits, dim // m). Requires dim % m == 0."""
    import ray

    first = next(iter(ds.iter_batches(batch_size=1, batch_format="pyarrow")))
    dim = len(first[vec_col][0])
    if dim % m != 0:
        raise ValueError(f"PQ needs dim % m == 0, got dim={dim} m={m}")
    ksub, dsub = 1 << nbits, dim // m
    rng = np.random.default_rng(seed)
    books = rng.standard_normal((m, ksub, dsub)) * (1.0 / np.sqrt(dim))

    for _ in range(n_iter):
        ref = ray.put(books)

        def partial(batch: pa.Table) -> pd.DataFrame:
            b_books = ray.get(ref)
            mat = _normalize(_as_matrix(batch[vec_col]))
            sub = mat.reshape(len(mat), m, dsub)
            rows = {"sub": [], "code": [], "n": [], "vsum": []}
            for s in range(m):
                # L2 argmin per subspace: ||x−c||² order = −2x·c + ||c||²
                d2 = (-2.0 * sub[:, s, :] @ b_books[s].T
                      + (b_books[s] ** 2).sum(axis=1))
                assign = d2.argmin(axis=1)
                sums = np.zeros((ksub, dsub))
                np.add.at(sums, assign, sub[:, s, :])
                counts = np.bincount(assign, minlength=ksub)
                rows["sub"] += [s] * ksub
                rows["code"] += list(range(ksub))
                rows["n"] += counts.tolist()
                rows["vsum"] += [sums[i].tobytes() for i in range(ksub)]
            return pd.DataFrame(rows)

        parts = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=4096
        ).to_pandas()
        sums = np.zeros_like(books)
        counts = np.zeros((m, ksub), dtype=np.int64)
        for row in parts.itertuples(index=False):
            sums[int(row.sub), int(row.code)] += np.frombuffer(
                row.vsum, dtype=np.float64)
            counts[int(row.sub), int(row.code)] += int(row.n)
        books = books.copy()
        nz = counts > 0
        books[nz] = sums[nz] / counts[nz][:, None]
    return books


def pq_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    m: int = 8,
    nbits: int = 8,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
):
    """Scale path D: product quantization + ADC scan + exact rerank.

    Train: :func:`pq_codebooks` (broadcast once). Scan: each batch
    encodes its normalized vectors to m × nbits codes (L2 argmin per
    subspace) and scores every query by ASYMMETRIC DISTANCE
    COMPUTATION — per query ONE (m × ksub) inner-product table against
    the codebooks, approximate cosine = sum of m table lookups (a
    gather + row-sum over uint8 codes). At 100 TB the steady-state
    scan reads m bytes per vector instead of 8·dim (the memory-traffic
    reduction PQ exists for); here the encode is fused into the scan
    because the fixture decodes raw vectors anyway — store the codes
    column once to get the steady-state shape. The top ``rerank × k``
    ADC candidates per batch rescore exactly in float64 (same recall
    knob as :func:`sq8_topk`) and the final merge is the cosine_topk
    per-query groupby.

    → Dataset (query_id, vec_id, cos) — same schema/ties as
    cosine_topk. Approximate: recall grows with rerank / nbits / m."""
    import ray

    books = pq_codebooks(ds, m=m, nbits=nbits, vec_col=vec_col, seed=seed)
    ksub, dsub = books.shape[1], books.shape[2]
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)),
        dtype=np.int64,
    )
    # per-query ADC tables: tables[j][s, c] = <q_j restricted to
    # subspace s, codeword c> — (q × m × ksub), built once, broadcast
    tables = np.einsum("jsd,scd->jsc", q.reshape(len(q), m, dsub), books)
    ref = ray.put((qids, q, books, tables))

    def partial(batch: pa.Table) -> pd.DataFrame:
        b_qids, b_q, b_books, b_tables = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        sub = mat.reshape(len(mat), m, dsub)
        codes = np.empty((len(mat), m), dtype=np.int64)
        for s in range(m):
            d2 = (-2.0 * sub[:, s, :] @ b_books[s].T
                  + (b_books[s] ** 2).sum(axis=1))
            codes[:, s] = d2.argmin(axis=1)
        sidx = np.arange(m)[None, :]
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(b_qids):
            approx = b_tables[j][sidx, codes].sum(axis=1)
            kk = min(rerank * k, len(ids))
            cand = np.argpartition(-approx, kk - 1)[:kk]
            cos = mat[cand] @ b_q[j]  # exact rescore, survivors only
            order = np.lexsort((ids[cand], -cos))[: min(k, kk)]
            sel = cand[order]
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_v.append(ids[sel])
            out_s.append(cos[order])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_v),
                "cos": np.concatenate(out_s),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=4096)
    return partials.groupby("query_id").map_groups(
        _final_topk_fn(k, id_col), batch_format="pandas"
    )


def rrf_fuse(rankings: list[list[int]], k: int = 10,
             rank_constant: int = 60) -> list[tuple[int, float]]:
    """Reciprocal rank fusion (ES 8 hybrid search; Cormack et al. 2009):
    fuse several rankings of the same id space with
    ``score(d) = Σ_r 1/(rank_constant + rank_r(d))`` over the rankings
    that contain d, → top-k (id, rrf) ordered (rrf DESC, id ASC).

    Inputs are top-WINDOW rankings (ES ``rank_window_size``, default
    ≤ ~100 ids each), so fusion is a driver-side dict fold by
    contract — the expensive legs (BM25 top-window, ANN top-window)
    are the distributed parts. Per-doc terms accumulate in rankings
    order, fixing float summation order for oracle comparison."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        for r, did in enumerate(ranking, 1):
            scores[did] = scores.get(did, 0.0) + 1.0 / (rank_constant + r)
    out = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(int(d), float(s)) for d, s in out]
