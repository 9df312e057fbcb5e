"""Similarity search over an embedding column (list<float>).

- :func:`cosine_topk` — exact brute-force top-k per query: the query
  matrix is broadcast once (ray.put), every batch does one float64
  matmul and emits only its per-batch top-k partials, and a final
  k-sized merge per query runs in a tiny groupby. At 100 TB this is
  the baseline scan: O(n·q·d) flops streamed with no shuffle of the
  embedding data itself.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH
  buckets (signed projections → bucket id) built per batch; queries
  probe only their own bucket (plus optional neighbor probes).
  Approximate — recall depends on bucket bits/probes.
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


def cosine_topk(
    ds,
    query_vecs: np.ndarray,
    query_ids: list[int] | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k per query → Dataset (query_id, vec_id, cos)
    with ties broken (cos DESC, vec_id ASC); cos truncated to 6
    decimals for oracle comparison."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(
        query_ids if query_ids is not None else np.arange(len(q)), dtype=np.int64
    )
    ref = ray.put((qids, q))

    class Partial:
        def __init__(self, ref, k):
            self.qids, self.q = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch[id_col].to_numpy()
            mat = _normalize(_as_matrix(batch[vec_col]))
            sims = mat @ self.q.T  # (batch × queries)
            out_q, out_v, out_s = [], [], []
            kk = min(self.k, len(ids))
            for j, qid in enumerate(self.qids):
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

    partials = ds.map_batches(
        Partial, fn_constructor_args=(ref, k), batch_format="pyarrow",
        batch_size=4096, concurrency=2, num_cpus=1,
    )

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

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


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

    class BucketScore:
        def __init__(self, ref, k):
            self.qids, self.q, self.planes, self.by_bucket = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids = batch[id_col].to_numpy()
            mat = _normalize(_as_matrix(batch[vec_col]))
            buckets = (mat @ self.planes > 0) @ (1 << np.arange(self.planes.shape[1]))
            frames = []
            for qb, qjs in self.by_bucket.items():
                mask = buckets == qb
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                sims = mat[mask] @ self.q[qjs].T
                kk = min(self.k, len(sub_ids))
                for col, j in zip(sims.T, qjs):
                    order = np.lexsort((sub_ids, -col))[:kk]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(kk, self.qids[j]),
                                id_col: sub_ids[order],
                                "cos": col[order],
                            }
                        )
                    )
            if not frames:
                return pd.DataFrame({"query_id": [], id_col: [], "cos": []})
            return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(
        BucketScore, fn_constructor_args=(ref, k), batch_format="pyarrow",
        batch_size=4096, concurrency=2, num_cpus=1,
    )

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

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
