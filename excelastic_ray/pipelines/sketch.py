"""Mergeable sketches for corpus-scale approximate aggregates.

The reference needs no sketches (BM25 wants exact df/N — SURVEY §2.5),
but a 100 TB training-data pipeline does: exact global value counts of
a high-cardinality column need a full shuffle, while a Misra-Gries
summary answers "what are the heavy hitters" with one narrow
partial+merge pass and a PROVABLE error bound.

Misra-Gries(k) with the mergeable-summaries combine (Agarwal, Cormode,
Huang, Phillips, Wei, Yi — PODS 2012): a summary holds ≤ k counters;
merging sums counters by key, then subtracts the (k+1)-th largest
counter value from every survivor and drops non-positives. Guarantees,
for TRUE count t(v) over N rows:  est(v) ≤ t(v) ≤ est(v) + N/(k+1),
and every v with t(v) > N/(k+1) is present in the summary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _compress(vals: np.ndarray, counts: np.ndarray,
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """Keep ≤ k counters: subtract the (k+1)-th largest count from every
    counter, drop non-positives (the MG decrement step in bulk)."""
    if len(vals) <= k:
        return vals, counts
    order = np.argsort(-counts, kind="stable")
    pivot = counts[order[k]]
    keep = counts > pivot
    return vals[keep], counts[keep] - pivot


def heavy_hitters(ds, col: str, k: int = 16):
    """Approximate top-value counts of ``col`` → pa.Table (value, est,
    n_rows, max_err) sorted (est DESC, value ASC).

    Shape: one narrow ``map_batches`` pass emits a ≤ k-counter MG
    summary per batch (exact within the batch, then compressed) plus a
    row-count marker; the driver merge is sum-by-key → compress over
    O(batches × k) rows, never O(rows). Bound: with ``max_err =
    N // (k+1)``, every output satisfies est ≤ true ≤ est + max_err and
    any value with true > max_err is guaranteed present (mergeable MG,
    Agarwal et al. PODS 2012).
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        s = batch[col].to_numpy(zero_copy_only=False).astype(object)
        vals, counts = np.unique(s.astype(str), return_counts=True)
        vals, counts = _compress(vals, counts.astype(np.int64), k)
        # one marker row per batch carries the batch's row count (a
        # compressed summary may legally be EMPTY, so N can't ride the
        # counter rows)
        return pd.DataFrame(
            {
                "value": np.append(vals, None),
                "est": np.append(counts, 0).astype(np.int64),
                "n": np.append(np.zeros(len(vals), dtype=np.int64), len(s)),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    n_rows = int(parts["n"].sum())
    real = parts[parts["value"].notna()]
    merged = real.groupby("value")["est"].sum()
    vals, counts = _compress(
        merged.index.to_numpy().astype(object),
        merged.to_numpy().astype(np.int64), k,
    )
    order = np.lexsort((vals.astype(str), -counts))
    max_err = n_rows // (k + 1)
    return pa.table(
        {
            "value": pa.array(vals[order].astype(object), type=pa.string()),
            "est": pa.array(counts[order], type=pa.int64()),
            "n_rows": pa.array(np.full(len(order), n_rows, dtype=np.int64)),
            "max_err": pa.array(np.full(len(order), max_err, dtype=np.int64)),
        }
    )


def kmv_distinct(ds, col: str, k: int = 64):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
    Beyer et al. SIGMOD 2007): FNV-1a-64 every value, keep the ``k``
    smallest DISTINCT hashes; with fewer than ``k`` distinct hashes the
    estimate is the exact distinct count, else ``(k-1) * 2^64 / h_(k)``.

    Why KMV instead of HLL here: the summary is mergeable (union of
    k-min sets → k-min set), ONE narrow pass — and, unlike HLL's
    register math, the whole estimator is EXACTLY SQL-expressible with
    the deterministic integer FNV (``fnv64_int_sql``), so the gate twin
    full-matches instead of a rows-only check.

    Shape at 100 TB: per-batch partials are ≤ k hashes each; the driver
    merge is unique+sort over O(batches x k) uint64s. No shuffle.

    → pa.Table (est, kth_hash, k) — one row; ``kth_hash`` is the
    decimal string of h_(k) (uint64 exceeds Arrow int64).
    """
    from excelastic_ray.hashing import fnv1a_int64

    def partial(batch: pa.Table) -> pd.DataFrame:
        h = np.unique(fnv1a_int64(batch[col].to_numpy()))
        return pd.DataFrame({"h": h[:k]})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    hs = np.unique(parts["h"].to_numpy().astype(np.uint64))[:k]
    if len(hs) == 0:
        est, kth = 0.0, 0
    elif len(hs) < k:
        est, kth = float(len(hs)), int(hs[-1])
    else:
        kth = int(hs[k - 1])
        # identical float64 expression tree as the SQL twin:
        # CAST(k-1 AS DOUBLE) * 2^64 / CAST(h_k AS DOUBLE)
        est = float(k - 1) * 18446744073709551616.0 / float(np.uint64(kth))
    est = float(np.floor(est * 1e6 + 0.5) / 1e6)
    return pa.table(
        {
            "est": pa.array([est], type=pa.float64()),
            "kth_hash": pa.array([str(kth)], type=pa.string()),
            "k": pa.array([k], type=pa.int64()),
        }
    )
