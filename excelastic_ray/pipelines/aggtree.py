"""Composable aggregation-tree executor — the generic form of the ES
nested-aggregation surface (any bucket agg under any bucket agg, metric
aggs at the deepest level), replacing the fixed per-shape executors for
arbitrary user trees. ES request-body analog:

    {"by_type": {"terms": {"field": "event_type", "size": 3},
      "aggs": {"per_day": {"date_histogram": {"field": "ts",
                                              "interval_hours": 24},
        "aggs": {"v_sum": {"sum": {"field": "value"}},
                 "v_avg": {"avg": {"field": "value"}}}}}}}

Supported bucket kinds: ``terms`` (size N, ordered doc_count DESC /
key ASC — the ES default, computed EXACTLY on full counts, no
shard_size approximation), ``date_histogram`` (fixed
``interval_hours``), ``histogram`` (numeric ``interval``), ``range``
(``ranges`` list of [lo, hi) with null = unbounded). Metric kinds:
``value_count``, ``sum``, ``avg``, ``min``, ``max`` — additive partials,
so one corpus pass suffices at any tree depth. v1 restriction: each
level nests at most ONE bucket agg (a path); metric aggs live at the
deepest level (every level implicitly reports ``doc_count``).

Shuffle shape (the repo-standard two-level combine): one
``map_batches`` pass computes every level's bucket key column
vectorized and pre-aggregates per batch (one row per distinct key
TUPLE per batch — the exchange moves key-tuple partials, never
events), then a coarse hash-bucket combine sums the additive partials.
The combined frame is bucket-space-sized (the product of level
cardinalities — the same boundedness assumption ES itself makes via
``size``/interval; ``terms`` pruning is applied on the driver over
exact rolled-up counts). → flattened leaf rows: one per surviving
deepest-level bucket carrying every ancestor key, ``doc_count``, and
the metrics (floats trunc6'd; avg from the truncated sum, matching
``range_agg``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from excelastic_ray.hashing import resolve_buckets
from excelastic_ray.pipelines.textstats import trunc6

BUCKET_KINDS = ("terms", "date_histogram", "histogram", "range")
METRIC_KINDS = ("value_count", "sum", "avg", "min", "max")


def _parse_spec(spec: dict):
    """→ (levels, metrics): levels = [(name, kind, params)] root→leaf;
    metrics = [(name, op, field)] at the deepest level."""
    levels: list[tuple[str, str, dict]] = []
    metrics: list[tuple[str, str, str]] = []
    node = spec
    while True:
        if len(node) != 1:
            raise ValueError(
                "each level nests exactly one bucket agg (a path); got "
                f"{sorted(node)}"
            )
        (name, body), = node.items()
        kind = next((k for k in BUCKET_KINDS if k in body), None)
        if kind is None:
            raise ValueError(
                f"agg {name!r} has no bucket kind (supported: "
                f"{BUCKET_KINDS})"
            )
        levels.append((name, kind, body[kind]))
        subs = body.get("aggs", {})
        bucket_subs = {
            k: v for k, v in subs.items()
            if any(b in v for b in BUCKET_KINDS)
        }
        metric_subs = {k: v for k, v in subs.items() if k not in bucket_subs}
        if bucket_subs and metric_subs:
            raise ValueError(
                "metric aggs are supported at the deepest level only"
            )
        if len(bucket_subs) > 1:
            raise ValueError(
                "sibling bucket aggs are not supported (one path per tree)"
            )
        if bucket_subs:
            node = bucket_subs
            continue
        for mname, mbody in metric_subs.items():
            op = next((k for k in METRIC_KINDS if k in mbody), None)
            if op is None:
                raise ValueError(
                    f"metric {mname!r} has no supported op "
                    f"(supported: {METRIC_KINDS})"
                )
            metrics.append((mname, op, mbody[op]["field"]))
        return levels, metrics


def _level_keys(batch: pa.Table, kind: str, params: dict) -> np.ndarray:
    """Vectorized bucket key per row for one level (object/str dtype
    for terms/range, int64 for the histogram kinds — pandas groups any
    of them)."""
    if kind == "terms":
        return batch[params["field"]].to_numpy(zero_copy_only=False)
    if kind == "date_histogram":
        us = (
            batch[params["field"]].to_numpy()
            .astype("datetime64[us]").astype(np.int64)
        )
        step = int(params.get("interval_hours", 24)) * 3_600_000_000
        return (us // step) * step
    if kind == "histogram":
        v = batch[params["field"]].to_numpy().astype(np.float64)
        interval = float(params["interval"])
        return (np.floor(v / interval) * interval)
    if kind == "range":
        v = batch[params["field"]].to_numpy().astype(np.float64)
        out = np.full(len(v), "__none__", dtype=object)
        for lo, hi in params["ranges"]:
            lo_f = -np.inf if lo is None else float(lo)
            hi_f = np.inf if hi is None else float(hi)
            key = (f"{'*' if lo is None else repr(float(lo))}-"
                   f"{'*' if hi is None else repr(float(hi))}")
            m = (v >= lo_f) & (v < hi_f) & (out == "__none__")
            out[m] = key
        return out
    raise ValueError(f"unknown bucket kind {kind!r}")


def agg_tree(ds, spec: dict, n_buckets: int | None = None) -> pa.Table:
    levels, metrics = _parse_spec(spec)
    n_buckets = resolve_buckets(ds, n_buckets, bytes_per_row=8)
    key_cols = [f"{name}_key" for name, _, _ in levels]

    def partial(batch: pa.Table) -> pd.DataFrame:
        n_rows = batch.num_rows
        df = pd.DataFrame(
            {
                kc: _level_keys(batch, kind, params)
                for kc, (_, kind, params) in zip(key_cols, levels)
            }
        )
        df["doc_count"] = np.ones(n_rows, dtype=np.int64)
        aggs = {"doc_count": ("doc_count", "sum")}
        for mname, op, field in metrics:
            col = batch[field].to_numpy().astype(np.float64)
            if op in ("sum", "avg"):
                df[f"{mname}__sum"] = col
                aggs[f"{mname}__sum"] = (f"{mname}__sum", "sum")
            elif op == "min":
                df[f"{mname}__min"] = col
                aggs[f"{mname}__min"] = (f"{mname}__min", "min")
            elif op == "max":
                df[f"{mname}__max"] = col
                aggs[f"{mname}__max"] = (f"{mname}__max", "max")
            elif op == "value_count":
                df[f"{mname}__cnt"] = np.ones(n_rows, dtype=np.int64)
                aggs[f"{mname}__cnt"] = (f"{mname}__cnt", "sum")
        # rows outside every configured range drop (ES range semantics)
        for kc, (_, kind, _p) in zip(key_cols, levels):
            if kind == "range":
                df = df[df[kc] != "__none__"]
        return (
            df.groupby(key_cols, sort=False)
            .agg(**aggs)
            .reset_index()
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
        out = df.copy()
        out["__bucket"] = (h % n_buckets).astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        aggs = {}
        for c in g.columns:
            if c in key_cols or c == "__bucket":
                continue
            aggs[c] = (c, "min" if c.endswith("__min")
                       else "max" if c.endswith("__max") else "sum")
        return (
            g.drop(columns="__bucket")
            .groupby(key_cols, sort=False)
            .agg(**aggs)
            .reset_index()
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if not len(fine):
        cols: dict = {kc: pa.array([], type=pa.string()) for kc in key_cols}
        cols["doc_count"] = pa.array([], type=pa.int64())
        for mname, op, _f in metrics:
            cols[mname] = pa.array(
                [], type=pa.int64() if op == "value_count" else pa.float64()
            )
        return pa.table(cols)

    # driver tree pass: terms levels prune top-down over EXACT rolled-up
    # doc counts (size per parent bucket, doc_count DESC / key ASC)
    for li, (name, kind, params) in enumerate(levels):
        if kind != "terms":
            continue
        size = int(params.get("size", 10))
        parent = key_cols[:li]
        kc = key_cols[li]
        roll = (
            fine.groupby(parent + [kc], sort=False)["doc_count"]
            .sum()
            .reset_index()
        )
        if parent:
            roll = roll.sort_values(
                parent + ["doc_count", kc],
                ascending=[True] * len(parent) + [False, True],
            )
            roll["__rank"] = roll.groupby(parent, sort=False).cumcount()
        else:
            roll = roll.sort_values(["doc_count", kc],
                                    ascending=[False, True])
            roll["__rank"] = np.arange(len(roll))
        keep = roll[roll["__rank"] < size][parent + [kc]]
        fine = fine.merge(keep, on=parent + [kc])

    fine = fine.sort_values(key_cols, kind="mergesort").reset_index(drop=True)

    out: dict = {}
    for kc, (_n, kind, _p) in zip(key_cols, levels):
        if kind == "date_histogram":
            out[kc] = pa.array(
                fine[kc].to_numpy().astype("datetime64[us]")
            )
        elif kind == "histogram":
            out[kc] = pa.array(fine[kc].to_numpy().astype(np.float64))
        else:
            out[kc] = pa.array(fine[kc].astype(str), type=pa.string())
    out["doc_count"] = pa.array(
        fine["doc_count"].to_numpy().astype(np.int64)
    )
    n = fine["doc_count"].to_numpy().astype(np.int64)
    safe = np.where(n > 0, n, 1)
    for mname, op, _f in metrics:
        if op == "value_count":
            out[mname] = pa.array(
                fine[f"{mname}__cnt"].to_numpy().astype(np.int64)
            )
        elif op == "sum":
            out[mname] = pa.array(
                trunc6(fine[f"{mname}__sum"].to_numpy()),
                type=pa.float64(),
            )
        elif op == "avg":
            s = trunc6(fine[f"{mname}__sum"].to_numpy())
            out[mname] = pa.array(trunc6(s / safe), type=pa.float64())
        elif op == "min":
            out[mname] = pa.array(
                trunc6(fine[f"{mname}__min"].to_numpy()), type=pa.float64()
            )
        elif op == "max":
            out[mname] = pa.array(
                trunc6(fine[f"{mname}__max"].to_numpy()), type=pa.float64()
            )
    return pa.table(out)
