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

ES semantics honored exactly (round-4 review fixes):

- A doc missing a level's field (null terms value, NaT timestamp, NaN
  numeric) or outside every configured range is EXCLUDED from that
  level and below but still counts toward every ANCESTOR level's
  doc_count/ranking — carried as a marker key (None/NaN) through the
  combine and dropped only from the final output.
- ``range`` buckets may OVERLAP: a doc lands in every bucket whose
  range contains it (rows expand per matching range). Ancestor terms
  ranking counts each source doc once via a ``__once`` column (exact
  for non-overlapping ranges — the usual shape — and for any terms
  level ABOVE the range level; a terms level BELOW overlapping ranges
  under-ranks the doc's second path, documented corner).
- ``value_count`` counts non-null values, not rows; ``avg`` divides by
  the non-null value count (null when a bucket has no values); min/max
  skip nulls (pandas skipna).

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


def _range_key(lo, hi) -> str:
    return (f"{'*' if lo is None else repr(float(lo))}-"
            f"{'*' if hi is None else repr(float(hi))}")


def _level_keys(batch: pa.Table, kind: str, params: dict) -> np.ndarray:
    """Vectorized bucket key per row for one non-range level. Missing
    values (null terms, NaT timestamps, NaN numerics) become the
    marker key (None for terms, NaN for the histogram kinds): excluded
    from this level's output but still counted at ancestor levels."""
    if kind == "terms":
        vals = batch[params["field"]].to_numpy(zero_copy_only=False)
        out = vals.astype(object)
        na = pd.isna(out)  # vectorized None/NaN detection
        if na.any():
            out[na] = None
        return out
    if kind == "date_histogram":
        raw = batch[params["field"]].to_numpy().astype("datetime64[us]")
        us = raw.astype(np.int64).astype(np.float64)
        us[np.isnat(raw)] = np.nan
        step = float(int(params.get("interval_hours", 24)) * 3_600_000_000)
        return np.floor(us / step) * step
    if kind == "histogram":
        v = batch[params["field"]].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        interval = float(params["interval"])
        return np.floor(v / interval) * interval
    raise ValueError(f"unknown bucket kind {kind!r}")


def agg_tree(ds, spec: dict, n_buckets: int | None = None) -> pa.Table:
    levels, metrics = _parse_spec(spec)
    n_buckets = resolve_buckets(ds, n_buckets, bytes_per_row=8)
    key_cols = [f"{name}_key" for name, _, _ in levels]

    def partial(batch: pa.Table) -> pd.DataFrame:
        n_rows = batch.num_rows
        df = pd.DataFrame(index=np.arange(n_rows))
        range_levels: list[tuple[str, list]] = []
        for kc, (_, kind, params) in zip(key_cols, levels):
            if kind == "range":
                # the raw value rides as a temp column so a SECOND
                # range level's masks stay aligned after the first
                # level's row expansion
                df[f"{kc}__v"] = batch[params["field"]].to_numpy(
                    zero_copy_only=False
                ).astype(np.float64)
                range_levels.append((kc, params["ranges"]))
                df[kc] = None  # filled by the expansion below
            else:
                df[kc] = _level_keys(batch, kind, params)
        df["doc_count"] = np.ones(n_rows, dtype=np.int64)
        # __once: 1 on the FIRST expanded copy of each source row —
        # ancestor doc_counts/terms ranking count each doc once even
        # when overlapping ranges expand it into several leaf buckets
        df["__once"] = np.ones(n_rows, dtype=np.int64)
        aggs = {"doc_count": ("doc_count", "sum"),
                "__once": ("__once", "sum")}
        for mname, op, field in metrics:
            col = batch[field].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if op in ("sum", "avg"):
                df[f"{mname}__sum"] = col  # NaN skipped by pandas sum
                aggs[f"{mname}__sum"] = (f"{mname}__sum", "sum")
            if op == "avg":
                df[f"{mname}__n"] = (~np.isnan(col)).astype(np.int64)
                aggs[f"{mname}__n"] = (f"{mname}__n", "sum")
            elif op == "min":
                df[f"{mname}__min"] = col
                aggs[f"{mname}__min"] = (f"{mname}__min", "min")
            elif op == "max":
                df[f"{mname}__max"] = col
                aggs[f"{mname}__max"] = (f"{mname}__max", "max")
            elif op == "value_count":
                # ES value_count counts VALUES, not rows: nulls excluded
                df[f"{mname}__cnt"] = (~np.isnan(col)).astype(np.int64)
                aggs[f"{mname}__cnt"] = (f"{mname}__cnt", "sum")
        # range expansion: one copy per MATCHING range (ES puts a doc in
        # every bucket whose range contains it — buckets may overlap);
        # rows matching nothing keep the None marker (ancestors still
        # count them, the output drops them)
        for kc, ranges in range_levels:
            v = df[f"{kc}__v"].to_numpy()
            parts = []
            seen = np.zeros(len(df), dtype=bool)
            first = np.ones(len(df), dtype=bool)
            for lo, hi in ranges:
                lo_f = -np.inf if lo is None else float(lo)
                hi_f = np.inf if hi is None else float(hi)
                m = (v >= lo_f) & (v < hi_f)
                if not m.any():
                    continue
                sub = df[m].copy()
                sub[kc] = _range_key(lo, hi)
                # only each row's first copy keeps __once=1 (a copy of
                # a row that was already a non-first copy at an OUTER
                # range level starts at 0 and stays 0)
                dup = ~first[m]
                if dup.any():
                    sub.loc[dup, "__once"] = 0
                parts.append(sub)
                first = first & ~m
                seen |= m
            if not seen.all():
                parts.append(df[~seen])  # marker rows (no range matched)
            df = pd.concat(parts, ignore_index=True) if parts else df[:0]
            df = df.drop(columns=f"{kc}__v")
        return (
            df.groupby(key_cols, sort=False, dropna=False)
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
            .groupby(key_cols, sort=False, dropna=False)
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

    def _typed_empty() -> pa.Table:
        cols: dict = {}
        for kc, (_n, kind, _p) in zip(key_cols, levels):
            if kind == "date_histogram":
                cols[kc] = pa.array([], type=pa.timestamp("us"))
            elif kind == "histogram":
                cols[kc] = pa.array([], type=pa.float64())
            else:
                cols[kc] = pa.array([], type=pa.string())
        cols["doc_count"] = pa.array([], type=pa.int64())
        for mname, op, _f in metrics:
            cols[mname] = pa.array(
                [], type=pa.int64() if op == "value_count" else pa.float64()
            )
        return pa.table(cols)

    if not len(fine):
        return _typed_empty()

    # driver tree pass: terms levels prune top-down over EXACT rolled-up
    # ONCE-counts (size per parent bucket, doc_count DESC / key ASC) —
    # __once counts each source doc a single time even after range
    # expansion, and marker rows contribute to their ancestors
    for li, (name, kind, params) in enumerate(levels):
        if kind != "terms":
            continue
        size = int(params.get("size", 10))
        parent = key_cols[:li]
        kc = key_cols[li]
        roll = (
            fine.groupby(parent + [kc], sort=False, dropna=False)["__once"]
            .sum()
            .reset_index()
            .rename(columns={"__once": "doc_count"})
        )
        roll = roll[roll[kc].notna()]  # marker keys never become buckets
        if parent:
            roll = roll.sort_values(
                parent + ["doc_count", kc],
                ascending=[True] * len(parent) + [False, True],
            )
            roll["__rank"] = roll.groupby(
                parent, sort=False, dropna=False
            ).cumcount()
        else:
            roll = roll.sort_values(["doc_count", kc],
                                    ascending=[False, True])
            roll["__rank"] = np.arange(len(roll))
        keep = roll[roll["__rank"] < size][parent + [kc]]
        # NaN parent keys don't join (pandas merge semantics) — correct:
        # a row already marker-excluded at an ancestor level is outside
        # every deeper bucket in ES too
        fine = fine.merge(keep, on=parent + [kc])

    # marker rows served their ancestor-counting purpose; the output
    # holds only fully-bucketed leaf paths
    for kc in key_cols:
        fine = fine[fine[kc].notna()]
    if not len(fine):
        return _typed_empty()

    fine = fine.sort_values(key_cols, kind="mergesort").reset_index(drop=True)

    out: dict = {}
    for kc, (_n, kind, _p) in zip(key_cols, levels):
        if kind == "date_histogram":
            out[kc] = pa.array(
                fine[kc].to_numpy().astype(np.int64).astype("datetime64[us]")
            )
        elif kind == "histogram":
            out[kc] = pa.array(fine[kc].to_numpy().astype(np.float64))
        else:
            out[kc] = pa.array(fine[kc].astype(str), type=pa.string())
    out["doc_count"] = pa.array(
        fine["doc_count"].to_numpy().astype(np.int64)
    )
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
            n = fine[f"{mname}__n"].to_numpy().astype(np.int64)
            vals = np.where(n > 0, s / np.where(n > 0, n, 1), np.nan)
            out[mname] = pa.array(
                [None if v != v else v for v in trunc6(vals)],
                type=pa.float64(),
            )
        elif op == "min":
            out[mname] = pa.array(
                trunc6(fine[f"{mname}__min"].to_numpy()), type=pa.float64()
            )
        elif op == "max":
            out[mname] = pa.array(
                trunc6(fine[f"{mname}__max"].to_numpy()), type=pa.float64()
            )
    return pa.table(out)
