"""Windowed aggregation over the events stream table.

Ray Data is a batch engine; stream-shaped semantics are expressed over
the ordered log: partition by key, sort by (ts, event_id) within the
partition (the deterministic tie-break), window with vectorized pandas
inside ``map_groups`` (ray_guide.md streaming-shaped workloads).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from excelastic_ray.pipelines.textstats import trunc6


def sessionize(ds, gap_minutes: int = 30):
    """Session windows per user: a new session starts when the gap since
    the previous event exceeds ``gap_minutes``. → one row per session:
    (user_id, session_idx, n_events, sum_value, start_ts, end_ts).

    Ordering assumption: events within one user fit one group and are
    sorted by (ts, event_id) inside the group — the per-key ordered-log
    contract. session_idx is 0-based in start order.
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new) - 1
        out = (
            pd.DataFrame(
                {
                    "session_idx": sid,
                    "value": g["value"].to_numpy(),
                    "ts": ts,
                }
            )
            .groupby("session_idx")
            .agg(
                n_events=("value", "size"),
                sum_value=("value", "sum"),
                start_ts=("ts", "min"),
                end_ts=("ts", "max"),
            )
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["sum_value"] = trunc6(out["sum_value"].to_numpy())
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def sliding_counts(ds, size_hours: int = 2, step_hours: int = 1):
    """Sliding-window counts: each event lands in size/step consecutive
    windows; window_start identifies the window's left edge. Implemented
    as a vectorized per-batch explode (np.repeat over offsets) + the
    same partial+final aggregation as tumbling."""
    from ray.data.aggregate import Sum

    step_us = step_hours * 3_600_000_000
    n_win = size_hours // step_hours

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        last = (ts // step_us) * step_us  # newest window containing event
        offs = np.arange(n_win, dtype=np.int64) * step_us
        win = np.repeat(last, n_win) - np.tile(offs, len(ts))
        df = pd.DataFrame(
            {
                "event_type": np.repeat(
                    batch["event_type"].to_numpy(zero_copy_only=False), n_win
                ),
                "window_start": win,
                "n": 1,
                "sum_value": np.repeat(batch["value"].to_numpy(), n_win),
            }
        )
        return (
            df.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    out = partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": batch["window_start"]
                .to_numpy()
                .astype("datetime64[us]"),
                "n": batch["n"],
                "sum_value": pa.array(trunc6(batch["sum_value"].to_numpy())),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def tumbling_counts(ds, hours: int = 1):
    """Tumbling-window counts: (event_type, window_start) → n, sum_value.
    Pre-aggregated per batch (partial) before the small groupby (final):
    the shuffle moves one row per (batch, type, window)."""
    from ray.data.aggregate import Sum

    us = hours * 3_600_000_000

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        win = (ts // us) * us
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "window_start": win,
                "n": 1,
                "sum_value": batch["value"].to_numpy(),
            }
        )
        return (
            df.groupby(["event_type", "window_start"], sort=False)
            .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
    out = partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": batch["window_start"]
                .to_numpy()
                .astype("datetime64[us]"),
                "n": batch["n"],
                "sum_value": pa.array(trunc6(batch["sum_value"].to_numpy())),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")
