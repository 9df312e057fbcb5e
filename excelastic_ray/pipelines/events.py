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


N_USER_BUCKETS = 64  # default; size per the dedup.N_BUCKETS rule —
# one bucket is one reducer frame (~48 B × rows / n_buckets)


def sessionize(ds, gap_minutes: int = 30, n_buckets: int = N_USER_BUCKETS):
    """Session windows per user: a new session starts when the gap since
    the previous event exceeds ``gap_minutes``. → one row per session:
    (user_id, session_idx, n_events, sum_value, start_ts, end_ts).

    Shuffle shape: users are bucketed by ``hash(user_id) % n_buckets``
    so the Ray groupby sees coarse groups instead of one tiny group per user
    (millions of users = the per-group overhead pitfall measured in
    round 1). Inside each bucket the whole frame is sorted once by
    (user_id, ts, event_id) and the session-break scan plus the
    per-session aggregation run vectorized over the bucket — no
    per-user Python loop. A pathologically hot user still lands in one
    bucket, but costs O(rows log rows) of vectorized work there, not an
    unbounded per-group pandas session.
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            ubk = (
                (uid.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(32)
            ) % np.uint64(n_buckets)
        return b.append_column("ubk", pa.array(ubk.astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": np.zeros(0, np.int64),
                    "session_idx": np.zeros(0, np.int64),
                    "n_events": np.zeros(0, np.int64),
                    "sum_value": np.zeros(0, np.float64),
                    "start_ts": np.zeros(0, "datetime64[us]"),
                    "end_ts": np.zeros(0, "datetime64[us]"),
                }
            )
        ts = g["ts"].to_numpy()
        uid = g["user_id"].to_numpy()
        val = g["value"].to_numpy()
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user.copy()
        brk[1:] |= (ts[1:] - ts[:-1]) > gap
        s = np.cumsum(brk) - 1  # global session ordinal in this bucket
        # session_idx within user = s - s at the user's first row
        ustarts = np.flatnonzero(new_user)
        per_user_base = np.repeat(
            s[ustarts], np.diff(np.append(ustarts, n))
        )
        bounds = np.flatnonzero(brk)  # first row of each session
        ends = np.append(bounds[1:], n) - 1  # last row of each session
        return pd.DataFrame(
            {
                "user_id": uid[bounds],
                "session_idx": (s - per_user_base)[bounds],
                "n_events": np.diff(np.append(bounds, n)).astype(np.int64),
                "sum_value": trunc6(np.add.reduceat(val, bounds)),
                "start_ts": ts[bounds],
                "end_ts": ts[ends],
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=16384)
        .groupby("ubk")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _bucketed_sum_combine(partials, key_cols: list[str],
                          n_buckets: int = 32):
    """Final combine of partial (n, sum_value) rows via a COARSE hash
    bucket instead of a fine distributed groupby: a Ray groupby over
    thousands of tiny (type, window) groups costs seconds of per-group
    machinery (the round-1 tiny-group pitfall — it regressed tumbling
    2.4→4 s in round 2's bench); hashing the keys into ~32 reducer
    frames and doing the fine grouping vectorized in pandas inside each
    makes the exchange shape independent of group cardinality."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
        out = df.copy()
        out["__bucket"] = (h % n_buckets).astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop(columns="__bucket")
            .groupby(key_cols, sort=False)
            .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(combine, batch_format="pandas")
    )


def sliding_counts(ds, size_hours: int = 2, step_hours: int = 1):
    """Sliding-window counts: each event lands in size/step consecutive
    windows; window_start identifies the window's left edge. Implemented
    as a vectorized per-batch explode (np.repeat over offsets) + the
    same partial + bucketed-final aggregation as tumbling."""
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
    out = _bucketed_sum_combine(partials, ["event_type", "window_start"])

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
    Pre-aggregated per batch (partial) before the coarse-bucketed final
    combine: the shuffle moves one row per (batch, type, window) into
    ~32 reducer frames."""
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
    out = _bucketed_sum_combine(partials, ["event_type", "window_start"])

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
