"""Conversation-level analytics over the transcript table — the
aggregate views an operator of a transcript corpus actually reads
(turns per conversation, role mix, tool usage, duration, and the
role-transition structure).

Shuffle shape: conversations are TINY groups (a handful of turns), so
a fine distributed groupby per conv would hit the measured per-group
overhead pitfall. Both ops use the repo-standard two-level shape:
per-batch vectorized partials (one row per conv per batch / one row
per transition pair per batch) → coarse hash-bucket combine → final
vectorized reduce inside each bucket frame. The exchange moves
O(batches × convs-in-batch) partial rows, never turns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from excelastic_ray.analysis import TOKEN_RE
from excelastic_ray.hashing import resolve_buckets
from excelastic_ray.pipelines.events import _bucketed_sum_combine


def _conv_bucket(b: pa.Table, n_buckets: int) -> pa.Table:
    """Append the conv-hash bucket column (the one shared bucketing
    rule for every conversation-grouped op in this module)."""
    cid = b["conv_id"].to_numpy(zero_copy_only=False)
    h = pd.util.hash_pandas_object(pd.Series(cid), index=False).to_numpy()
    return b.append_column(
        "__bucket", pa.array((h % n_buckets).astype(np.int64))
    )


def conv_stats(ds, n_buckets: int | None = None):
    """Per-conversation rollup → (conv_id, n_turns, n_user,
    n_assistant, n_tool_role, n_tool_calls, n_tokens, duration_s).

    ``n_tool_role`` counts turns whose role is ``tool``;
    ``n_tool_calls`` counts turns with a non-empty ``tool`` attribute
    (the reference's tool column). Duration is (max ts - min ts) in
    whole seconds. min/max survive the sum-combine as negated-max
    tricks are avoided by carrying both endpoints explicitly.

    ``n_buckets=None`` auto-sizes by the SCALE.md K rule (one bucket =
    one reducer frame of conv partial rows)."""
    n_buckets = resolve_buckets(ds, n_buckets, bytes_per_row=16)

    def partial(batch: pa.Table) -> pd.DataFrame:
        roles = batch["role"].to_numpy(zero_copy_only=False)
        tools = batch["tool"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        findall = TOKEN_RE.findall
        n_tok = np.fromiter(
            (len(findall(t.lower())) if t else 0 for t in texts),
            dtype=np.int64, count=len(texts),
        )
        ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_numpy(zero_copy_only=False),
                "n_turns": 1,
                "n_user": (roles == "user").astype(np.int64),
                "n_assistant": (roles == "assistant").astype(np.int64),
                "n_tool_role": (roles == "tool").astype(np.int64),
                "n_tool_calls": np.asarray(
                    [bool(t) for t in tools], dtype=np.int64
                ),
                "n_tokens": n_tok,
                "ts_min": ts,
                "ts_max": ts,
            }
        )
        return (
            df.groupby("conv_id", sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_user=("n_user", "sum"),
                n_assistant=("n_assistant", "sum"),
                n_tool_role=("n_tool_role", "sum"),
                n_tool_calls=("n_tool_calls", "sum"),
                n_tokens=("n_tokens", "sum"),
                ts_min=("ts_min", "min"),
                ts_max=("ts_max", "max"),
            )
            .reset_index()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=16384)

    # min/max are not additive: the generic sum-combine cannot be used
    # verbatim, so the bucket reducer aggregates each column correctly
    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["conv_id"],
                                       index=False).to_numpy()
        out = df.copy()
        out["__bucket"] = (h % n_buckets).astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop(columns="__bucket")
            .groupby("conv_id", sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_user=("n_user", "sum"),
                n_assistant=("n_assistant", "sum"),
                n_tool_role=("n_tool_role", "sum"),
                n_tool_calls=("n_tool_calls", "sum"),
                n_tokens=("n_tokens", "sum"),
                ts_min=("ts_min", "min"),
                ts_max=("ts_max", "max"),
            )
            .reset_index()
        )

    combined = (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(combine, batch_format="pandas")
    )

    def finish(batch: pa.Table) -> pa.Table:
        dur = (
            batch["ts_max"].to_numpy() - batch["ts_min"].to_numpy()
        ) // 1_000_000
        keep = [c for c in batch.column_names
                if c not in ("ts_min", "ts_max")]
        return batch.select(keep).append_column(
            "duration_s", pa.array(dur.astype(np.int64))
        )

    return combined.map_batches(finish, batch_format="pyarrow")


def role_transitions(ds, n_buckets: int | None = None):
    """Role-transition counts over consecutive turns within each
    conversation → (from_role, to_role, n) — the Markov structure of
    the corpus (user→assistant→tool loops).

    Consecutive means ``turn_idx + 1``: each batch pairs its rows via
    a vectorized sorted self-alignment on (conv_id, turn_idx), and
    cross-BATCH adjacency is preserved by bucketing whole
    conversations first (conv-hash bucket groupby → per-bucket sort →
    shift compare), so no pair is ever split. The FIRST bucketing is
    corpus-row-sized, so ``n_buckets=None`` auto-sizes by the K rule;
    the final combine's key space is roles², a constant."""
    n_buckets = resolve_buckets(ds, n_buckets, bytes_per_row=64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = len(g)
        cid = g["conv_id"].to_numpy()
        ti = g["turn_idx"].to_numpy()
        role = g["role"].to_numpy()
        # n <= 1 emits an empty pair set via EMPTY SLICES of the real
        # role array — a literal [] would type the empty block float64
        # and poison Ray's schema unification with the string blocks
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = (cid[1:] == cid[:-1]) & (ti[1:] == ti[:-1] + 1)
        m = same[1:]
        pair = pd.DataFrame(
            {"from_role": pd.array(role[:-1][m], dtype="string"),
             "to_role": pd.array(role[1:][m], dtype="string")}
        )
        return (
            pair.groupby(["from_role", "to_role"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    partials = (
        ds.map_batches(lambda b: _conv_bucket(b, n_buckets),
                       batch_format="pyarrow", batch_size=16384)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return _bucketed_sum_combine(partials, ["from_role", "to_role"],
                                 n_buckets=8)


def tool_funnel(ds, n_buckets: int | None = None):
    """Tool-invocation funnels: within each conversation the
    tool-bearing turns (non-null, non-empty ``tool`` — the engine's
    exists convention), ordered by ``turn_idx`` with non-tool turns
    SKIPPED, form (from_tool, to_tool) bigrams; global counts expose
    the corpus's tool-chain structure (search→code→code loops) — the
    transcript-native funnel a tool-use analyst asks for.

    Same conv-hash bucket shape as :func:`role_transitions` (whole
    conversations co-locate so a funnel edge never splits across
    batches), but the input first prunes to the three narrow columns —
    the wide ``text`` never enters the shuffle. The final combine's
    key space is tools², a constant."""
    ds = ds.select_columns(["conv_id", "turn_idx", "tool"])
    n_buckets = resolve_buckets(ds, n_buckets, bytes_per_row=40)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["tool"].notna() & (g["tool"].astype(str) != "")]
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = len(g)
        cid = g["conv_id"].to_numpy()
        tool = g["tool"].to_numpy()
        same = np.zeros(n, dtype=bool)
        if n > 1:
            same[1:] = cid[1:] == cid[:-1]
        m = same[1:]
        pair = pd.DataFrame(
            {"from_tool": pd.array(tool[:-1][m], dtype="string"),
             "to_tool": pd.array(tool[1:][m], dtype="string")}
        )
        return (
            pair.groupby(["from_tool", "to_tool"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    partials = (
        ds.map_batches(lambda b: _conv_bucket(b, n_buckets),
                       batch_format="pyarrow", batch_size=16384)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return _bucketed_sum_combine(partials, ["from_tool", "to_tool"],
                                 n_buckets=8)


def context_windows(ds, window: int = 3, n_buckets: int | None = None):
    """Training-example assembly: for every turn, the concatenation of
    its previous ``window`` turns in the same conversation (newline-
    joined, oldest first) plus the turn itself as the target — the
    (context, target) constructor for next-turn prediction / RAG eval
    sets.

    Whole conversations bucket together (conv-hash groupby), each
    bucket frame sorts once by (conv_id, turn_idx), and the window
    assembles with ``window`` vectorized shifted-array passes — no
    per-conversation Python. The window is ROW-based within the
    conversation (SQL ``ROWS BETWEEN w PRECEDING AND 1 PRECEDING``):
    turn-idx gaps from deleted turns do not break the chain, matching
    the window-function semantics a SQL twin computes.

    → Dataset (conv_id, turn_idx, context, target).

    ``n_buckets=None`` auto-sizes by the K rule with a full-text
    per-row budget (each bucket frame carries the turn text × (window
    + 1) after assembly)."""
    n_buckets = resolve_buckets(ds, n_buckets, bytes_per_row=2048)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        n = len(g)
        cid = g["conv_id"].to_numpy()
        ti = g["turn_idx"].to_numpy()
        texts = np.asarray(
            ["" if t is None else t for t in g["text"]], dtype=object
        )
        ctx = np.full(n, "", dtype=object)
        # `has` tracks "context already holds a turn" separately from
        # the string value: an EMPTY-TEXT turn still occupies a window
        # slot and must contribute its newline separator, exactly like
        # the SQL twin's array_to_string over the list window
        has = np.zeros(n, dtype=bool)
        for k in range(window, 0, -1):  # oldest shift first
            if k >= n:
                continue
            valid = np.zeros(n, dtype=bool)
            valid[k:] = cid[k:] == cid[:-k]
            piece = np.empty(n, dtype=object)
            piece[k:] = texts[:-k]
            first = valid & ~has
            grow = valid & has
            if first.any():
                ctx[first] = piece[first]
            if grow.any():
                ctx[grow] = ctx[grow] + "\n" + piece[grow]
            has |= valid
        return pd.DataFrame(
            {
                "conv_id": cid,
                "turn_idx": ti,
                "context": ctx,
                "target": texts,
            }
        )

    return (
        ds.map_batches(lambda b: _conv_bucket(b, n_buckets),
                       batch_format="pyarrow", batch_size=16384)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
