"""Deterministic sampling — the data-mixing primitive for training-data
pipelines.

Sampling is keyed on a stable integer id via a Knuth multiplicative
hash, NOT on an RNG stream: the decision for a row depends only on the
row itself, so it is reproducible at any parallelism/partitioning, and
the identical integer expression is SQL-expressible for the oracle gate:

    keep  ⇔  (id * 2654435761) mod 2^32  <  rate * 2^32

(64-bit intermediate: safe for id < 2^31 in both numpy int64 and SQL
BIGINT.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761
MOD = 1 << 32


def _keep_mask(ids: np.ndarray, rate: float) -> np.ndarray:
    h = (ids.astype(np.int64) * KNUTH) % MOD
    return h < int(rate * MOD)


def deterministic_sample(ds, rate: float, id_col: str = "doc_id"):
    """Keep ~rate of rows, decided per row by hashing ``id_col``."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(_keep_mask(batch[id_col].to_numpy(), rate)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)


def stratified_sample(ds, rates: dict[str, float], strata_col: str = "lang",
                      id_col: str = "doc_id", default_rate: float = 0.0):
    """Per-stratum rates (e.g. per language) — the mixing knob: each
    stratum keeps its own deterministic fraction; unlisted strata keep
    ``default_rate``."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        strata = batch[strata_col].to_pylist()
        rate_arr = np.asarray(
            [rates.get(s, default_rate) for s in strata], dtype=np.float64
        )
        h = (ids.astype(np.int64) * KNUTH) % MOD
        keep = h < (rate_arr * MOD).astype(np.int64)
        return batch.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)


def mix_to_weights(ds, weights: dict[str, float],
                   source_col: str = "source", id_col: str = "doc_id",
                   counts: dict[str, int] | None = None):
    """Down-sample to a target source MIXTURE (the pre-training
    data-mixing recipe: "the corpus should be 50% src0, 30% src1,
    20% src2"). Never upsamples: the output size is the largest total
    T for which every weighted source can supply its share
    (T = min over sources of count_s / weight_s); each source then
    keeps the deterministic Knuth-hash fraction rate_s = weight_s * T
    / count_s of its docs (sources with weight 0 or absent from
    ``weights`` are dropped). Proportions are rate-accurate (hash
    thresholding), not exact-count — exact-count selection would need
    a per-source k-smallest-hash sort; the rate rule is one counting
    pass + one map, parallelism-invariant, and SQL-expressible with
    the identical float expression (w * T / c, floored at * 2^32).

    → Dataset (id, source) of survivors. ``counts`` skips the counting
    pass when the caller already aggregated per-source totals
    (temperature_mix shares its counting pass this way)."""
    if counts is None:
        counts = {}
        for r in ds.groupby(source_col).count().take_all():  # tiny
            counts[r[source_col]] = int(r["count()"])        # per source
    live = [(s, w) for s, w in weights.items()
            if w > 0 and counts.get(s)]
    if not live:
        return ds.filter(lambda r: False).select_columns(
            [id_col, source_col]
        )
    t_total = min(counts[s] / w for s, w in live)
    rates = {s: w * t_total / counts[s] for s, w in live}
    return stratified_sample(
        ds.select_columns([id_col, source_col]), rates,
        strata_col=source_col, id_col=id_col, default_rate=0.0,
    )


def temperature_mix(ds, temperature: float = 2.0,
                    source_col: str = "source", id_col: str = "doc_id"):
    """Temperature-flattened source mixing — the multilingual /
    multi-source pre-training recipe (mT5/mC4, XLM-R): mixture weight
    p_s ∝ count_s^(1/T).  T = 1 keeps natural proportions, T → ∞
    approaches uniform; the flattening boosts small sources' SHARE
    while ``mix_to_weights`` only ever downsamples (output total is
    the largest size every source can supply at its flattened share).

    One tiny counting aggregate derives the weights, then the
    deterministic-hash mixer applies them — two streaming passes, no
    shuffle of data rows.  Weights are trunc6'd before use: the
    normalizer Σ c^(1/T) is an order-sensitive float sum, and the SQL
    twin must land on the identical hash thresholds.

    → Dataset (id, source) of survivors."""
    counts: dict[str, int] = {}
    for r in ds.groupby(source_col).count().take_all():
        counts[r[source_col]] = int(r["count()"])
    if not counts:
        return ds.select_columns([id_col, source_col])
    inv_t = 1.0 / float(temperature)
    raw = {s: float(c) ** inv_t for s, c in sorted(counts.items())}
    total = sum(raw.values())
    weights = {
        s: float(np.floor(v / total * 1e6 + 0.5) / 1e6)
        for s, v in raw.items()
    }
    return mix_to_weights(ds, weights, source_col, id_col, counts=counts)


def budget_select(ds, token_budget: int, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Quality-ordered selection under a token budget — the curation
    primitive "take the best documents until the budget is spent".

    Semantics: order docs by (quality DESC, id ASC) — quality is the
    trunc6 distinct-token ratio, the same SQL-twinned signal
    ``quality_batch`` emits — and keep the maximal PREFIX whose
    cumulative token count stays ≤ ``token_budget`` (identical to a
    SQL window ``sum(n_tokens) OVER (ORDER BY quality DESC, id) <=
    B``).

    Scale shape — NO global sort: quality ∈ [0, 1] is quantized to
    1e-4 buckets, so one ``map_batches`` pass emits per-batch
    (bucket, n_tokens, count) partials (≤ 10 001 buckets total), the
    driver walks the bucket histogram to find the boundary bucket,
    and ONLY that bucket's rows are gathered and exactly ordered for
    the residual budget — two streaming passes plus a gather bounded
    by one bucket (the gather is the op's documented driver budget;
    recurse with finer buckets if a corpus concentrates quality mass
    in one 1e-4 slice).

    → Dataset (id, quality, n_tokens) of the selected docs."""
    import pyarrow.compute as pc
    import ray

    from excelastic_ray.pipelines.textstats import (
        _tokenize_batch,
        trunc6,
    )

    def metrics(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        codes, _uniq, row_idx = _tokenize_batch(texts)
        n_tokens = np.bincount(row_idx, minlength=n).astype(np.int64)
        if len(codes):
            import pandas as pd

            pair = pd.DataFrame({"r": row_idx, "c": codes}).drop_duplicates()
            n_distinct = np.bincount(
                pair["r"].to_numpy(), minlength=n
            ).astype(np.int64)
        else:
            n_distinct = np.zeros(n, dtype=np.int64)
        q = trunc6(
            np.divide(n_distinct, n_tokens,
                      out=np.zeros(n, dtype=np.float64),
                      where=n_tokens > 0)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "quality": pa.array(q),
                "n_tokens": pa.array(n_tokens),
                "qb": pa.array(np.floor(q * 10_000).astype(np.int64)),
            }
        )

    m = ds.map_batches(metrics, batch_format="pyarrow").materialize()

    def hist(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {"qb": batch["qb"].to_numpy(), "tok": batch["n_tokens"].to_numpy()}
        )
        g = df.groupby("qb").agg(tok=("tok", "sum"), n=("tok", "size"))
        return pa.table(
            {
                "qb": pa.array(g.index.to_numpy()),
                "tok": pa.array(g["tok"].to_numpy()),
                "n": pa.array(g["n"].to_numpy()),
            }
        )

    h = (
        m.map_batches(hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("qb")
        .sum()
        .sort_index(ascending=False)
    )
    boundary_qb = None
    spent = 0
    for qb, row in h.iterrows():
        if spent + row["tok"] > token_budget:
            boundary_qb = int(qb)
            break
        spent += int(row["tok"])
    if boundary_qb is None:  # whole corpus fits
        return m.select_columns([id_col, "quality", "n_tokens"])

    # everything strictly above the boundary bucket is selected whole;
    # the boundary bucket is ordered exactly for the residual budget
    residual = token_budget - spent
    bnd = (
        m.filter(expr=f"qb == {boundary_qb}")
        .select_columns([id_col, "quality", "n_tokens"])
        .to_pandas()
        .sort_values(["quality", id_col], ascending=[False, True])
    )
    cum = bnd["n_tokens"].cumsum()
    chosen = bnd[cum <= residual][id_col].to_numpy()
    chosen_ref = ray.put(np.sort(chosen))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        sel = ray.get(chosen_ref)
        in_b = np.isin(ids, sel)
        keep = (batch["qb"].to_numpy() > boundary_qb) | in_b
        return batch.filter(pa.array(keep)).select(
            [id_col, "quality", "n_tokens"]
        )

    return m.map_batches(pick, batch_format="pyarrow")


def assign_splits(ds, fractions: dict[str, float] | None = None,
                  id_col: str = "doc_id"):
    """Deterministic train/val/test split assignment — the eval-split
    primitive. Each row's split depends ONLY on its id (Knuth hash
    mapped to [0, 1), compared against cumulative fraction boundaries
    in sorted split-name order), so the assignment is reproducible at
    any parallelism and immune to corpus growth: adding documents
    never moves an existing document between splits (the property
    random shuffles lack — reshuffling leaks eval docs into train).

    ``fractions`` must sum to 1 (default 98/1/1 train/val/test).

    → the input Dataset with a ``split`` column appended."""
    fractions = fractions or {"test": 0.01, "train": 0.98, "val": 0.01}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    names = sorted(fractions)
    bounds = np.cumsum([fractions[n] for n in names])
    thresholds = np.floor(bounds * MOD).astype(np.int64)
    thresholds[-1] = MOD  # the last split absorbs float residue

    def assign(batch: pa.Table) -> pa.Table:
        h = (batch[id_col].to_numpy().astype(np.int64) * KNUTH) % MOD
        idx = np.searchsorted(thresholds, h, side="right")
        return batch.append_column(
            "split", pa.array(np.asarray(names, dtype=object)[idx])
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def shuffle_take(ds, n: int = 100, id_col: str = "doc_id"):
    """First ``n`` rows of the deterministic global training-order
    shuffle — shuffle order = ascending FNV-1a-64 of ``id_col`` (ties,
    i.e. hash collisions, break by id). The full shuffled ORDER is a
    sort by this key (the standard one-all-to-all global shuffle); the
    PREFIX needs no shuffle at all: each batch keeps its n smallest
    (hash, id) pairs and the driver merges O(batches x n) candidates —
    the top-k pattern, reproducible at any parallelism.

    The identical integer hash exists in DuckDB (``fnv64_int_sql``), so
    the gate twin is ``ORDER BY fnv(id), id LIMIT n`` — full-match.

    → pa.Table (rank, doc_id, shuffle_key) with shuffle_key the decimal
    string of the uint64 hash (exceeds Arrow int64).
    """
    import pandas as pd

    from excelastic_ray.hashing import fnv1a_int64

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        h = fnv1a_int64(ids)
        order = np.lexsort((ids, h))[:n]
        return pd.DataFrame({"id": ids[order], "h": h[order]})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    ids = parts["id"].to_numpy().astype(np.int64)
    h = parts["h"].to_numpy().astype(np.uint64)
    order = np.lexsort((ids, h))[:n]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            id_col: pa.array(ids[order], type=pa.int64()),
            "shuffle_key": pa.array(
                [str(x) for x in h[order]], type=pa.string()
            ),
        }
    )
