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
                   source_col: str = "source", id_col: str = "doc_id"):
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

    → Dataset (id, source) of survivors."""
    counts: dict[str, int] = {}
    for r in ds.groupby(source_col).count().take_all():  # tiny: one row
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
