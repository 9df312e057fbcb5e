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
