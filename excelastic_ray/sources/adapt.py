"""Adapt row-shaped uploads to the transcript index schema.

The reference turns every spreadsheet row into one JSON document and
indexes it (``ExcelParser.java:222-261`` → ``ElasticWriter``). Our index
is keyed by the transcript schema, so an uploaded table maps to:

    conv_id  = "<prefix>_<row // max_turns>"   (synthetic conversations
    turn_idx = row % max_turns                  of max_turns docs each)
    text     = "col=value ..." for the row's non-null cells — null/empty
               cells are DROPPED, mirroring the reference's
               null-key-dropping (ExcelParser.java:251-256)

Uploads are single-file, single-node sized by the reference's own
``FileParser`` contract (mmap'd spreadsheets), so the row numbering here
is a driver-side pass; parquet corpora use ``build_index`` directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def table_as_transcripts(tbl: pa.Table, conv_prefix: str = "imports",
                         max_turns: int = 4096) -> pa.Table:
    n = tbl.num_rows
    cols = tbl.column_names
    pylists = {c: tbl[c].to_pylist() for c in cols}
    texts = []
    for i in range(n):
        parts = []
        for c in cols:
            v = pylists[c][i]
            if v is None or (isinstance(v, str) and not v.strip()):
                continue  # dropped like the reference's null cells
            parts.append(f"{c}={v}")
        texts.append(" ".join(parts))
    rows = np.arange(n, dtype=np.int64)
    conv = np.array(
        [f"{conv_prefix}_{i:08d}" for i in (rows // max_turns)], dtype=object
    )
    ts = np.full(n, np.datetime64("1970-01-01T00:00:00", "us"))
    return pa.table(
        {
            "conv_id": pa.array(conv, type=pa.string()),
            "turn_idx": pa.array((rows % max_turns).astype(np.int32)),
            "role": pa.array([""] * n, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array([""] * n, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def dataset_as_transcripts(ds, conv_prefix: str = "imports",
                           max_turns: int = 4096):
    """(Dataset | pa.Table) → (transcript Dataset, n_rows)."""
    import ray.data as rd

    if isinstance(ds, pa.Table):
        tbl = ds
    else:
        tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    out = table_as_transcripts(tbl, conv_prefix, max_turns)
    return rd.from_arrow(out), out.num_rows
