"""Resumable partitioned Parquet export for pipeline outputs.

The index build already writes per-chunk atomic segments with manifests
(segments.py); this is the same discipline for GENERIC pipeline results
(filtered corpora, dedup survivors, scored docs): deterministic
hash-partitioned output, one directory per partition, atomic write +
MANIFEST.json per partition — a failed run re-executes only the missing
partitions, and finished partitions are dropped BEFORE the shuffle so a
resume costs nothing for completed work. Never one giant file.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from excelastic_ray.hashing import fnv1a_str_rows

MANIFEST = "MANIFEST.json"


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def completed_partitions(out_dir: str) -> dict[int, dict]:
    out: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        p = os.path.join(out_dir, name, MANIFEST)
        if os.path.exists(p):
            with open(p) as f:
                out[int(name.split("=")[1])] = json.load(f)
    return out


def export_partitioned(
    ds,
    out_dir: str,
    key_col: str,
    n_partitions: int = 64,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as ``out_dir/part=NNNNN/data.parquet`` partitioned
    by ``hash(key_col) % n_partitions``; each partition lands atomically
    (tmp file + rename) with a MANIFEST.json of its row count. With
    ``resume=True`` (default), partitions that already have a manifest
    are skipped — their rows are dropped in the keying map, BEFORE the
    shuffle. Returns {partitions_written, partitions_skipped, rows}.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = set(completed_partitions(out_dir)) if resume else set()
    skip = np.asarray(sorted(done), dtype=np.int64)

    def key(b: pa.Table) -> pa.Table:
        vals = b[key_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(vals.dtype, np.integer):
            with np.errstate(over="ignore"):
                h = (
                    vals.astype(np.int64).view(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                ) >> np.uint64(32)
        else:
            h = fnv1a_str_rows([str(v) for v in vals.tolist()])
        part = (h % np.uint64(n_partitions)).astype(np.int64)
        b = b.append_column("__part", pa.array(part))
        if len(skip):
            keep = ~np.isin(part, skip)
            if not keep.all():
                b = b.filter(pa.array(keep))
        return b

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"part": [], "rows": []})
        part = int(g["__part"].iloc[0])
        d = _part_dir(out_dir, part)
        os.makedirs(d, exist_ok=True)
        t = pa.Table.from_pandas(
            g.drop(columns="__part"), preserve_index=False
        )
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        os.close(fd)
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(d, "data.parquet"))
        m = {"part": part, "rows": int(t.num_rows)}
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(d, MANIFEST))
        return pd.DataFrame({"part": [part], "rows": [int(t.num_rows)]})

    written = (
        ds.map_batches(key, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(write_part, batch_format="pandas")
        .to_pandas()
    )
    all_parts = completed_partitions(out_dir)
    return {
        "partitions_written": int(len(written)),
        "partitions_skipped": len(done),
        "rows": int(sum(m["rows"] for m in all_parts.values())),
        "out_dir": out_dir,
    }


def read_export(out_dir: str) -> pa.Table:
    """Concatenate a (small) export for verification/tests; at scale
    read it as a Dataset via read_parquet(out_dir/part=*/data.parquet)."""
    parts = sorted(completed_partitions(out_dir))
    return pa.concat_tables(
        [
            pq.read_table(os.path.join(_part_dir(out_dir, p), "data.parquet"))
            for p in parts
        ]
    )
