"""Segment / shard artifact layout + manifest IO.

Index directory layout (all writes are atomic: temp file/dir + rename —
the analog of the reference's validate-before-write guarantee that an
aborted import never leaves the index "in an undesired state",
``/root/reference/README.md:15``):

    <index_dir>/
      convs.parquet                 sorted distinct conv_ids; row pos == conv_rank
      segments/chunk=<C>/postings.parquet   level-0 segment for doc-range chunk C
      segments/chunk=<C>/MANIFEST.json      .done marker: counters + lineage
      shards/shard=<S>/postings.parquet     merged queryable shard S
      shards/shard=<S>/MANIFEST.json
      docstore/                      optional materialized source (ES `_source` analog)
      manifest.json                  global: config, N, avgdl, chunk/shard census

Per-chunk manifests carry the per-partition lineage + metrics required
by the north rule: turns tokenized, postings emitted, bytes compressed.
A resumed build scans for MANIFEST.json files and skips completed
chunks/shards entirely (the completed-chunk filter is applied *before*
tokenization, so resumed work costs nothing for finished partitions).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "MANIFEST.json"

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("n_blocks", pa.int32()),
        ("postings", pa.large_binary()),
        ("blockmax", pa.large_binary()),
        # delta-varint token positions per posting (empty when the index
        # was built with store_positions=False)
        ("positions", pa.large_binary()),
    ]
)


def chunk_dir(index_dir: str, chunk: int) -> str:
    return os.path.join(index_dir, "segments", f"chunk={chunk:08d}")


def shard_dir(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, "shards", f"shard={shard:05d}")


def atomic_write_json(path: str, obj: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def atomic_write_parquet(path: str, table: pa.Table, **write_kwargs) -> int:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    pq.write_table(table, tmp, compression="zstd", **write_kwargs)
    os.replace(tmp, path)
    return os.path.getsize(path)


def read_manifest(dir_path: str) -> dict | None:
    path = os.path.join(dir_path, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_done(dir_path: str, payload: dict) -> None:
    atomic_write_json(os.path.join(dir_path, MANIFEST), payload)


def completed_chunks(index_dir: str) -> dict[int, dict]:
    """chunk id → manifest for every finished level-0 segment."""
    seg_root = os.path.join(index_dir, "segments")
    out: dict[int, dict] = {}
    if not os.path.isdir(seg_root):
        return out
    for name in os.listdir(seg_root):
        if not name.startswith("chunk="):
            continue
        m = read_manifest(os.path.join(seg_root, name))
        if m is not None:
            out[int(name.split("=")[1])] = m
    return out


def completed_shards(index_dir: str) -> dict[int, dict]:
    root = os.path.join(index_dir, "shards")
    out: dict[int, dict] = {}
    if not os.path.isdir(root):
        return out
    for name in os.listdir(root):
        if not name.startswith("shard="):
            continue
        m = read_manifest(os.path.join(root, name))
        if m is not None:
            out[int(name.split("=")[1])] = m
    return out


def docstore_files(index_dir: str) -> list[str]:
    """Chunk-ordered docstore slices (segments/chunk=*/store.parquet)."""
    seg_root = os.path.join(index_dir, "segments")
    out = []
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            p = os.path.join(seg_root, name, "store.parquet")
            if name.startswith("chunk=") and os.path.exists(p):
                out.append(p)
    return out


def read_docstore(index_dir: str, columns: list[str] | None = None) -> pa.Table:
    """Materialize the docstore (ES `_source` analog) — test/tooling
    scale; at corpus scale read the per-chunk files as a Dataset."""
    files = docstore_files(index_dir)
    if not files:
        raise FileNotFoundError(f"no docstore slices under {index_dir}")
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


def write_chunk_census(index_dir: str, all_chunks: dict[int, dict]) -> None:
    """Per-chunk counters + lineage as a parquet table (the global
    manifest stays O(1): at 10^6 chunks an embedded-JSON census is
    ~200 MB; a parquet census is a few MB and scans columnar)."""
    rows = sorted(all_chunks.items())
    cols: dict[str, list] = {
        "chunk": [c for c, _ in rows],
        "n_docs": [m["n_docs"] for _, m in rows],
        "total_dl": [m["total_dl"] for _, m in rows],
        "n_terms": [m["n_terms"] for _, m in rows],
        "n_postings": [m["n_postings"] for _, m in rows],
        "bytes_compressed": [m["bytes_compressed"] for _, m in rows],
        "conv_rank_start": [m.get("lineage", {}).get("conv_rank_start", -1)
                            for _, m in rows],
        "conv_rank_end": [m.get("lineage", {}).get("conv_rank_end", -1)
                          for _, m in rows],
    }
    atomic_write_parquet(
        os.path.join(index_dir, "chunks.parquet"), pa.table(cols)
    )


def read_chunk_census(index_dir: str) -> pa.Table:
    return pq.read_table(os.path.join(index_dir, "chunks.parquet"))


def load_global_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        return json.load(f)


def save_global_manifest(index_dir: str, manifest: dict) -> None:
    atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
