"""NDJSON / JSON-lines ingest with reference-parity typing.

The reference streams its documents to Elasticsearch as NDJSON bulk
bodies (``ElasticWriter.java:158-184``) — this reader closes the loop
by accepting that same line-delimited JSON shape as an INPUT format
(one JSON object per line = one document, exactly the row→doc model).
String values go through the same ``DataTypes`` regex inference as CSV
cells (``DataTypes.java:31-45``); native JSON numbers/bools pass
through with int-vs-float narrowing (``DataTypes.java:51-57``).
"""

from __future__ import annotations

import pyarrow as pa

from excelastic_ray.sources.datatypes import infer_table


def _stringify_then_infer(batch: pa.Table) -> pa.Table:
    cols = {}
    for name, col in zip(batch.column_names, batch.columns):
        if pa.types.is_string(col.type):
            cols[name] = col
        elif pa.types.is_floating(col.type) or pa.types.is_integer(col.type) \
                or pa.types.is_boolean(col.type):
            # native JSON scalars: keep, but narrow float→int when the
            # fraction is 0 (DataTypes.parseNumeric semantics)
            cols[name] = col
            continue
        else:
            cols[name] = col.cast(pa.string())
    # reference regex inference applies to the string columns only
    str_cols = {n: c for n, c in cols.items() if pa.types.is_string(c.type)}
    inferred = infer_table(pa.table(str_cols)) if str_cols else None
    out = {}
    for name in batch.column_names:
        if inferred is not None and name in inferred.column_names:
            out[name] = inferred[name]
        else:
            col = cols[name]
            if pa.types.is_floating(col.type):
                import pyarrow.compute as pc

                vals = col.combine_chunks() if isinstance(
                    col, pa.ChunkedArray
                ) else col
                whole = pc.all(
                    pc.or_kleene(
                        pc.is_null(vals),
                        pc.equal(pc.floor(vals), vals),
                    )
                ).as_py()
                col = col.cast(pa.int64()) if whole else col
            out[name] = col
    return pa.table(out)


def read_jsonl(path: str, **kwargs):
    """Ray Dataset over NDJSON file(s) with reference-parity typing."""
    import ray.data as rd

    ds = rd.read_json(path, **{k: v for k, v in kwargs.items()
                               if k != "offset"})
    return ds.map_batches(_stringify_then_infer, batch_format="pyarrow")


def read_jsonl_table(path: str) -> pa.Table:
    """Driver-side single-file read (golden-fixture scale)."""
    import pyarrow.json as pajson

    table = pajson.read_json(path)
    return _stringify_then_infer(table)
