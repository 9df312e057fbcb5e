"""CSV ingest with reference-parity semantics.

Mirrors the observable behavior of ``/root/reference/src/main/java/com/
codingchili/excelastic/model/CSVParser.java``:

- header row read first; quotes stripped, names trimmed; empty header
  cells synthesized as ``header_<N>`` (``CSVParser.java:124-127``)
- a title-row ``offset`` (1-based, default 1) skips leading rows before
  the header (``ImportEvent.java:59``; Excel semantics
  ``ExcelParser.java:39``)
- quoted fields may contain commas (``CSVParser.java:200-203``); empty
  lines are ignored (``CSVParser.java:188-190``) — both handled by the
  Arrow CSV reader
- every row must have exactly as many values as the header, else an error
  naming the row (``ColumnsHeadersMismatchException.java:15-18``) — Arrow
  raises on ragged rows at read time
- per-cell type inference per ``DataTypes.java:15-45`` → per-column
  narrowest type (see ``datatypes.infer_column``)

The reference validates the whole file before indexing (``README.md:15``);
here the read itself is the validation pass — any structural error
surfaces before the index build consumes a single row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

from excelastic_ray.sources.datatypes import infer_table


def _normalize_headers(names: list[str]) -> list[str]:
    out = []
    for i, name in enumerate(names):
        name = (name or "").replace('"', "").strip()
        out.append(name if name else f"header_{i}")
    return out


def read_csv_table(path: str, offset: int = 1) -> pa.Table:
    """Read one CSV file → typed Arrow table (driver-side / per-task)."""
    table = pacsv.read_csv(
        path,
        read_options=pacsv.ReadOptions(skip_rows=max(offset - 1, 0), autogenerate_column_names=False),
        parse_options=pacsv.ParseOptions(ignore_empty_lines=True),
        convert_options=pacsv.ConvertOptions(
            # Read everything as string; inference follows the reference's
            # regexes, not Arrow's.
            column_types=None,
            strings_can_be_null=False,
        ),
    )
    # Force all columns to string before reference-style inference.
    cols = {}
    names = _normalize_headers(table.column_names)
    for name, col in zip(names, table.columns):
        cols[name] = col.cast(pa.string()) if not pa.types.is_string(col.type) else col
    return infer_table(pa.table(cols))


def read_csv_inferred(path: str, offset: int = 1, **kwargs):
    """Ray Dataset over one or more CSV files with reference-parity typing.

    Implemented as read → one vectorized ``map_batches`` inference pass.
    For a single small file, prefer ``read_csv_table``.
    """
    import ray.data as rd

    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(skip_rows=max(offset - 1, 0)),
        parse_options=pacsv.ParseOptions(ignore_empty_lines=True),
        convert_options=pacsv.ConvertOptions(column_types=None),
        **kwargs,
    )

    def _infer(batch: pa.Table) -> pa.Table:
        cols = {}
        names = _normalize_headers(batch.column_names)
        for name, col in zip(names, batch.columns):
            cols[name] = col.cast(pa.string())
        return infer_table(pa.table(cols))

    return ds.map_batches(_infer, batch_format="pyarrow")
