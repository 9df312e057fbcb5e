"""Reference-parity scalar type inference.

Mirrors the semantics of ``/root/reference/src/main/java/com/codingchili/
excelastic/model/DataTypes.java:15-57``:

- values are trimmed first (``DataTypes.java:24``)
- ``^[0-9]+$``          → int   (note: negatives do NOT match → stay string)
- ``^[0-9]+\\.[0-9]+$`` → float
- ``^(true|false)$``    → bool
- anything else         → string
- numeric narrowing: a float with zero fractional part → int
  (``DataTypes.java:51-57``)
- null / empty values are dropped (``ExcelParser.java:251-256``)

Two surfaces: per-cell (``parse_string`` — row-document parity, used by
tests mirroring ``TestDataType.java:14-43``) and per-column vectorized
(``infer_column`` — Arrow columns need one type, so a column gets the
narrowest type that classifies EVERY non-empty cell).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LONG_RE = re.compile(r"^[0-9]+$")
DOUBLE_RE = re.compile(r"^[0-9]+\.[0-9]+$")
BOOL_RE = re.compile(r"^(true|false)$")

# DuckDB-side equivalents (for oracle SQL parity checks).
LONG_SQL = "^[0-9]+$"
DOUBLE_SQL = "^[0-9]+\\.[0-9]+$"
BOOL_SQL = "^(true|false)$"


def parse_string(value) -> object:
    """Per-cell inference: '3000'→3000, '1.57'→1.57, 'true'→True,
    'meow'→'meow'. bytes are decoded first (``DataTypes.java:23-29``)."""
    if isinstance(value, (bytes, bytearray)):
        value = value.decode()
    value = str(value).strip()
    if LONG_RE.match(value):
        return int(value)
    if DOUBLE_RE.match(value):
        return float(value)
    if BOOL_RE.match(value):
        return value == "true"
    return value


def parse_numeric(value: float):
    """double → int when the fractional part is 0 (``DataTypes.java:51-57``)."""
    if float(value) % 1 == 0:
        return int(value)
    return float(value)


def classify(value: str) -> str:
    """Classification label for one trimmed string: long|double|bool|string."""
    value = value.strip()
    if LONG_RE.match(value):
        return "long"
    if DOUBLE_RE.match(value):
        return "double"
    if BOOL_RE.match(value):
        return "bool"
    return "string"


def classify_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized per-cell classification of a string column."""
    trimmed = pc.utf8_trim_whitespace(arr)
    is_long = pc.match_substring_regex(trimmed, LONG_RE.pattern)
    is_double = pc.match_substring_regex(trimmed, DOUBLE_RE.pattern)
    is_bool = pc.match_substring_regex(trimmed, BOOL_RE.pattern)
    out = np.full(len(trimmed), "string", dtype=object)
    out[np.asarray(is_bool.combine_chunks() if isinstance(is_bool, pa.ChunkedArray) else is_bool)] = "bool"
    out[np.asarray(is_double.combine_chunks() if isinstance(is_double, pa.ChunkedArray) else is_double)] = "double"
    out[np.asarray(is_long.combine_chunks() if isinstance(is_long, pa.ChunkedArray) else is_long)] = "long"
    return pa.array(out, type=pa.string())


def infer_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Column-level inference: cast a string column to int64 / float64 /
    bool when every non-null, non-empty cell classifies that way; else keep
    string. Empty cells become nulls (the dropped-cell analog)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(arr.cast(pa.string()))
    empty = pc.or_kleene(pc.is_null(trimmed), pc.equal(trimmed, ""))
    vals = pc.if_else(empty, pa.nulls(len(trimmed), pa.string()), trimmed)
    present = pc.invert(pc.is_null(vals))
    n_present = pc.sum(present).as_py() or 0
    if n_present == 0:
        return vals

    def _all_match(pattern: str) -> bool:
        m = pc.match_substring_regex(vals, pattern)
        return (pc.sum(pc.and_kleene(m, present)).as_py() or 0) == n_present

    if _all_match(r"^[0-9]+$"):
        return vals.cast(pa.int64())
    if _all_match(r"^[0-9]+(\.[0-9]+)?$"):
        # mixed long/double column → double (narrowing checked below)
        casted = vals.cast(pa.float64())
        return casted
    if _all_match(r"^(true|false)$"):
        return pc.equal(vals, "true")
    return vals


def infer_table(table: pa.Table) -> pa.Table:
    """Apply ``infer_column`` to every string column of a table."""
    cols = []
    for name in table.column_names:
        col = table.column(name)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            cols.append(infer_column(col))
        else:
            cols.append(col)
    return pa.table(dict(zip(table.column_names, cols)))
