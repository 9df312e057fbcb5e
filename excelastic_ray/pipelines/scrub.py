"""Text scrubbing / redaction — the PII-masking stage of a
training-data pipeline, fully vectorized.

Each rule is a ``(RE2 pattern, replacement)`` pair applied globally per
row with ``pyarrow.compute.replace_substring_regex`` (Arrow's RE2 —
the SAME regex engine DuckDB uses, so the SQL twin
``regexp_replace(x, pat, repl, 'g')`` is exact). Per-row match counts
come from ``count_substring_regex`` so redaction volume is auditable
(no silent scrubbing).

At 100 TB this is a pure map stage: no shuffle, no state, RE2 runs
C-level over Arrow string buffers.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: Default rules: emails, long digit runs (ids/phones), IPv4 addresses.
DEFAULT_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<email>"),
    (r"\b\d{6,}\b", "<num>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<ip>"),
)


def redact_batch(batch: pa.Table, rules=DEFAULT_RULES, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    col = batch[text_col]
    total = None
    for pattern, replacement in rules:
        n = pc.count_substring_regex(col, pattern=pattern)
        total = n if total is None else pc.add(total, n)
        col = pc.replace_substring_regex(
            col, pattern=pattern, replacement=replacement
        )
    return pa.table(
        {
            id_col: batch[id_col],
            "clean_text": col,
            "n_redactions": total.cast(pa.int64()),
        }
    )


def redact(ds, rules=DEFAULT_RULES, id_col: str = "doc_id",
           text_col: str = "text"):
    """→ Dataset (id, clean_text, n_redactions)."""
    return ds.map_batches(
        lambda b: redact_batch(b, rules, id_col, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )
