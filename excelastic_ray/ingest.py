"""Named ingest pipelines + mapping presets — the ``--pipeline`` /
``--mapping`` import parameters of the reference
(``ImportEvent.java:19-29,125-146``: the CLI and the upload form carry
an ES ingest-pipeline id and a type-mapping name through to the
writer).  Re-expressed natively:

- a **pipeline** is a named chain of batch UDFs (Arrow table → Arrow
  table) applied between read and validation — exactly the
  ``transforms`` hook ``build_index`` already exposes
  (``index/build.py``), which is the ES ingest-processor position.
  Each stage is a pure vectorized map (no shuffle, no state), so a
  pipeline adds zero exchanges to the build.
- a **mapping** is a named ``IndexConfig`` preset (which columns are
  tokenized, which become per-field streams, which are filter-only
  attrs) — the analog of choosing an ES type mapping.

Both registries are extensible (``register_pipeline`` /
``register_mapping``) — the reference's extension story is "point at
an ES pipeline/mapping you created"; here you register a Python
callable or a config preset.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from excelastic_ray.config import IndexConfig

# -- pipeline stages (batch UDFs) -----------------------------------------


def redact_pii(batch: pa.Table) -> pa.Table:
    """Mask emails / long digit runs / IPs in ``text`` (RE2, C-level)."""
    from excelastic_ray.pipelines.scrub import DEFAULT_RULES

    col = pc.cast(batch["text"], pa.string())
    for pat, repl in DEFAULT_RULES:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    return batch.set_column(
        batch.column_names.index("text"), "text", col
    )


def strip_whitespace(batch: pa.Table) -> pa.Table:
    """Trim + collapse internal whitespace runs in ``text``."""
    col = pc.utf8_trim_whitespace(pc.cast(batch["text"], pa.string()))
    col = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    return batch.set_column(
        batch.column_names.index("text"), "text", col
    )


def drop_empty_text(batch: pa.Table) -> pa.Table:
    """Drop rows whose ``text`` is null/empty after trimming (the
    reference skips empty cells, ``ExcelParser.java:251-256``)."""
    col = pc.utf8_trim_whitespace(pc.cast(batch["text"], pa.string()))
    keep = pc.and_kleene(col.is_valid(), pc.not_equal(col, ""))
    return batch.filter(pc.fill_null(keep, False))


PIPELINES: dict[str, list] = {
    "redact_pii": [redact_pii],
    "strip_whitespace": [strip_whitespace],
    "drop_empty": [drop_empty_text],
    # the reference's typical pre-index hygiene chain
    "clean": [strip_whitespace, drop_empty_text],
}


def register_pipeline(name: str, stages: list) -> None:
    if not name or not all(callable(s) for s in stages):
        raise ValueError("pipeline = non-empty name + callable stages")
    PIPELINES[name] = list(stages)


def resolve_pipelines(spec: str | None) -> list:
    """Comma-separated pipeline names → flat transform list (order
    preserved; unknown names raise, matching the reference surfacing
    an unknown ES pipeline id as an import error)."""
    if not spec:
        return []
    out = []
    for name in spec.split(","):
        name = name.strip()
        if name not in PIPELINES:
            raise KeyError(
                f"unknown ingest pipeline {name!r}; "
                f"registered: {sorted(PIPELINES)}"
            )
        out.extend(PIPELINES[name])
    return out


# -- mapping presets -------------------------------------------------------

MAPPINGS: dict[str, dict] = {
    # catch-all text stream only; role/tool/ts remain filter attrs
    "default": {},
    # ES dynamic-mapping analog: role/tool as their own field streams
    "fielded": {"field_index_fields": ("role", "tool")},
    # index-only (no stored _source): smallest footprint
    "no_source": {"store_source": False},
    # ES english-analyzer mapping: stopword removal + light stemming on
    # the catch-all stream (the reference's --mapping selects ES-side
    # analysis exactly like this, ImportEvent.java:43,60)
    "english": {"analyzer": "english"},
}


def register_mapping(name: str, overrides: dict) -> None:
    IndexConfig(**overrides)  # validate eagerly
    MAPPINGS[name] = dict(overrides)


def resolve_mapping(name: str | None, base: IndexConfig | None = None
                    ) -> IndexConfig:
    """Mapping name → IndexConfig (overrides applied over ``base``)."""
    if not name:
        return base or IndexConfig()
    if name not in MAPPINGS:
        raise KeyError(
            f"unknown mapping {name!r}; registered: {sorted(MAPPINGS)}"
        )
    d = (base or IndexConfig()).to_dict()
    d.update(MAPPINGS[name])
    return IndexConfig.from_dict(d)
