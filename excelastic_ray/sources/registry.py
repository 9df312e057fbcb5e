"""Input-format registry — the ``ParserFactory`` analog.

Reference: extension → parser registry with self-registration and typed
errors (``/root/reference/src/main/java/com/codingchili/excelastic/model/
ParserFactory.java:13-61``; errors ``InvalidFileNameException.java:16``,
``UnsupportedFileTypeException.java:16``). Here a reader is any callable
``(path, **options) -> ray.data.Dataset``; this is the user-extension
surface for new input formats.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


class InvalidFileNameError(ValueError):
    """Filename has no extension (``ParserFactory.java:41-44`` analog)."""


class UnsupportedFileTypeError(ValueError):
    """No reader registered for the extension (``ParserFactory.java:47-52``)."""


_READERS: dict[str, Callable[..., Any]] = {}


def register_reader(extension: str, reader: Callable[..., Any]) -> None:
    """Register a reader for a dot-less extension, e.g. ``parquet``."""
    _READERS[extension.lower().lstrip(".")] = reader


def get_by_filename(filename: str) -> Callable[..., Any]:
    if "." not in filename.rsplit("/", 1)[-1]:
        raise InvalidFileNameError(f"file name {filename!r} has no extension")
    ext = filename.rsplit(".", 1)[-1].lower()
    try:
        return _READERS[ext]
    except KeyError:
        raise UnsupportedFileTypeError(f"no reader registered for .{ext}") from None


def read(path: str, **options: Any):
    """Dispatch a path to its registered reader."""
    return get_by_filename(path)(path, **options)


def registered_extensions() -> list[str]:
    return sorted(_READERS)


def _register_defaults() -> None:
    # Imported lazily so this module stays importable without Ray.
    def _read_parquet(path: str, **options: Any):
        import ray.data as rd

        return rd.read_parquet(path, **options)

    register_reader("parquet", _read_parquet)

    from excelastic_ray.sources.csv import read_csv_inferred

    register_reader("csv", read_csv_inferred)

    from excelastic_ray.sources.xlsx import read_xlsx

    register_reader("xlsx", read_xlsx)

    from excelastic_ray.sources.xls import read_xls

    register_reader("xls", read_xls)

    from excelastic_ray.sources.jsonl import read_jsonl

    register_reader("ndjson", read_jsonl)
    register_reader("jsonl", read_jsonl)
    register_reader("json", read_jsonl)


_register_defaults()
