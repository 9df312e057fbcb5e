"""XLSX source parity vs the reference's own golden fixtures
(/root/reference/src/test/resources, asserted per TestParser.java)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from excelastic_ray.sources.xlsx import ParserError, read_xlsx_table

FIXTURES = "/root/reference/src/test/resources"


def test_golden_xlsx_offset_title_row():
    """TestParser.java:117-166: title row at offset 5, 2 typed rows:
    name="test_%d", flag=(i+1)%2==0, integer=(i+1)*2, float=(i+1)*0.5."""
    t = read_xlsx_table(f"{FIXTURES}/test.xlsx", offset=5)
    assert t.column_names == ["name", "flag", "integer", "float"]
    assert t.schema.field("name").type == pa.string()
    assert t.schema.field("flag").type == pa.bool_()
    assert t.schema.field("integer").type == pa.int64()
    assert t.schema.field("float").type == pa.float64()
    d = t.to_pydict()
    assert d["name"] == ["test_0", "test_1"]
    assert d["flag"] == [False, True]
    assert d["integer"] == [2, 4]
    assert d["float"] == [0.5, 1.0]


def test_invalid_xlsx_raises_parser_error():
    """TestParser.java:33-38: invalid bytes → ParserException analog."""
    with pytest.raises(ParserError):
        read_xlsx_table(f"{FIXTURES}/invalid.xlsx")


def test_registry_dispatch():
    from excelastic_ray.sources import registry

    assert "xlsx" in registry.registered_extensions()
    assert "xls" in registry.registered_extensions()
    with pytest.raises(NotImplementedError):
        registry.get_by_filename("legacy.xls")("legacy.xls")
