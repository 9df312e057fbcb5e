"""Mirrors /root/reference/src/test/java/com/codingchili/TestDataType.java:14-43."""
import pyarrow as pa

from excelastic_ray.sources.datatypes import (
    classify,
    infer_column,
    infer_table,
    parse_numeric,
    parse_string,
)


def test_parse_string_reference_goldens():
    assert parse_string("false") is False
    assert parse_string("true") is True
    assert parse_string("3000") == 3000 and isinstance(parse_string("3000"), int)
    assert parse_string("1.57") == 1.57 and isinstance(parse_string("1.57"), float)
    assert parse_string("meow") == "meow"
    assert parse_string(b"42") == 42
    assert parse_string("  7  ") == 7  # trimmed first (DataTypes.java:24)


def test_parse_numeric_narrowing():
    assert parse_numeric(3.14) == 3.14
    assert parse_numeric(3.0) == 3 and isinstance(parse_numeric(3.0), int)


def test_negative_numbers_stay_strings():
    # Reference regex ^[0-9]+$ rejects negatives (DataTypes.java:15).
    assert parse_string("-5") == "-5"
    assert classify("-5") == "string"
    assert classify("007") == "long"


def test_infer_column_types():
    assert infer_column(pa.array(["1", "2", " 3 "])).type == pa.int64()
    assert infer_column(pa.array(["1.5", "2.25"])).type == pa.float64()
    assert infer_column(pa.array(["1", "2.5"])).type == pa.float64()  # mixed → double
    assert infer_column(pa.array(["true", "false"])).type == pa.bool_()
    assert infer_column(pa.array(["true", "meow"])).type == pa.string()
    col = infer_column(pa.array(["1", "", "3"]))  # empty cell → null (dropped)
    assert col.type == pa.int64() and col[1].as_py() is None


def test_infer_table_reference_csv_goldens():
    # The test.csv fixture semantics (TestParser.java:150-162).
    t = pa.table({
        "name": ["test_0", "test_1"],
        "flag": ["false", "true"],
        "integer": ["2", "4"],
        "float": ["0.5", "1.0"],
    })
    out = infer_table(t)
    assert out.column("name").to_pylist() == ["test_0", "test_1"]
    assert out.column("flag").to_pylist() == [False, True]
    assert out.column("integer").to_pylist() == [2, 4]
    assert out.column("float").to_pylist() == [0.5, 1.0]
    assert out.column("integer").type == pa.int64()
    assert out.column("float").type == pa.float64()
