"""Type-DSL parsing + evolution lattice (SURVEY.md §1.2; reference
convert_val docetl/operations/utils/validation.py:110-144)."""

import pytest
from pyspark.sql import types as T

from docetl_spark.schema import SchemaError, enum_values, merge_schemas, parse_output_schema, parse_type, widen


def test_scalar_aliases():
    assert parse_type("string") == T.StringType()
    assert parse_type("str") == T.StringType()
    assert parse_type("varchar") == T.StringType()
    assert parse_type("int") == T.LongType()
    assert parse_type("integer") == T.LongType()
    assert parse_type("float") == T.DoubleType()
    assert parse_type("decimal") == T.DoubleType()
    assert parse_type("bool") == T.BooleanType()


def test_enum_maps_to_string():
    assert parse_type("enum[a, b, c]") == T.StringType()
    assert enum_values("enum[a, b, c]") == ["a", "b", "c"]
    assert enum_values("string") is None


def test_nested_list_struct():
    t = parse_type("list[{name: string, hobbies: list[string]}]")
    assert isinstance(t, T.ArrayType)
    st = t.elementType
    assert isinstance(st, T.StructType)
    assert st["name"].dataType == T.StringType()
    assert st["hobbies"].dataType == T.ArrayType(T.StringType())


def test_output_schema_dict():
    st = parse_output_schema({"title": "string", "count": "int", "scores": "list[float]"})
    assert st.fieldNames() == ["title", "count", "scores"]
    assert st["scores"].dataType == T.ArrayType(T.DoubleType())


def test_bad_spec_raises():
    with pytest.raises(SchemaError):
        parse_type("timestamp")


def test_widen_lattice():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.DoubleType(), T.IntegerType()) == T.DoubleType()
    with pytest.raises(SchemaError):
        widen(T.StringType(), T.LongType())


def test_widen_float_diamond():
    """long and float are INCOMPARABLE (long->float truncates >2^24,
    float->long drops fractions): their LUB is double, never float. A
    totally-ordered rank table gets this wrong silently."""
    assert widen(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.DoubleType(), T.FloatType()) == T.DoubleType()
    assert widen(T.LongType(), T.FloatType()) == T.DoubleType()
    assert widen(T.FloatType(), T.LongType()) == T.DoubleType()
    assert widen(T.IntegerType(), T.FloatType()) == T.DoubleType()
    assert widen(T.FloatType(), T.FloatType()) == T.FloatType()


def test_merge_schemas_additive_and_widening():
    cur = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    inc = T.StructType([T.StructField("a", T.LongType()), T.StructField("c", T.BooleanType())])
    out = merge_schemas(cur, inc)
    assert out.fieldNames() == ["a", "b", "c"]
    assert out["a"].dataType == T.LongType()
    assert out["c"].dataType == T.BooleanType()
