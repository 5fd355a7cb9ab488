"""Property-based tests (hypothesis) for the JSON→row coercion layer:
round-trip fidelity, missing/null handling, and strictness invariants hold
for arbitrary generated payloads — not just the golden fixtures."""

import datetime as dt
import json
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_http_full_cache_connector_spark.rows import (
    coerce_object,
    coerce_value,
    deserialize_nodes,
)

SCHEMA = StructType(
    [
        StructField("i", IntegerType()),
        StructField("l", LongType()),
        StructField("d", DoubleType()),
        StructField("s", StringType()),
        StructField("b", BooleanType()),
    ]
)

payloads = st.fixed_dictionaries(
    {},
    optional={
        "i": st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "l": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.none()
        | st.floats(allow_nan=False, allow_infinity=False, width=64),
        "s": st.none() | st.text(max_size=40),
        "b": st.none() | st.booleans(),
        "extra_field": st.text(max_size=10),  # always ignorable
    },
)


@settings(max_examples=200, deadline=None)
@given(node=payloads)
def test_coercion_round_trips_arbitrary_payloads(node):
    row = coerce_object(node, SCHEMA)
    assert len(row) == len(SCHEMA.fields)
    for value, field in zip(row, SCHEMA.fields):
        orig = node.get(field.name)
        if orig is None:
            assert value is None  # missing OR null -> SQL NULL
        elif field.name == "d":
            assert value == float(orig)
        else:
            assert value == orig


@settings(max_examples=100, deadline=None)
@given(
    ts=st.datetimes(
        min_value=dt.datetime(1900, 1, 1),
        max_value=dt.datetime(2100, 1, 1),
    )
)
def test_sql_timestamp_round_trip(ts):
    ts = ts.replace(microsecond=(ts.microsecond // 1000) * 1000)  # ms precision
    text = ts.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    assert coerce_value(text, TimestampType()) == ts
    # ISO 'T' separator accepted too
    assert coerce_value(text.replace(" ", "T"), TimestampType()) == ts


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(
        st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=8
    )
)
def test_array_coercion(values):
    out = coerce_value(values, ArrayType(IntegerType()))
    assert out == values


@settings(max_examples=100, deadline=None)
@given(node=payloads)
def test_deserialize_nodes_failure_names_the_node(node):
    bad = dict(node)
    bad["i"] = "not-an-int"
    with pytest.raises(RuntimeError, match="Failed to deserialize JSON node"):
        deserialize_nodes([bad], SCHEMA)


@settings(max_examples=50, deadline=None)
@given(num=st.floats(allow_nan=False, allow_infinity=False))
def test_int_column_rejects_fractional_floats(num):
    if num.is_integer():
        assert coerce_value(num, LongType()) == int(num)
    else:
        with pytest.raises(ValueError):
            coerce_value(num, LongType())


def test_bool_not_accepted_as_number():
    with pytest.raises(ValueError):
        coerce_value(True, IntegerType())
    with pytest.raises(ValueError):
        coerce_value(False, DoubleType())


@settings(max_examples=50, deadline=None)
@given(obj=st.dictionaries(st.text(max_size=5), st.integers(), max_size=4))
def test_string_column_serializes_non_text_json(obj):
    out = coerce_value(obj, StringType())
    assert json.loads(out) == obj
