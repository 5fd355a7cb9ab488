"""Schema-driven JSON → row coercion (≙ flink-json deserialization).

Reference semantics (``HttpInputFormatProvider.scala:163-172,186-202``,
``JsonRowDataDeserializationSchema`` with ``failOnMissingField=false,
ignoreParseErrors=false, TimestampFormat.SQL``):

- The schema is **declared** (never inferred); JSON fields match declared
  columns by name; extra JSON fields are silently ignored.
- A missing field (or JSON null) yields SQL NULL.
- A malformed value fails the job (``RuntimeError("Failed to deserialize
  JSON node: ...")``).
- Timestamps use SQL format ``yyyy-MM-dd HH:mm:ss[.fff]`` (ISO 'T' separator
  also accepted by flink-json's SQL parser fallback).
- Nested ROW columns recurse (nested projection supported,
  ``HttpLookupTableSource.scala:70``).
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)


def _parse_sql_timestamp(text: str) -> _dt.datetime:
    t = text.strip().replace("T", " ")
    # yyyy-MM-dd HH:mm:ss[.fraction][Z]
    if t.endswith("Z"):
        t = t[:-1]
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
        try:
            return _dt.datetime.strptime(t, fmt)
        except ValueError:
            continue
    raise ValueError(f"not a SQL-format timestamp: {text!r}")


def coerce_value(value: Any, dtype: DataType) -> Any:
    """Coerce one JSON value to the declared Spark type (strict)."""
    if value is None:
        return None
    if isinstance(dtype, StringType):
        if isinstance(value, str):
            return value
        # flink-json serializes non-textual nodes back to JSON text
        return json.dumps(value, separators=(",", ":"))
    if isinstance(dtype, BooleanType):
        if isinstance(value, bool):
            return value
        if isinstance(value, str) and value.lower() in ("true", "false"):
            return value.lower() == "true"
        raise ValueError(f"cannot cast {value!r} to BOOLEAN")
    if isinstance(dtype, (IntegerType, LongType, ShortType)):
        if isinstance(value, bool):
            raise ValueError(f"cannot cast {value!r} to integer")
        if isinstance(value, int):
            return value
        if isinstance(value, str):
            return int(value.strip())
        if isinstance(value, float) and value.is_integer():
            return int(value)
        raise ValueError(f"cannot cast {value!r} to integer")
    if isinstance(dtype, (DoubleType, FloatType)):
        if isinstance(value, bool):
            raise ValueError(f"cannot cast {value!r} to double")
        if isinstance(value, (int, float)):
            return float(value)
        if isinstance(value, str):
            return float(value.strip())
        raise ValueError(f"cannot cast {value!r} to double")
    if isinstance(dtype, DecimalType):
        import decimal

        return decimal.Decimal(str(value))
    if isinstance(dtype, TimestampType):
        if isinstance(value, str):
            return _parse_sql_timestamp(value)
        raise ValueError(f"cannot cast {value!r} to TIMESTAMP")
    if isinstance(dtype, DateType):
        if isinstance(value, str):
            return _dt.date.fromisoformat(value.strip())
        raise ValueError(f"cannot cast {value!r} to DATE")
    if isinstance(dtype, StructType):
        if isinstance(value, dict):
            return coerce_object(value, dtype)
        raise ValueError(f"cannot cast {value!r} to ROW")
    if isinstance(dtype, ArrayType):
        if isinstance(value, list):
            return [coerce_value(v, dtype.elementType) for v in value]
        raise ValueError(f"cannot cast {value!r} to ARRAY")
    if isinstance(dtype, MapType):
        if isinstance(value, dict):
            return {k: coerce_value(v, dtype.valueType) for k, v in value.items()}
        raise ValueError(f"cannot cast {value!r} to MAP")
    raise ValueError(f"unsupported declared type: {dtype.simpleString()}")


def coerce_object(node: Any, schema: StructType) -> tuple:
    """JSON object → row tuple per declared schema; missing field → None."""
    if not isinstance(node, dict):
        raise ValueError(f"expected JSON object, got {type(node).__name__}")
    return tuple(coerce_value(node.get(f.name), f.dataType) for f in schema.fields)


def deserialize_nodes(nodes: list[Any], schema: StructType) -> list[tuple]:
    """Deserialize row-nodes; per-node failure raises with the node text
    (≙ ``deserializeNode``, ``HttpInputFormatProvider.scala:163-172``)."""
    out: list[tuple] = []
    for node in nodes:
        try:
            out.append(coerce_object(node, schema))
        except Exception as e:
            pretty = json.dumps(node, indent=2, default=str)
            raise RuntimeError(f"Failed to deserialize JSON node: {pretty}") from e
    return out
