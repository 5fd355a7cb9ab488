"""Flink-datagen-equivalent source shim (B7).

The reference's probe streams are Flink ``datagen`` tables
(``HttpLookupConnectorTest.scala:23-38``, ``...IntegrationTest.scala:112-128``):
rate-limited generators with per-field specs — random int min/max, random
string of a length, sequence start/end — plus a computed ``proc_time``.

Spark-first: built on the ``rate`` source (streaming) or ``spark.range``
(batch harness), with every generated field derived **declaratively** from
the monotonically increasing ``value`` column via built-in functions
(hash-based uniform draws, md5-based random strings).  Deterministic w.r.t.
``value`` — replayable after failure, unlike true RNG — and entirely
JVM-side (whole-stage codegen; no Python in the per-row path).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RandomInt:
    """``fields.X.kind=random`` over an int range (inclusive)."""

    min: int
    max: int


@dataclass(frozen=True)
class RandomDouble:
    """``fields.X.kind=random`` over a double range."""

    min: float
    max: float


@dataclass(frozen=True)
class RandomString:
    """``fields.X.length=N`` random hex-ish string."""

    length: int


@dataclass(frozen=True)
class Sequence:
    """``fields.X.kind=sequence`` from start to end (inclusive, then stops)."""

    start: int
    end: int


FieldSpec = RandomInt | RandomDouble | RandomString | Sequence


def _field_col(name: str, spec: FieldSpec, value: Column) -> Column:
    # Salt the draw with the field name so fields draw independently.
    # md5 (not Spark's murmur3 hash()) on purpose: md5 is bit-identical in
    # every engine, so the whole generator is re-expressible as ANSI SQL and
    # a DuckDB oracle can replay the exact draws — hash() would pin the
    # stream to Spark's private murmur3 seeding.  First 8 hex chars → a
    # uniform u32, plenty of entropy for test datagen.
    salted = F.conv(
        F.substring(F.md5(F.concat(value.cast("string"), F.lit(name))), 1, 8), 16, 10
    ).cast("long")
    if isinstance(spec, RandomInt):
        span = spec.max - spec.min + 1
        return (F.pmod(salted, F.lit(span)) + F.lit(spec.min)).cast("int")
    if isinstance(spec, RandomDouble):
        # uniform in [min, max): map the u32 to [0,1) then scale
        unit = (F.pmod(salted, F.lit(1_000_000)) / F.lit(1_000_000.0))
        return (F.lit(spec.min) + unit * F.lit(spec.max - spec.min)).cast("double")
    if isinstance(spec, RandomString):
        full = F.md5(F.concat(value.cast("string"), F.lit(name)))
        # md5 yields 32 hex chars; repeat for longer lengths
        repeats = spec.length // 32 + 1
        return F.substring(F.concat(*([full] * repeats)), 1, spec.length)
    if isinstance(spec, Sequence):
        return (value + F.lit(spec.start)).cast("int")
    raise ValueError(f"unsupported field spec: {spec!r}")


def _apply_fields(
    df: DataFrame,
    fields: dict[str, FieldSpec],
    with_proc_time: bool,
    clock: Column | None = None,
) -> DataFrame:
    value = F.col("value")
    cols = [_field_col(name, spec, value).alias(name) for name, spec in fields.items()]
    if with_proc_time:
        # proc_time is wall-clock PROCTIME() by default; tests/oracles can
        # inject a fixed clock column to make the stream hash-checkable
        cols.append((clock if clock is not None else F.current_timestamp()).alias("proc_time"))
    out = df.select(*cols)
    # A sequence field bounds the generated rows (Flink's sequence generator
    # emits exactly end-start+1 rows, then the source is exhausted).
    for name, spec in fields.items():
        if isinstance(spec, Sequence):
            out = out.where(F.col(name) <= F.lit(spec.end))
    return out


def datagen_stream(
    spark: SparkSession,
    fields: dict[str, FieldSpec],
    *,
    rows_per_second: int = 1,
    with_proc_time: bool = True,
    clock: Column | None = None,
) -> DataFrame:
    """Unbounded datagen table (streaming DataFrame on the rate source)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return _apply_fields(rate, fields, with_proc_time, clock)


def datagen_batch(
    spark: SparkSession,
    fields: dict[str, FieldSpec],
    *,
    num_rows: int = 100,
    num_partitions: int | None = None,
    clock: Column | None = None,
) -> DataFrame:
    """Bounded datagen with the same field derivations (test harness form)."""
    rng = spark.range(0, num_rows, numPartitions=num_partitions)
    return _apply_fields(rng.select(F.col("id").alias("value")), fields, True, clock)


def _double_lit(x: float) -> str:
    """Render a Python float as DuckDB SQL that parses to the bit-identical
    DOUBLE.  ``repr`` is round-trippable and the VARCHAR→DOUBLE cast uses a
    correct strtod; a bare numeric literal would go through DECIMAL and
    double-round."""
    return f"('{x!r}'::DOUBLE)"


def oracle_field_sql(name: str, spec: FieldSpec, value: str = "value") -> str:
    """ANSI-SQL (DuckDB) twin of :func:`_field_col` — replays the exact
    draws, so datagen-fed queries are hash-checkable cross-engine."""
    salted = f"('0x' || substr(md5({value}::VARCHAR || '{name}'), 1, 8))::BIGINT"
    if isinstance(spec, RandomInt):
        span = spec.max - spec.min + 1
        return f"(({salted} % {span}) + {spec.min})::INT"
    if isinstance(spec, RandomDouble):
        # Float constants go in as '<repr>'::DOUBLE, never bare literals:
        # DuckDB types a bare float literal DECIMAL and the parse
        # double-rounds (1.9999999998835847 lands 1 ulp high), diverging
        # from Spark's IEEE-double path — caught by
        # tests/test_datagen_property.py.  The VARCHAR→DOUBLE cast is a
        # correct round-trip (verified bit-exact over 20k random floats),
        # so with all-double operands both engines run the identical
        # double-op sequence: min + (u/1e6)*(max-min).
        lo, span = _double_lit(spec.min), _double_lit(spec.max - spec.min)
        return (
            f"({lo} + ((({salted} % 1000000))::DOUBLE / (1000000)::DOUBLE)"
            f" * {span})"
        )
    if isinstance(spec, RandomString):
        repeats = spec.length // 32 + 1
        full = f"md5({value}::VARCHAR || '{name}')"
        return f"substr(repeat({full}, {repeats}), 1, {spec.length})"
    if isinstance(spec, Sequence):
        return f"({value} + {spec.start})::INT"
    raise ValueError(f"unsupported field spec: {spec!r}")
