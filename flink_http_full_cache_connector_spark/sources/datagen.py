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
    # Salt the hash with the field name so fields draw independently.
    salted = F.hash(value, F.lit(name))
    if isinstance(spec, RandomInt):
        span = spec.max - spec.min + 1
        return (F.pmod(salted, F.lit(span)) + F.lit(spec.min)).cast("int")
    if isinstance(spec, RandomDouble):
        # uniform in [min, max): map hash to [0,1) then scale
        unit = (F.pmod(salted.cast("long"), F.lit(1_000_000)) / F.lit(1_000_000.0))
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
    df: DataFrame, fields: dict[str, FieldSpec], with_proc_time: bool
) -> DataFrame:
    value = F.col("value")
    cols = [_field_col(name, spec, value).alias(name) for name, spec in fields.items()]
    if with_proc_time:
        cols.append(F.current_timestamp().alias("proc_time"))
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
) -> DataFrame:
    """Unbounded datagen table (streaming DataFrame on the rate source)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return _apply_fields(rate, fields, with_proc_time)


def datagen_batch(
    spark: SparkSession,
    fields: dict[str, FieldSpec],
    *,
    num_rows: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Bounded datagen with the same field derivations (test harness form)."""
    rng = spark.range(0, num_rows, numPartitions=num_partitions)
    return _apply_fields(rng.select(F.col("id").alias("value")), fields, True)
