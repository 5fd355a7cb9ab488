"""Central query registry backing the driver contract (__spark_entry__.py).

Every implemented operator/query shape from SURVEY.md §2 registers a
:class:`QueryDef` here: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs
over the same parquet tables.  Column names are aliased identically on both
sides — the driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        @functools.wraps(fn)
        def gated(spark: SparkSession, sf_dir: str) -> DataFrame:
            # drop cached relations left by PREVIOUS queries: a harness that
            # sweeps all 100 registered queries through one session (the
            # driver's correctness gate, bench.py, the oracle-parity tests)
            # would otherwise accumulate every persist() any query ever made
            # — measured to end in driver OOM near the end of long sweeps
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            return fn(spark, sf_dir)

        _REGISTRY[name] = QueryDef(name=name, spark=gated, oracle=oracle, doc=doc)
        # return the UNwrapped function: intra-module composition (e.g.
        # dedup_components building on dedup_minhash_lsh) must not clear the
        # caller's own cache mid-build
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import registrants lazily to avoid import cycles; each module appends
    # to the registry at import time.
    from flink_http_full_cache_connector_spark.plans import (  # noqa: F401
        analytics_queries,
        reference_queries,
        warehouse_queries,
    )

    try:
        from flink_http_full_cache_connector_spark.operators import (  # noqa: F401
            asof,
            bloom,
            dedup,
            multimodal,
            pipeline,
            rangejoin,
            sampling,
            similarity,
            text,
        )
    except ImportError:
        pass
    from flink_http_full_cache_connector_spark.streaming import upsert  # noqa: F401

    return dict(_REGISTRY)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver parquet table.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; read it as nanos-since-epoch and
    convert to a microsecond TIMESTAMP column (matching what the DuckDB
    oracle sees after µs truncation).
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # integer division: (ts / 1000).cast("long") would round-trip through
        # a double and lose ulps at ~1.7e18 ns epoch values
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
