"""HTTP full-cache lookup table → static DataFrame.

The reference materializes the entire HTTP JSON payload as a bounded
one-split scan buffered in join-operator memory
(``HttpInputFormatProvider.scala:50,80-81,148``) and serves it to a
``FOR SYSTEM_TIME AS OF`` lookup join.  The Spark-native equivalent is a
small **static DataFrame** fetched on the driver and broadcast to the join —
same "whole dimension table in memory next to the probe" physical profile,
but letting Catalyst/AQE pick broadcast-hash-join.

Scale contract (100 TB design note): the *probe* side is arbitrarily large
and fully partition-parallel; the *dimension* side is by definition a
lookup-table payload (one HTTP document) and must fit in executor memory —
identical to the reference's contract (README.md:210-217 memory sizing
warning).  Nothing here collects probe data to the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from dataclasses import field as dataclass_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from flink_http_full_cache_connector_spark.http_client import (
    RequestMetrics,
    fetch_with_retry,
    parse_payload,
)
from flink_http_full_cache_connector_spark.options import HttpLookupOptions, validate_options
from flink_http_full_cache_connector_spark.rows import deserialize_nodes


@dataclass
class FetchStats:
    """Cache observability — the metric families the reference README
    documents but never registers (``README.md:199-208``): refresh
    durations, row counts, and (via ``http``) request/retry/failure
    counts and response times."""

    fetch_count: int = 0
    last_fetch_duration_s: float = 0.0
    total_fetch_duration_s: float = 0.0
    last_row_count: int = 0
    http: RequestMetrics = dataclass_field(default_factory=RequestMetrics)

    def as_dict(self) -> dict[str, float]:
        """Flat metric map, reference-README naming."""
        return {
            "refresh_count": self.fetch_count,
            "last_refresh_duration_s": self.last_fetch_duration_s,
            "total_refresh_duration_s": self.total_fetch_duration_s,
            "cached_row_count": self.last_row_count,
            **self.http.as_dict(),
        }


def fetch_rows(
    opts: HttpLookupOptions,
    schema: StructType,
    *,
    http_metrics: RequestMetrics | None = None,
) -> list[tuple]:
    """One full scan: GET → parse → pointer → fan-out → typed rows."""
    body = fetch_with_retry(
        opts.url,
        connect_timeout_seconds=opts.connect_timeout_seconds,
        read_timeout_seconds=opts.read_timeout_seconds,
        max_retries=opts.max_retries,
        retry_delay_ms=opts.retry_delay_ms,
        metrics=http_metrics,
    )
    nodes = parse_payload(body, opts.xpath)
    return deserialize_nodes(nodes, schema)


def _local_relation(spark: SparkSession, rows: list[tuple], schema: StructType) -> DataFrame:
    """Driver rows → LocalTableScan via Arrow; classic path as fallback.

    ``dtype=object`` keeps int64 keys exact (no float64 round-trip for
    columns containing NULLs).
    """
    try:
        import pandas as pd

        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        pdf = pd.DataFrame(rows, columns=[f.name for f in schema.fields], dtype=object)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema).coalesce(1)


def create_lookup_df(
    spark: SparkSession,
    options: dict[str, object] | HttpLookupOptions,
    schema: StructType | str,
    *,
    stats: FetchStats | None = None,
) -> DataFrame:
    """Build the full-cache lookup DataFrame (one bounded scan).

    The whole payload lives on the driver ≙ the reference's single
    ``GenericInputSplit`` (``HttpInputFormatProvider.scala:80-81``).  The
    rows become an Arrow-backed **LocalTableScan** — a JVM-side local
    relation with no Python workers in the execution path, which Catalyst
    broadcasts directly in the lookup join (no shuffle, no scan stage).
    Falls back to the classic ``createDataFrame`` path for payloads pandas
    can't represent (e.g. deeply nested rows).
    """
    if isinstance(schema, str):
        # DDL-string convenience (`"id INT, name STRING"`); without this,
        # a string schema fails deep inside row deserialization with an
        # opaque AttributeError instead of at the API boundary
        schema = StructType.fromDDL(schema)
    opts = options if isinstance(options, HttpLookupOptions) else validate_options(options)
    t0 = time.monotonic()
    rows = fetch_rows(
        opts, schema, http_metrics=stats.http if stats is not None else None
    )
    df = _local_relation(spark, rows, schema)
    if stats is not None:
        stats.fetch_count += 1
        stats.last_fetch_duration_s = time.monotonic() - t0
        stats.total_fetch_duration_s += stats.last_fetch_duration_s
        stats.last_row_count = len(rows)
    return df
