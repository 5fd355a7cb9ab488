"""Kafka probe-stream helper — doc-parity with the reference's README
(SURVEY.md §2.B B11; ``README.md:109-120`` shows a Kafka-sourced probe
stream joined to the HTTP lookup table).

Spark ships the Kafka connector as a separate artifact
(``org.apache.spark:spark-sql-kafka-0-10_2.13``); this module only
assembles the reader declaratively so the options contract is testable
without the jar.  ``kafka_stream(...).load()`` works unchanged once the
package is on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader
from pyspark.sql.types import StructType


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
    options: dict[str, str] | None = None,
) -> DataStreamReader:
    """Declarative Kafka reader (≙ the reference README's Kafka DDL)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def parse_json_value(raw: DataFrame, schema: StructType) -> DataFrame:
    """Kafka's binary ``value`` → typed columns (flink-json equivalent:
    missing field → NULL, via from_json's permissive mode)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("v")
    ).select("v.*")
