"""Declared-schema file sources: CSV and JSON-Lines.

The connector's philosophy (reference `HttpLookupTableSourceFactory.scala`
— schema comes from the DDL, never inferred; missing fields are NULL,
malformed rows are hard errors in FAILFAST) extended to the two file
formats every ingest pipeline meets before parquet.  Schema inference is
deliberately NOT exposed: inference reads the data twice, can flip types
between batches (an int column that later sees a float), and makes the
declared contract depend on whichever file is listed first — at 100 TB,
a schema is an input, not a discovery.

Both readers return plain DataFrames whose scans participate in Catalyst
pushdown (CSV/JSON file sources support filter + column pruning), so a
projection over one column reads one column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: parse modes, mirroring the connector's deserialization contract (A10):
#: FAILFAST = malformed row -> query error (the reference's behavior for
#: unparseable payloads); PERMISSIVE = malformed -> NULL row + the raw
#: text preserved in ``_corrupt_record`` for quarantine pipelines.
FAILFAST = "FAILFAST"
PERMISSIVE = "PERMISSIVE"


def _schema(schema: StructType | str) -> StructType:
    if isinstance(schema, str):
        return StructType.fromDDL(schema)
    return schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
    mode: str = FAILFAST,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
    **options: str,
) -> DataFrame:
    """CSV scan with a DECLARED schema (DDL string or StructType).

    Defaults pin the cross-engine-portable choices: header row expected,
    FAILFAST on malformed rows, and an explicit timestamp format (the
    Spark default otherwise shifts with the session's legacy-parser
    flags).  Any extra reader option passes through.
    """
    reader = (
        spark.read.schema(_schema(schema))
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("timestampFormat", timestamp_format)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    mode: str = FAILFAST,
    **options: str,
) -> DataFrame:
    """JSON-Lines scan with a DECLARED schema.

    Missing fields deserialize to NULL and extra fields are ignored —
    the same contract as the HTTP payload deserializer (rows.py) — and
    malformed lines follow ``mode`` (FAILFAST by default).
    """
    reader = spark.read.schema(_schema(schema)).option("mode", mode)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)
