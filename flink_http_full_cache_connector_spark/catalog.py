"""Catalog utilities: expose the testdata star schema (and any parquet
directory laid out the same way) as SQL-queryable temp views, and maintain
healthy file layouts.

``register_tables`` makes the engine usable from plain ``spark.sql`` — the
query surface every ``queries()`` entry exercises through the DataFrame API
is equally reachable as SQL, matching how the reference exposes its
connector (Flink SQL DDL + queries).

``compact_parquet`` is the layout-maintenance half of the small-file story
(`operators/scale.py widen()` is the read-time half): streaming ingestion
and per-microbatch sinks leave thousands of tiny files per partition; at
100 TB that destroys scan throughput (one task per file, metadata-bound
planning).  Compaction rewrites to a bounded file count and atomically
swaps directories.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Create/replace a temp view per parquet table so ``spark.sql`` works
    directly (the ``events`` view gets the same nanosecond-timestamp fix as
    the DataFrame path)."""
    from flink_http_full_cache_connector_spark.plans.registry import load_table

    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def compact_parquet(
    spark: SparkSession, path: str, target_files: int = 0
) -> tuple[int, int]:
    """Rewrite a parquet directory to ``target_files`` files (default:
    cluster parallelism) and atomically swap it in.  Returns
    (files_before, files_after).

    Coalesce, not repartition: compaction must not shuffle — it only merges
    read splits into fewer write tasks.
    """
    target = target_files or spark.sparkContext.defaultParallelism

    def count_files(p: str) -> int:
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = count_files(path)
    df: DataFrame = spark.read.parquet(path)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path.rstrip("/")) or ".")
    out = os.path.join(tmp, "compacted")
    df.coalesce(target).write.mode("overwrite").parquet(out)
    old = path.rstrip("/") + ".old"
    os.rename(path.rstrip("/"), old)
    os.rename(out, path.rstrip("/"))
    shutil.rmtree(old)
    shutil.rmtree(tmp, ignore_errors=True)
    return before, count_files(path)
