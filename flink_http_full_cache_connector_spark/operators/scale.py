"""Partitioning helpers for compute-heavy operators.

``widen`` fixes the small-file pathology: a table that arrives as fewer
input partitions than the cluster has cores (single parquet file, single
row group) would otherwise run its whole map-side fan-out (explode,
hashing, nested-loop scoring) on one thread.  At real scale the scan is
already wide — the input has thousands of splits — so ``widen`` is a no-op
there (guarded by the partition count, never an unconditional shuffle of
the full corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to cluster parallelism — only when the
    plan currently has fewer partitions (no-op on already-wide scans)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
