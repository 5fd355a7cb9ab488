"""Bucketed co-located joins — pre-shuffle once, join shuffle-free forever.

The 100 TB pattern for repeated big-big equi-joins (e.g. lineitem ⋈ orders
every pipeline run): persist both sides bucketed by the join key with the
same bucket count, and every subsequent join reads co-located buckets with
**no Exchange on either side** (pinned by test).  The one-time bucketed
write amortizes the shuffle across all future joins — the batch analogue of
the reference's "pay the fetch once, serve every probe from cache" design.

Bucket pruning and AQE still apply on top; bucket counts should be sized so
one bucket of the larger table fits an executor's memory comfortably
(rows_per_bucket ≈ table_rows / buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | list[str],
    buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(buckets, cols[0], *cols[1:])
    if sort_by is not None:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(scols[0], *scols[1:])
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; Catalyst elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
