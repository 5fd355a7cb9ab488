"""Time-series gap fill with LOCF (last observation carried forward).

Regularizes an irregular event stream onto a fixed-step grid per key —
the step every feature/training pipeline runs before windowed feature
extraction.  Implemented with the same union trick as the as-of join
(``operators/asof.py``): instead of a grid × events range join, the grid
rows (null value) are unioned with the events and a running
``last(ignorenulls)`` per key carries values forward — ONE key shuffle,
state is a single carried value per key, linear in (events + grid).

Determinism contract: ties at one timestamp collapse to the row with the
highest tie-break id before filling; the grid is integer-epoch buckets
(calendar-free); the carried value is never arithmetic'd, so floats stay
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    events: DataFrame,
    *,
    key_col: str,
    us_col: str,
    val_col: str,
    tie_col: str,
    step_us: int,
) -> DataFrame:
    """(key, bucket, value_locf) for every ``step_us`` bucket between each
    key's first and last event; the value is the most recent observation
    at or before the bucket's end (inclusive).

    Same-microsecond ties are canonicalized by the running window's ORDER
    BY itself — (us, kind, tie) makes the max-tie event the last peer the
    ``last(ignorenulls)`` sees, so no separate (key, us) tie-dedup window
    (and its extra shuffle, duplicated into both union branches) is
    needed.  Cost: one key-keyed bounds aggregation + one key-keyed
    window — two exchanges total, pinned by plan test."""
    ev = events.select(key_col, us_col, val_col, tie_col)
    bounds = ev.groupBy(key_col).agg(
        F.expr(f"min({us_col}) div {step_us}").alias("h0"),
        F.expr(f"max({us_col}) div {step_us}").alias("h1"),
    )
    grid = bounds.select(
        key_col, F.explode(F.sequence("h0", "h1")).alias("bucket")
    ).select(
        key_col,
        "bucket",
        ((F.col("bucket") + 1) * step_us - 1).alias(us_col),
        F.lit(None).cast(dict(events.dtypes)[val_col]).alias(val_col),
        F.lit(None).cast(dict(events.dtypes)[tie_col]).alias(tie_col),
        F.lit(1).alias("kind"),
    )
    ev_rows = ev.select(
        key_col,
        us_col,
        val_col,
        tie_col,
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("bucket"),
    )
    # grid rows (kind 1) sort after every event at the same us; among
    # same-us events the tie column orders them, so the running last() is
    # deterministic — the null tie on grid rows never compares (kind differs)
    w = (
        Window.partitionBy(key_col)
        .orderBy(us_col, "kind", tie_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = ev_rows.unionByName(
        grid.select(key_col, us_col, val_col, tie_col, "kind", "bucket")
    )
    return (
        unioned.withColumn("value_locf", F.last(val_col, ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
        .select(key_col, "bucket", "value_locf")
    )
