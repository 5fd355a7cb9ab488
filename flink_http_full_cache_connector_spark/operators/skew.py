"""Skew-resilient shuffle join (100 TB design tool).

When the dimension side is broadcastable, ``lookup_join`` already avoids
shuffles entirely — salting is for the remaining case: a shuffle equi-join
whose probe side has hot keys (one user/id dominating the table), where
hash partitioning would send a whole key to one reducer.

``salted_join`` scatters each probe row into one of ``salt`` sub-buckets of
its key and replicates the build side across all buckets, turning one
pathological reducer into ``salt`` even ones.  Semantics are identical to
the plain equi-join (inner/left), verified by test.

Spark's AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on in
:func:`...streaming.session.build_session`) handles *sort-merge* skew
automatically at runtime; explicit salting remains useful when AQE can't
split (e.g. aggregations after the join keyed the same way, or forced
shuffled-hash joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[tuple[str, str]],
    how: str = "inner",
    *,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join with probe-side key salting.

    ``on`` is a list of (probe_col, build_col) pairs, like ``lookup_join``.
    The probe row's bucket is a deterministic hash of its whole row spread
    over ``salt`` buckets (hot *keys* scatter because their rows differ in
    other columns); the build side is exploded x``salt`` so every bucket
    finds its partners.  Build-side growth is the price — use only when the
    build side is small-ish but above the broadcast threshold, or when AQE
    skew handling is unavailable (see module docstring).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")

    probe_salted = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(salt))
    )
    build_salted = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))

    cond = F.col("_salt") == F.col("_bsalt")
    build_salted = build_salted.withColumnRenamed("_salt", "_bsalt")
    for probe_col, build_col in on:
        cond = cond & (probe_salted[probe_col] == build_salted[build_col])
    return probe_salted.join(build_salted, cond, how).drop("_salt", "_bsalt")
