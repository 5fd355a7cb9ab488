"""Engine-portable 6-digit decimal truncation.

``round(x, 6)`` is NOT portable across engines: Spark rounds via exact
BigDecimal HALF_UP while DuckDB rounds via float multiplication, so a value
one ulp from a ``x.xxxxxx5`` boundary can round differently (observed on
real data).  ``floor(x * 1e6) / 1e6`` is deterministic for bit-identical
non-negative doubles — no tie boundary anywhere except exact integers,
which both engines represent exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1000000.0


def trunc6(c: Column) -> Column:
    """Truncate a double to 6 decimal digits (portable: floor is identical
    on both engines for any bit-identical double, negative values included)."""
    return F.floor(c * F.lit(SCALE)) / F.lit(SCALE)


def duck_trunc6(expr: str) -> str:
    """DuckDB twin of :func:`trunc6`."""
    return f"(floor(({expr}) * {SCALE}) / {SCALE})"
