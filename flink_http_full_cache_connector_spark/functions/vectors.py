"""Vector math on array columns — JVM-side, codegen-friendly.

Dot products / norms / cosine are expressed with ``zip_with`` +
``aggregate`` (left fold, double precision) rather than Python UDFs: the
whole expression stays inside whole-stage codegen, so similarity scans run
at full scan speed on any cluster size.

Oracle-parity note: the fold order (elementwise double multiply, then
left-to-right summation with 0.0 init) matches the DuckDB SQL twins used in
the registered queries — verified bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """Cast array<float> → array<double> (stable IEEE math).

    Native ``Cast`` on the array type, NOT ``transform(x -> cast(x))``:
    the transform form is a higher-order function and therefore
    CodegenFallback — one boxed lambda per element on EVERY vector of
    every query (the round-10 HOF audit's most ubiquitous interpreted
    site, 59 call sites).  ``Cast`` stays inside whole-stage codegen and
    produces the identical element-wise float→double widening (exact,
    no rounding — every float is representable as a double).  Accepts a
    column name too (the HOF form did, via F.transform)."""
    if isinstance(vec, str):
        vec = F.col(vec)
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with precomputed norms — bit-identical to :func:`cosine`
    (same fold, same division/multiply order) but each vector's norm is
    evaluated once per row instead of once per pair.  Use in all-pairs /
    top-k scans where a vector meets many partners."""
    return dot(a, b) / (na * nb)


# DuckDB dialect twins (same fold order → bit-identical doubles)

def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a})+1), "
        f"i -> {a}[i]::double * {b}[i]::double), (x, y) -> x + y)"
    )


def duck_norm(a: str) -> str:
    return f"sqrt({duck_dot(a, a)})"


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}))"
