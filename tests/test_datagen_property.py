"""Property tests for the datagen source's cross-engine replay contract:
ANY field-spec combination must produce bit-identical draws in Spark
(md5-derived JVM expressions) and DuckDB (oracle_field_sql) — the property
that makes every datagen-fed registered query hash-checkable."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_http_full_cache_connector_spark.sources.datagen import (
    RandomDouble,
    RandomInt,
    RandomString,
    Sequence,
    datagen_batch,
    oracle_field_sql,
)

specs = st.one_of(
    st.builds(
        RandomInt,
        min=st.integers(min_value=-1000, max_value=1000),
        max=st.integers(min_value=1001, max_value=100_000),
    ),
    st.builds(
        RandomDouble,
        min=st.floats(min_value=-100.0, max_value=0.0),
        max=st.floats(min_value=1.0, max_value=1e6),
    ),
    st.builds(RandomString, length=st.integers(min_value=1, max_value=80)),
    st.builds(
        Sequence,
        start=st.integers(min_value=0, max_value=50),
        end=st.integers(min_value=100, max_value=500),
    ),
)


@pytest.mark.slow  # heavy single: slow tier (r12 gate split)
@pytest.mark.usefixtures("spark")
@settings(max_examples=50, deadline=None)
@given(
    fields=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        specs,
        min_size=1,
        max_size=4,
    ),
    num_rows=st.integers(min_value=1, max_value=300),
)
def test_datagen_draws_replay_in_duckdb(spark, fields, num_rows):
    sdf = (
        datagen_batch(spark, fields, num_rows=num_rows)
        .drop("proc_time")  # wall clock unless a fixed clock is injected
        .toPandas()
    )
    cols = ",\n".join(
        f"{oracle_field_sql(n, s)} AS {n}" for n, s in fields.items()
    )
    seq_filters = " AND ".join(
        f"(value + {s.start}) <= {s.end}"
        for s in fields.values()
        if isinstance(s, Sequence)
    )
    sql = f"SELECT {cols} FROM range(0, {num_rows}) t(value)"
    if seq_filters:
        sql += f" WHERE {seq_filters}"
    odf = duckdb.sql(sql).df()
    assert len(sdf) == len(odf)
    for c in fields:
        a, b = sdf[c], odf[c]
        if a.dtype.kind == "f":
            assert (a == b).all(), c  # bit-identical doubles, no tolerance
        else:
            assert (a.astype(str) == b.astype(str)).all(), c
