"""Declared-schema CSV / JSON-Lines sources: roundtrip fidelity, the
missing-field→NULL / malformed→error contract (the file-format twin of
rows.py's HTTP deserialization, reference JsonFormat semantics), and
scan-level pushdown."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from flink_http_full_cache_connector_spark.sources.files import (
    PERMISSIVE,
    read_csv,
    read_jsonl,
)

SF_DIR = "/root/testdata/sf0.001"
# o_orderdate is TIMESTAMP_NTZ in the driver parquet (no timezone) — the
# declared schema must match the physical type, not silently coerce
ORDERS_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"
)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_is_lossless(spark, orders, tmp_path):
    path = str(tmp_path / "orders_csv")
    orders.write.option("header", "true").option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(path)
    back = read_csv(spark, path, ORDERS_DDL)
    assert back.schema == orders.schema
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_jsonl_roundtrip_is_lossless(spark, orders, tmp_path):
    path = str(tmp_path / "orders_jsonl")
    orders.write.json(path)
    back = read_jsonl(spark, path, ORDERS_DDL)
    assert back.schema == orders.schema
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_jsonl_missing_field_is_null_extra_ignored(spark, tmp_path):
    """The A10 contract: schema-declared fields absent from the payload
    deserialize to NULL; undeclared payload fields are dropped."""
    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "extra": 99}\n'
        '{"id": 2}\n'
    )
    df = read_jsonl(spark, str(p), "id BIGINT, name STRING")
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {1: "a", 2: None}
    assert df.columns == ["id", "name"]


def test_jsonl_malformed_failfast_vs_permissive(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"id": 1}\nnot json at all\n')
    strict = read_jsonl(spark, str(p), "id BIGINT")
    with pytest.raises(Exception):  # SparkException wrapping FAILFAST parse
        strict.collect()
    lax = read_jsonl(
        spark,
        str(p),
        "id BIGINT, _corrupt_record STRING",
        mode=PERMISSIVE,
    )
    got = lax.collect()
    assert len(got) == 2
    corrupt = [r for r in got if r._corrupt_record is not None]
    assert len(corrupt) == 1 and "not json" in corrupt[0]._corrupt_record


def test_csv_malformed_failfast(spark, tmp_path):
    p = tmp_path / "bad_csv"
    p.mkdir()
    (p / "part.csv").write_text("id,name\n1,a\nnot-an-int,b\n")
    df = read_csv(spark, str(p), "id INT, name STRING")
    with pytest.raises(Exception):
        df.collect()


def test_csv_scan_prunes_and_pushes(spark, orders, tmp_path):
    """Projection and filter must reach the CSV scan (column pruning +
    PushedFilters) — the file-source twin of the parquet pushdown tests."""
    path = str(tmp_path / "orders_push")
    orders.write.option("header", "true").csv(path)
    df = (
        read_csv(spark, path, ORDERS_DDL)
        .where(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_totalprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,7)]" in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "o_orderpriority" not in read_schema, plan


def test_ddl_and_structtype_schemas_equivalent(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "one.jsonl"
    p.write_text('{"id": 5, "name": "x"}\n')
    st = StructType([StructField("id", LongType()), StructField("name", StringType())])
    a = read_jsonl(spark, str(p), st).collect()
    b = read_jsonl(spark, str(p), "id BIGINT, name STRING").collect()
    assert a == b == [(5, "x")]
