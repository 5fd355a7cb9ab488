"""Scale machinery: salted join equivalence, session builder, kafka reader
options, widen() no-op on wide inputs."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from flink_http_full_cache_connector_spark.operators.scale import widen
from flink_http_full_cache_connector_spark.operators.skew import salted_join


@pytest.fixture()
def skewed_tables(spark):
    # hot key: 90% of probe rows hit user 1
    probe = spark.createDataFrame(
        [Row(pid=i, user_id=1 if i % 10 else i % 5 + 1, amt=float(i)) for i in range(1000)]
    )
    build = spark.createDataFrame(
        [Row(user_id=u, name=f"user{u}") for u in range(1, 8)]
    )
    return probe, build


def test_salted_join_matches_plain_inner(spark, skewed_tables):
    probe, build = skewed_tables
    plain = probe.join(build, "user_id", "inner").select("pid", "user_id", "name")
    salted = salted_join(probe, build, on=[("user_id", "user_id")], how="inner").select(
        "pid", probe["user_id"], "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_left(spark, skewed_tables):
    probe, build = skewed_tables
    probe = probe.withColumn("user_id", F.col("user_id") + 3)  # create misses
    plain = probe.join(build, "user_id", "left").select("pid", "user_id", "name")
    salted = salted_join(probe, build, on=[("user_id", "user_id")], how="left").select(
        "pid", probe["user_id"], "name"
    )
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_salted_join_rejects_bad_args(spark, skewed_tables):
    probe, build = skewed_tables
    with pytest.raises(ValueError, match="how"):
        salted_join(probe, build, on=[("user_id", "user_id")], how="full")
    with pytest.raises(ValueError, match="salt"):
        salted_join(probe, build, on=[("user_id", "user_id")], salt=0)


def test_widen_is_noop_on_wide_input(spark):
    wide = spark.range(0, 1000, 1, 64)
    assert widen(wide.toDF("id")).rdd.getNumPartitions() == 64


def test_build_session_reuses_active_with_aqe(spark):
    # getOrCreate returns the active session; confs on the active session
    # are what bench/tests actually run with
    from flink_http_full_cache_connector_spark.session import build_session

    s = build_session()
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"
    # the historical import path keeps working (deprecation re-export)
    from flink_http_full_cache_connector_spark.streaming.session import (
        build_session as legacy_build_session,
    )

    assert legacy_build_session is build_session


def test_kafka_reader_is_declarative(spark):
    from flink_http_full_cache_connector_spark.sources.kafka import (
        kafka_reader,
        parse_json_value,
    )

    # assembling the reader must not require the kafka jar
    reader = kafka_reader(spark, "broker:9092", "orders", starting_offsets="earliest")
    assert reader is not None
    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    raw = spark.createDataFrame(
        [Row(value=bytearray(b'{"id": 7, "name": "x"}')), Row(value=bytearray(b'{"id": 8}'))]
    )
    parsed = {r.id: r.name for r in parse_json_value(raw, schema).collect()}
    assert parsed == {7: "x", 8: None}  # missing field -> NULL (flink-json parity)
