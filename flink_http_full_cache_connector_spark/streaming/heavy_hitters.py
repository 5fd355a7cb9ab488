"""Streaming heavy hitters — custom stateful running counts per key
(SURVEY.md §2.D streaming extensions).

The monitoring twin of the stateful dedup operator: instead of
suppressing repeats, per-key state ACCUMULATES (count + min event id)
and every microbatch emits the updated cumulative row, so a dashboard
reading the sink always sees the latest totals.  Heavy-hitter flagging
(share ≥ 1/20 of the stream) happens on the final key table — which is
key-cardinality-sized, never stream-sized.

State is one (count, min_id) tuple per distinct key, partitioned by the
key — at 100 TB the state store scales with key cardinality, not volume.
Counts and min-ids are integers, so cumulative emission order cannot
change the final value (take max(count) per key over the update stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_http_full_cache_connector_spark.plans.registry import load_table, register

HH_SHARE_DEN = 20  # heavy hitter = key holding >= 1/20 of all events


def running_counts_stream(events: DataFrame) -> DataFrame:
    """(event_id, event_type) stream → cumulative (event_type, cnt,
    first_id) updates via ``applyInPandasWithState``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def accumulate(key, pdfs, state: GroupState):
        cnt, min_id = 0, None
        for pdf in pdfs:
            cnt += len(pdf)
            m = int(pdf["event_id"].min())
            min_id = m if min_id is None else min(min_id, m)
        if state.exists:
            prev_cnt, prev_min = state.get
            cnt += prev_cnt
            min_id = min(min_id, prev_min)
        state.update((cnt, min_id))
        yield pd.DataFrame(
            {"event_type": [key[0]], "cnt": [cnt], "first_id": [min_id]}
        )

    return events.groupBy("event_type").applyInPandasWithState(
        accumulate,
        outputStructType="event_type string, cnt long, first_id long",
        stateStructType="cnt long, min_id long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "streaming_heavy_hitters",
    f"""
    SELECT event_type, count(*)::bigint AS cnt,
           min(event_id)::bigint AS first_id,
           (count(*) * {HH_SHARE_DEN} >= (SELECT count(*) FROM events))
               AS heavy
    FROM events GROUP BY event_type
    """,
    doc="Streaming heavy hitters: custom stateful running counts "
    "(applyInPandasWithState, one integer state tuple per key) emitting "
    "cumulative updates each microbatch; the final key table takes "
    "max(cnt) per key (integer, emission-order-proof) and flags keys "
    f"holding >= 1/{HH_SHARE_DEN} of the stream. State scales with key "
    "cardinality, not stream volume; value-exact vs the batch GROUP BY.",
)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    load_table(spark, sf_dir, "events")  # sets the nanosAsLong conf
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_id", "event_type")
    )
    updates = running_counts_stream(stream)
    name = f"heavy_hitters_{uuid.uuid4().hex[:12]}"
    query = (
        updates.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    final = (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.max("cnt").alias("cnt"), F.min("first_id").alias("first_id"))
    )
    total = final.agg(F.sum("cnt").alias("total"))
    return final.crossJoin(F.broadcast(total)).select(
        "event_type",
        "cnt",
        "first_id",
        (F.col("cnt") * HH_SHARE_DEN >= F.col("total")).alias("heavy"),
    )
