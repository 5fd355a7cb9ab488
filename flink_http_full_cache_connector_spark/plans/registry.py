"""Central query registry backing the driver contract (__spark_entry__.py).

Every implemented operator/query shape from SURVEY.md §2 registers a
:class:`QueryDef` here: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs
over the same parquet tables.  Column names are aliased identically on both
sides — the driver's compare hashes values after sorting columns by name.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    # Correctness baselines (all-pairs / brute-force twins of a bucketed
    # scale path).  They must stay registered — they ARE the oracle for the
    # scale paths' recall tests — but a harness running "the registry at
    # scale" should skip them: their cost is O(n²)/O(n·q) by design.
    baseline: bool = False


_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str, oracle: str | None, doc: str = "", baseline: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        @functools.wraps(fn)
        def gated(spark: SparkSession, sf_dir: str) -> DataFrame:
            # drop cached relations left by PREVIOUS queries: a harness that
            # sweeps all 100 registered queries through one session (the
            # driver's correctness gate, bench.py, the oracle-parity tests)
            # would otherwise accumulate every persist() any query ever made
            # — measured to end in driver OOM near the end of long sweeps
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            return fn(spark, sf_dir)

        _REGISTRY[name] = QueryDef(
            name=name, spark=gated, oracle=oracle, doc=doc, baseline=baseline
        )
        # return the UNwrapped function: intra-module composition (e.g.
        # dedup_components building on dedup_minhash_lsh) must not clear the
        # caller's own cache mid-build
        return fn

    return deco


# Queries with a green (hash_match) row in the round-1 driver sweep
# (CORRECTNESS_r01.json).  Driver sweeps are budget-capped (r1 and r2 each
# covered exactly the first 50 entries of enumeration order and stopped), so
# enumeration order decides which queries ever get a driver correctness
# record.  all_queries() therefore yields queries with NO green row in ANY
# past round FIRST (pending = not in _DRIVER_GREEN below); the cumulative
# green tail follows.  Repo-local parity (tests/test_oracle_parity.py)
# covers every query every round regardless of this ordering.
#
# The r1 set is also kept separately: bench.py uses it as the cheap
# scan/join/window JVM warm-up prefix (the r2 green set contains the heavy
# dedup/sketch families, which must run AFTER warm-up for honest timings).
_R1_DRIVER_GREEN = frozenset(
    {
        "tfidf_top_terms", "rollup_events", "window_funcs_events",
        "set_ops_users", "pricing_summary", "pivot_events", "semi_anti_joins",
        "star_join_revenue", "scalar_subquery_spenders", "json_props_stats",
        "percentiles_events", "funnel_users", "supplier_part_revenue",
        "scd2_intervals", "ntile_buckets", "shipping_priority",
        "array_funcs_users", "map_funcs_users", "window_dist_events",
        "variant_props_stats", "window_first_last_events",
        "outliers_iqr_events", "lookup_join_inner", "lookup_join_left",
        "projection", "nested_subquery", "streaming_lookup_join",
        "streaming_windowed_events", "hopping_windows", "session_windows",
        "http_lookup_scan", "http_lookup_join", "streaming_interval_join",
        "topk_orders", "latest_event_per_user", "sessionize_events",
        "cube_events", "retention_cohorts", "orders_above_cust_avg",
        "dedup_incremental", "region_nations_agg", "salted_join_orders",
        "set_ops_all_events", "order_price_ranks", "grouping_sets_events",
        "unpivot_lineitem_metrics",
    }
)

# Green (hash_match) rows from the round-2 driver sweep (CORRECTNESS_r02.json).
# NOT green in r2 and so still pending: sim_ann_ivf_trained (no_oracle) and
# embedding_quantize_int8 (driver canonicalizer error on array schema).
_R2_DRIVER_GREEN = frozenset(
    {
        "sketch_stats", "sketch_heavy_hitters", "datagen_probe",
        "proctime_lookup_join", "rolling_1h_events", "gapfill_locf_events",
        "recursive_order_chains", "profile_events_columns", "fk_integrity",
        "asof_join_events", "asof_join_events_forward", "bloom_join_lineitem",
        "dedup_exact", "streaming_dedup_exact", "streaming_dedup_stateful",
        "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped",
        "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding_cosine",
        "dedup_components", "streaming_dedup_watermarked", "sim_topk_cosine",
        "sim_ann_lsh", "sim_ann_ivf", "sim_rerank_pandas",
        "embedding_dim_stats", "contrastive_negatives", "embedding_drift_int8",
        "dedup_embedding_lsh", "dedup_simhash_pairs", "dedup_containment",
        "dedup_containment_capped", "multimodal_metadata", "multimodal_sniff",
        "multimodal_decode_features", "multimodal_frame_sample",
        "multimodal_resize", "text_token_count", "text_lang_id",
        "text_quality_score", "text_normalize", "text_vocabulary",
        "text_fingerprint", "text_pii_scrub", "text_top_bigrams",
        "corpus_report", "text_chunks_udtf",
    }
)

# Cumulative: a query is "driver-green" if ANY past round recorded a green
# hash_match row for it.  This is the set all_queries()'s pending-first
# ordering keys off — pending must mean "never driver-verified", or a
# budget-capped sweep re-walks already-green queries forever and the tail
# never gets a record (round-2 verdict, What's wrong #3).
_DRIVER_GREEN = _R1_DRIVER_GREEN | _R2_DRIVER_GREEN

# Within pending, LONGEST-pending first: queries that existed by the end of
# round 2 but have no green row (the 16 the r2 sweep never reached, plus
# the two r2 non-green rows).  With 51 pending and a 50-query sweep budget,
# plain insertion order would push `streaming_upsert_snapshot` — flagged
# as never-checked by the round-2 verdict — past the cap AGAIN behind
# round-3 registrants; age-priority guarantees every r2-era query gets its
# driver row this round and only a newest registrant waits for round 4.
_R2_ERA_PENDING = frozenset(
    {
        "pack_sequences", "decontaminate", "corpus_mixture",
        "text_quality_gopher", "text_length_buckets", "text_token_gini",
        "boilerplate_shingles", "pipeline_clean_corpus",
        "observe_corpus_metrics", "range_join_events", "sample_hash_split",
        "sample_stratified", "sample_weighted", "split_leakage_report",
        "streaming_upsert_snapshot", "training_corpus_build",
        "sim_ann_ivf_trained", "embedding_quantize_int8",
    }
)


def all_queries() -> dict[str, QueryDef]:
    # Import registrants lazily to avoid import cycles; each module appends
    # to the registry at import time.
    from flink_http_full_cache_connector_spark.plans import (  # noqa: F401
        analytics_queries,
        reference_queries,
        timeseries_queries,
        tpch_extra,
        warehouse_queries,
    )

    try:
        from flink_http_full_cache_connector_spark.operators import (  # noqa: F401
            asof,
            bloom,
            bpe,
            dedup,
            graph,
            lm_score,
            multimodal,
            pipeline,
            rangejoin,
            sampling,
            similarity,
            skew,
            text,
        )
    except ImportError:
        pass
    from flink_http_full_cache_connector_spark.streaming import (  # noqa: F401
        heavy_hitters,
        session,
        upsert,
    )

    oldest = {
        n: q
        for n, q in _REGISTRY.items()
        if n in _R2_ERA_PENDING and n not in _DRIVER_GREEN
    }
    pending = {
        n: q
        for n, q in _REGISTRY.items()
        if n not in _DRIVER_GREEN and n not in oldest
    }
    green = {n: q for n, q in _REGISTRY.items() if n in _DRIVER_GREEN}
    return {**oldest, **pending, **green}


def short_keys(names: list[str]) -> dict[str, str]:
    """Deterministic short key per query name for the bench JSON line.

    The driver keeps only the last 2000 bytes of bench.py stdout
    (BENCH_r01.json: ``tail`` is exactly 2000 chars and ``parsed`` is null
    because the full-name line was ~4 KB).  Keys compress each ``_``-word to
    its first letters (2 for the head word, 1 for the rest — tightened when
    the registry passed ~135 names and the 3+2 scheme overflowed the budget
    even at 1 decimal); collisions widen the suffix-word slice until unique.
    Independent of input order (widening applies to whole colliding groups
    at once), so the mapping depends only on the SET of registered names.
    Full mapping is written to BENCH_KEYS.json next to the bench output.
    """

    def key(name: str, k: int) -> str:
        words = name.split("_")
        return words[0][:2] + "".join(w[:k] for w in words[1:])

    out: dict[str, str] = {}
    remaining = list(names)
    k = 1
    while remaining:
        cand = {n: key(n, k) for n in remaining}
        counts: dict[str, int] = {}
        for s in cand.values():
            counts[s] = counts.get(s, 0) + 1
        taken = set(out.values())
        next_round = []
        for n, s in cand.items():
            if counts[s] == 1 and s not in taken:
                out[n] = s
            else:
                next_round.append(n)
        if next_round == remaining:  # widening no longer separates; bail out
            for i, n in enumerate(sorted(next_round)):
                out[n] = f"{key(n, k)}{i}"
            break
        remaining = next_round
        k += 1
    return {n: out[n] for n in names}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver parquet table.

    ``events.parquet`` has shipped ``ts`` in two physical forms across
    driver rounds: parquet TIMESTAMP(NANOS) (round 1 — Spark's vectorized
    reader rejects it, so it must be read as nanos-since-epoch longs and
    µs-truncated) and plain TIMESTAMP(MICROS) (round 2+ — reads directly
    as TIMESTAMP_NTZ).  Handle both by inspecting the footer schema; either
    way the returned ``ts`` is a session-tz TIMESTAMP whose wall-clock
    values match what the DuckDB oracle sees (UTC sessions — build_session
    pins spark.sql.session.timeZone=UTC).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize an events relation's ``ts`` to a session-tz TIMESTAMP,
    whichever physical form the parquet shipped (see :func:`load_table`).
    Works on batch and streaming DataFrames alike — dtype dispatch happens
    at plan-build time on the declared schema.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        # nanos-as-long; integer division: (ts / 1000).cast("long")
        # would round-trip through a double and lose ulps at ~1.7e18
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        # parquet µs timestamps are tz-naive wall-clock values; the whole
        # query surface (windowing, unix_micros, oracle hashing) was built
        # against session-tz TIMESTAMP, so normalize (UTC session ⇒ same
        # instant, same wall clock)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
