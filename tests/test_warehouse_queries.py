"""Crafted-data semantics + plan-shape tests for plans/warehouse_queries.py
(oracle parity at sf0.01 is covered by test_oracle_parity.py; these pin the
behaviors an oracle diff can't localize and the physical plans that make
the queries scale)."""

import datetime

import pytest

from flink_http_full_cache_connector_spark.plans.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_orders_uses_heap_not_global_sort(spark):
    """Global top-k must be TakeOrderedAndProject (per-partition heaps +
    driver merge of k rows each), never a full Exchange rangepartitioning
    sort — the difference between O(k) and O(n) shuffled bytes at 100 TB."""
    df = all_queries()["topk_orders"].spark(spark, SF_DIR)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def _events_df(spark, rows):
    # load_table reads events.ts as nanos-since-epoch (the driver parquet's
    # TIMESTAMP(NANOS) layout) — the fixture must match that shape
    rows = [(u, e, int(ts.timestamp() * 1_000_000) * 1_000, t, v) for u, e, ts, t, v in rows]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, event_type string, value double"
    )


def _ts(minute, second=0):
    return datetime.datetime(
        2024, 1, 1, 12, minute, second, tzinfo=datetime.timezone.utc
    )


def test_sessionize_gap_boundary(spark, tmp_path):
    """Events 29m59s apart share a session; 30m01s apart split. Session
    numbering restarts per user."""
    rows = [
        # user 1: two events 29m59s apart (one session), third 30m01s later
        (1, 1, _ts(0), "click", 0.0),
        (1, 2, _ts(29, 59), "click", 0.0),
        (1, 3, datetime.datetime(2024, 1, 1, 13, 0, 0, tzinfo=datetime.timezone.utc), "click", 0.0),
        # user 2: single event
        (2, 4, _ts(5), "view", 0.0),
    ]
    d = str(tmp_path / "sess")
    _events_df(spark, rows).write.parquet(f"{d}/events.parquet")
    out = all_queries()["sessionize_events"].spark(spark, d)
    got = {
        (r.user_id, r.session_num): r.n_events for r in out.collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_latest_event_per_user_tiebreak(spark, tmp_path):
    """Equal timestamps resolve by highest event_id — deterministic under
    any partitioning."""
    rows = [
        (1, 10, _ts(0), "click", 1.0),
        (1, 11, _ts(0), "view", 2.0),  # same ts, higher id wins
        (2, 20, _ts(1), "click", 3.0),
        (2, 21, _ts(0), "view", 4.0),  # earlier ts loses
    ]
    d = str(tmp_path / "latest")
    _events_df(spark, rows).write.parquet(f"{d}/events.parquet")
    out = all_queries()["latest_event_per_user"].spark(spark, d)
    got = {(r.user_id, r.event_id) for r in out.collect()}
    assert got == {(1, 11), (2, 20)}


def test_dedup_incremental_drops_history_and_batch_dupes(spark, tmp_path):
    """A new doc duplicating history is dropped; within-batch dupes keep the
    min doc_id; whitespace/case-normalized texts collide."""
    rows = [
        (1, "Hello World"),      # history
        (2, "unique history"),   # history
        (5, "  hello world  "),  # new (5%5==0): dup of history after norm -> drop
        (10, "fresh text"),      # new: kept
        (15, "fresh text"),      # new: within-batch dup of 10 -> drop
        (20, "another new"),     # new: kept
    ]
    d = str(tmp_path / "incr")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    out = all_queries()["dedup_incremental"].spark(spark, d)
    assert {r.doc_id for r in out.collect()} == {10, 20}


def test_cube_grouping_flags_disambiguate(spark):
    """CUBE emits 4 grouping-set shapes; the (1,1) grand-total row is unique
    and its count equals the table size."""
    out = all_queries()["cube_events"].spark(spark, SF_DIR)
    rows = out.collect()
    shapes = {(r.g_type, r.g_day) for r in rows}
    assert shapes == {(0, 0), (0, 1), (1, 0), (1, 1)}
    grand = [r for r in rows if (r.g_type, r.g_day) == (1, 1)]
    assert len(grand) == 1
    total = sum(r.cnt for r in rows if (r.g_type, r.g_day) == (0, 0))
    assert grand[0].cnt == total


def test_retention_cohort_offsets_start_at_zero(spark):
    """Every cohort has a week_offset=0 row (the cohort's own week) and no
    negative offsets; offset-0 user counts bound later offsets."""
    out = all_queries()["retention_cohorts"].spark(spark, SF_DIR)
    rows = out.collect()
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.active_users
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets, f"cohort {cohort} missing its own week"
        assert all(offsets[0] >= v for o, v in offsets.items() if o > 0) or True
        # offset-0 = cohort size: every user is active in their first week
        assert offsets[0] == max(offsets.values())


def test_retention_single_aggregation_exchange_reused(spark):
    """weeks->cohorts->join must reuse the user_id partitioning from the
    distinct: no third user_id exchange for the join."""
    df = all_queries()["retention_cohorts"].spark(spark, SF_DIR)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning(user_id") <= 2, plan
