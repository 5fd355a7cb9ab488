"""The driver runs bench.py per round; its one-JSON-line contract breaking
would lose the round's BENCH record. Pin it with a real subprocess run at
the smallest scale factor."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_emits_one_json_line_with_required_keys():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout
    # the driver records only the last 2000 stdout bytes; the machine line
    # must survive that window whole (BENCH_r01 lost 34 timings to it)
    assert len(lines[0]) <= 1950, len(lines[0])
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] == pytest.approx(sum(payload["queries"].values()), abs=0.05)
    from flink_http_full_cache_connector_spark.plans.registry import all_queries, short_keys

    names = list(all_queries())
    skey = short_keys(names)
    assert set(payload["queries"]) == set(skey.values())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_KEYS.json")) as f:
        keymap = json.load(f)
    assert set(keymap.values()) == set(names)
    with open(os.path.join(repo, "BENCH_FULL.json")) as f:
        full = json.load(f)
    assert set(full["queries"]) == set(names)


def test_short_keys_unique_and_stable():
    from flink_http_full_cache_connector_spark.plans.registry import all_queries, short_keys

    names = list(all_queries())
    skey = short_keys(names)
    assert len(set(skey.values())) == len(names)
    # order-independent: same mapping regardless of input order
    assert short_keys(sorted(names)) == {n: skey[n] for n in sorted(names)}
    rev = short_keys(list(reversed(names)))
    assert {n: rev[n] for n in names} == skey


def test_sweep_order_puts_driver_unverified_queries_first():
    """The driver's budget-capped correctness sweep walks queries() in
    enumeration order (rounds 1 and 2 each covered exactly the first 50 and
    stopped); the registry must keep queries with no green driver row in ANY
    round ahead of the cumulative-green tail, or a capped sweep re-verifies
    the same green queries forever and the tail never gets a record."""
    from flink_http_full_cache_connector_spark.plans.registry import (
        _DRIVER_GREEN,
        _R1_DRIVER_GREEN,
        _R2_DRIVER_GREEN,
        all_queries,
    )

    names = list(all_queries())
    seen_green = False
    for n in names:
        if n in _DRIVER_GREEN:
            seen_green = True
        else:
            assert not seen_green, (
                f"{n} (driver-unverified) enumerated after a driver-green query"
            )
    # both groups are non-empty and every driver-green query is registered
    assert seen_green and _DRIVER_GREEN <= set(names)
    # the cumulative set really is cumulative (r3 regression guard: the r2
    # sweep's 48 green queries must not fall back into pending)
    assert _DRIVER_GREEN == _R1_DRIVER_GREEN | _R2_DRIVER_GREEN
    assert len(_R2_DRIVER_GREEN) == 48
    # the two r2 non-green rows stay pending until a green round records them
    for still_pending in ("sim_ann_ivf_trained", "embedding_quantize_int8"):
        assert still_pending not in _DRIVER_GREEN
        assert still_pending in names
    # within pending, LONGEST-pending first: every r2-era never-green query
    # must enumerate before any round-3 registrant, so a 50-query capped
    # sweep cannot strand an r2-era query behind newer additions
    from flink_http_full_cache_connector_spark.plans.registry import (
        _R2_ERA_PENDING,
    )

    pending = [n for n in names if n not in _DRIVER_GREEN]
    k = len(_R2_ERA_PENDING & set(pending))
    assert set(pending[:k]) == _R2_ERA_PENDING & set(pending)
