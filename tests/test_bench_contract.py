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
    enumeration order (round 1 covered exactly the first 50 and stopped);
    the registry must keep not-yet-driver-verified queries ahead of the
    r1-green tail so a capped sweep always lands on the queries without a
    driver record."""
    from flink_http_full_cache_connector_spark.plans.registry import (
        _R1_DRIVER_GREEN,
        all_queries,
    )

    names = list(all_queries())
    seen_green = False
    for n in names:
        if n in _R1_DRIVER_GREEN:
            seen_green = True
        else:
            assert not seen_green, (
                f"{n} (driver-unverified) enumerated after an r1-green query"
            )
    # both groups are non-empty and every r1-green query is still registered
    assert seen_green and _R1_DRIVER_GREEN <= set(names)
