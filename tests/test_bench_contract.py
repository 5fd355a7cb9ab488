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
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] == pytest.approx(sum(payload["queries"].values()), abs=0.01)
    from flink_http_full_cache_connector_spark.plans.registry import all_queries

    assert set(payload["queries"]) == set(all_queries())
