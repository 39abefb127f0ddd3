"""The bench emission contract, pinned.

The recording harness keeps only the LAST ~2000 chars of bench.py's
stdout and parses the final line as JSON.  Round 5 lost its entire
bench artifact (parsed: null) because the final line outgrew that
window — this test runs the real bench.py end-to-end on a tiny query
subset and asserts exactly what the harness needs:

1. the FINAL stdout line parses as JSON even after truncating the
   captured stream to its last 2000 chars,
2. it stays under a hard size budget with slack for growth,
3. it carries the summary fields the scoring contract reads,
4. the full per-query detail is still available (preceding line and
   the mirrored evidence file).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_final_line_survives_tail_capture():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="dedup_exact,asof_join_events",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_SHUFFLE_PARTITIONS="8",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # the harness's view: last 2000 chars only, then the last line
    tail = proc.stdout[-2000:]
    final_line = tail.rstrip("\n").splitlines()[-1]
    summary = json.loads(final_line)

    assert summary["metric"] == "headline_total"
    assert summary["unit"] == "sec"
    assert isinstance(summary["value"], (int, float))
    assert summary["n_queries"] == 2
    assert "calibration_best" in summary
    assert isinstance(summary["sf"], (int, float))

    # size budget: the REAL final line scales only with the 5-slowest
    # map, but leave generous slack under the 2000-char window so ~30
    # rounds of query-name growth can never resurrect the r5 failure
    assert len(final_line) < 1200, len(final_line)

    # full detail must still exist: preceding stdout line...
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    detail = json.loads(lines[-2])
    assert detail["metric"] == "headline_detail"
    assert set(detail["queries"]) == {"dedup_exact", "asof_join_events"}
    assert set(detail["repeats"]) == set(detail["queries"])
    assert "calibration" in detail

    # ...and the mirrored evidence file
    mirrored = json.load(
        open(os.path.join(REPO, "tools", "evidence", "bench_detail_last_run.json"))
    )
    assert mirrored["queries"].keys() == detail["queries"].keys()
