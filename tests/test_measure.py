"""External measurement harness (scripts/measure.py) — the analog of
the reference's measyrepy.py START/STOP subprocess protocol."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEASURE = os.path.join(REPO, "scripts", "measure.py")

CHILD = r"""
import time
print("warming up noise line")
for i in range(2):
    print(f"START phase{i}", flush=True)
    t0 = time.monotonic()
    while time.monotonic() - t0 < 0.2:   # busy loop: real CPU ticks
        pass
    print(f"STOP phase{i}", flush=True)
print("done")
"""


def test_start_stop_protocol(tmp_path):
    out = tmp_path / "points.txt"
    res = subprocess.run(
        [sys.executable, MEASURE, "-o", str(out), "--", sys.executable, "-c", CHILD],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert res.returncode == 0, res.stderr
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_phases"] == 2
    for ph in summary["phases"]:
        # busy loop ran 200ms; generous upper bound for slow CI hosts
        assert 180 <= ph["wall_ms"] <= 2000
        assert ph["cpu_pct"] > 30  # busy loop is CPU-bound
        assert ph["rss_mb"] > 0
    rows = out.read_text().strip().splitlines()
    assert len(rows) == 2
    label, wall, cpu, rss = rows[0].split()
    assert label == "phase0" and float(wall) > 0


def test_unbalanced_markers_ignored(tmp_path):
    out = tmp_path / "points.txt"
    child = 'print("STOP orphan", flush=True); print("ok")'
    res = subprocess.run(
        [sys.executable, MEASURE, "-o", str(out), "--", sys.executable, "-c", child],
        capture_output=True,
        text=True,
        timeout=60,
    )
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_phases"] == 0 and summary["rc"] == 0
