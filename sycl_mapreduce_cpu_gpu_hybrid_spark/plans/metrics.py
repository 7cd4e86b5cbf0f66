"""Metrics emission shaped like the reference's points.txt rows
``N k ls lsc device metric value`` (POINTSFILE, src/main.cpp:19-38),
with ``device`` generalized to a ``mode`` tag (SURVEY.md §2.11).

The reference brackets each kernel with START/STOP profiling
(src/helper.h:124-196); our analog is wall-time around Spark actions
plus warm-up iterations excluded from metrics (runprogram.sh:29-41).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

METRIC_TIME_MS = 0  # reference metric index 0 = kernel time in ms


@dataclass
class MetricsRecorder:
    rows: list[dict] = field(default_factory=list)

    def record(
        self,
        n: int,
        k: int,
        ls: int,
        lsc: int,
        mode: str,
        metric: int,
        value: float,
        warmup: bool = False,
    ) -> None:
        # warmup flag short-circuits emission, src/main.cpp:21
        if warmup:
            return
        self.rows.append(
            {
                "N": n,
                "k": k,
                "ls": ls,
                "lsc": lsc,
                "mode": mode,
                "metric": metric,
                "value": value,
            }
        )

    def write_points(self, path: str) -> None:
        """Append rows in the reference's space-separated points.txt order."""
        with open(path, "a", encoding="utf-8") as fh:
            for r in self.rows:
                fh.write(
                    f"{r['N']} {r['k']} {r['ls']} {r['lsc']} {r['mode']} "
                    f"{r['metric']} {r['value']}\n"
                )


@contextmanager
def timed():
    """Wall-clock bracket around a Spark action; yields a dict whose
    'sec' key is filled on exit."""
    out = {"sec": None}
    start = time.perf_counter()
    try:
        yield out
    finally:
        out["sec"] = time.perf_counter() - start
