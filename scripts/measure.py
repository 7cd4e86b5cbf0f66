"""External measurement-process harness — the analog of the
reference's START/STOP subprocess protocol
(/root/reference/scripts/measyrepy.py:198-296: parent launches the
engine binary, waits for 'START'/'STOP' marker lines on its stdout,
and brackets each phase with monotonic timestamps + per-process CPU
ticks + memory readings).

This harness measures the engine FROM OUTSIDE its process, which an
in-process recorder (plans/metrics.py) cannot: the numbers include
JVM activity, GC, and Python driver overhead, sampled from /proc with
zero instrumentation inside the measured interval.

Spark-specific adaptation: the PySpark driver spawns the JVM as a
child process, so all readings aggregate over the child's full
process TREE (walked via /proc/<pid>/task/*/children, falling back to
a /proc scan) — measuring only the Python pid would miss essentially
all the work.

Usage:
    python scripts/measure.py [-o OUT] -- <cmd> [args...]

The child emits ``START <label>`` / ``STOP <label>`` lines
(bench.py does so under SPARK_GRAFT_MARKERS=1). Per phase the parent
records wall ms, CPU%% of one core over the interval (tree
utime+stime delta / wall), and tree RSS MB at STOP, appending
``label wall_ms cpu_pct rss_mb`` rows to the output file and printing
one JSON summary line at exit.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _children(pid: int) -> list[int]:
    kids: list[int] = []
    task_dir = f"/proc/{pid}/task"
    try:
        for tid in os.listdir(task_dir):
            try:
                with open(f"{task_dir}/{tid}/children") as f:
                    kids += [int(c) for c in f.read().split()]
            except OSError:
                pass
    except OSError:
        # fallback: scan /proc for processes whose ppid == pid
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat") as f:
                    ppid = int(f.read().rsplit(")", 1)[1].split()[1])
                if ppid == pid:
                    kids.append(int(entry))
            except (OSError, ValueError, IndexError):
                pass
    return kids


def _tree(pid: int) -> list[int]:
    out, frontier = [pid], _children(pid)
    while frontier:
        p = frontier.pop()
        out.append(p)
        frontier += _children(p)
    return out


def tree_cpu_ticks(pid: int) -> int:
    """Sum utime+stime (fields 14/15 of /proc/<pid>/stat) over the
    process tree — the per-process analog of measyrepy's
    read_proc_cpu_ticks, extended to descendants."""
    total = 0
    for p in _tree(pid):
        try:
            with open(f"/proc/{p}/stat") as f:
                after = f.read().rsplit(")", 1)[1].split()
            total += int(after[11]) + int(after[12])  # utime, stime
        except (OSError, ValueError, IndexError):
            pass
    return total


def tree_rss_mb(pid: int) -> float:
    total_kb = 0
    for p in _tree(pid):
        try:
            with open(f"/proc/{p}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total_kb += int(line.split()[1])
                        break
        except (OSError, ValueError):
            pass
    return round(total_kb / 1024, 1)


def measure(cmd: list[str], out_path: str, echo: bool = True) -> dict:
    if shutil.which("stdbuf"):  # line-buffer the child like the reference
        cmd = ["stdbuf", "-oL", "-eL"] + cmd
    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL if not echo else None,
        text=True,
        bufsize=1,
    )
    phases: list[dict] = []
    open_phase: dict | None = None
    passthrough: list[str] = []
    assert proc.stdout is not None
    for line in proc.stdout:
        line = line.rstrip("\n").rstrip("\r")
        if line.startswith("START "):
            open_phase = {
                "label": line[6:].strip(),
                "t0": time.monotonic_ns(),
                "ticks0": tree_cpu_ticks(proc.pid),
            }
        elif line.startswith("STOP ") and open_phase is not None:
            t1 = time.monotonic_ns()
            ticks1 = tree_cpu_ticks(proc.pid)
            wall_s = (t1 - open_phase["t0"]) / 1e9
            cpu_s = max(0, ticks1 - open_phase["ticks0"]) / CLK_TCK
            phases.append(
                {
                    "label": open_phase["label"],
                    "wall_ms": round(wall_s * 1000, 3),
                    "cpu_pct": round(100 * cpu_s / wall_s, 1) if wall_s > 0 else 0.0,
                    "rss_mb": tree_rss_mb(proc.pid),
                }
            )
            open_phase = None
        else:
            passthrough.append(line)
    rc = proc.wait()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "a") as f:
        for ph in phases:
            f.write(f"{ph['label']} {ph['wall_ms']} {ph['cpu_pct']} {ph['rss_mb']}\n")
    return {
        "metric": "external_measure",
        "rc": rc,
        "n_phases": len(phases),
        "phases": phases,
        "child_tail": passthrough[-1] if passthrough else None,
    }


def main(argv: list[str]) -> int:
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "measure_points.txt",
    )
    args = argv[1:]
    if args[:1] == ["-o"]:
        out_path, args = args[1], args[2:]
    if args[:1] == ["--"]:
        args = args[1:]
    if not args:
        print("usage: measure.py [-o OUT] -- <cmd> [args...]", file=sys.stderr)
        return 2
    summary = measure(args, out_path)
    print(json.dumps(summary))
    return summary["rc"]


if __name__ == "__main__":
    sys.exit(main(sys.argv))
