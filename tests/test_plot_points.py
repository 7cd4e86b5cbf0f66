"""scripts/plot_points.py: parsing, min-across-runs, and SVG output."""

from __future__ import annotations

import importlib.util
import os
import xml.dom.minidom

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "plot_points", os.path.join(REPO, "scripts", "plot_points.py")
)
pp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pp)


def test_parse_skips_malformed_rows(tmp_path):
    f = tmp_path / "points.txt"
    f.write_text(
        "400 8 32 32 spark-local 0 12.5\n"
        "garbage line\n"
        "400 8 32 32 spark-local zero nan-metric\n"
        "100 2 32 32 spark-local 0 3.0\n"
    )
    rows = pp.parse_points(str(f))
    assert len(rows) == 2
    assert rows[0] == dict(N=400, k=8, ls=32, metric=0, value=12.5)


def test_min_by_keeps_noise_robust_estimate():
    rows = [
        dict(N=400, k=8, value=20.0),
        dict(N=400, k=8, value=12.0),
        dict(N=100, k=8, value=5.0),
    ]
    best = pp.min_by(rows, lambda r: (r["k"], r["N"]))
    assert best == {(8, 400): 12.0, (8, 100): 5.0}


def test_plot_lines_emits_valid_svg_with_direct_labels():
    svg = pp.plot_lines(
        [("k=2", [(100, 5.0), (200, 7.0)]), ("k=4", [(100, 6.0), (200, 7.1)])],
        "t", "x", "y", [100.0, 200.0],
    )
    xml.dom.minidom.parseString(svg)
    assert ">k=2<" in svg and ">k=4<" in svg
    # close line ends must be nudged >= 13px apart
    import re

    ys = [
        float(m.group(1))
        for m in re.finditer(r'y="([0-9.]+)" font-size="11"\s+fill="#0b0b0b"', svg)
    ]
    ys.sort()
    assert all(b - a >= 13 for a, b in zip(ys, ys[1:]))


def test_main_writes_both_charts(tmp_path):
    pts = tmp_path / "points.txt"
    lines = []
    from bench import SWEEP_KS, SWEEP_LS, SWEEP_NS

    for k in SWEEP_KS:
        for n in SWEEP_NS:
            lines.append(f"{n} {k} 32 32 spark-local 0 {10 + k + n / 100}\n")
    for ls in SWEEP_LS:
        lines.append(f"400 8 {ls} {ls} spark-local 0 {100 / ls + 5}\n")
    pts.write_text("".join(lines))
    out = tmp_path / "results"
    import sys

    argv = sys.argv
    sys.argv = ["plot_points.py", str(pts), str(out)]
    try:
        pp.main()
    finally:
        sys.argv = argv
    for name in ("sweep_kn.svg", "sweep_ls.svg"):
        xml.dom.minidom.parse(str(out / name))
