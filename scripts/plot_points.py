#!/usr/bin/env python3
"""Render the points.txt sweep results as SVG — the dependency-free
analog of the reference's matplotlib plot driver
(scripts/paramplotter.py:56-158: metric-vs-N per device).

Reads the append-only ``N k ls lsc mode metric value`` rows
(plans/metrics.py), keeps the noise-robust min per grid point across
runs, and writes two charts to ``results/``:

- ``sweep_kn.svg``   — reduce time vs chars/doc, one line per k
                       (the k x N grid, bench.SWEEP_KS x SWEEP_NS)
- ``sweep_ls.svg``   — reduce time vs shuffle partitions at fixed N
                       (the local-size permutation sweep, bench.SWEEP_LS)

Usage: python scripts/plot_points.py [points.txt [outdir]]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import MAG_KS, MAG_NS, SWEEP_KS, SWEEP_LS, SWEEP_NS  # noqa: E402

# validated categorical palette (dataviz reference instance; fixed
# slot order, direct labels carry identity alongside color)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
SURFACE, INK, INK2, GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e4e3df"
W, H, ML, MR, MT, MB = 640, 400, 64, 88, 44, 52


def parse_points(path: str) -> list[dict]:
    rows = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if len(parts) != 7:
                continue
            try:
                rows.append(
                    dict(
                        N=int(parts[0]), k=int(parts[1]), ls=int(parts[2]),
                        metric=int(parts[5]), value=float(parts[6]),
                    )
                )
            except ValueError:
                continue
    return rows


def min_by(rows: list[dict], key) -> dict:
    """Noise-robust estimate: min value per grid point across appended runs."""
    best: dict = {}
    for r in rows:
        kk = key(r)
        if kk not in best or r["value"] < best[kk]:
            best[kk] = r["value"]
    return best


def _svg_frame(title: str, x_label: str, y_label: str, body: str) -> str:
    return f"""<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}"
     viewBox="0 0 {W} {H}" font-family="system-ui, sans-serif">
  <rect width="{W}" height="{H}" fill="{SURFACE}"/>
  <text x="{ML}" y="24" font-size="14" font-weight="600" fill="{INK}">{title}</text>
  <text x="{(ML + W - MR) / 2:.0f}" y="{H - 10}" font-size="11"
        text-anchor="middle" fill="{INK2}">{x_label}</text>
  <text x="14" y="{(MT + H - MB) / 2:.0f}" font-size="11" text-anchor="middle"
        fill="{INK2}" transform="rotate(-90 14 {(MT + H - MB) / 2:.0f})">{y_label}</text>
{body}
</svg>
"""


def _axes(xs: list[float], ys: list[float]):
    """Linear scales with padded y starting at 0 (magnitude axis)."""
    x0, x1 = min(xs), max(xs)
    y1 = max(ys) * 1.08 or 1.0
    px0, px1, py0, py1 = ML, W - MR, H - MB, MT

    def sx(v: float) -> float:
        return px0 + (v - x0) / (x1 - x0 or 1) * (px1 - px0)

    def sy(v: float) -> float:
        return py0 - v / y1 * (py0 - py1)

    return sx, sy, y1


def _grid_and_yticks(sy, y1: float) -> str:
    out = []
    step = max(round(y1 / 4), 1)
    v = 0.0
    while v <= y1:
        y = sy(v)
        out.append(
            f'  <line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}" '
            f'stroke="{GRID}" stroke-width="1"/>'
        )
        out.append(
            f'  <text x="{ML - 8}" y="{y + 4:.1f}" font-size="10" '
            f'text-anchor="end" fill="{INK2}">{v:g}</text>'
        )
        v += step
    return "\n".join(out)


def plot_lines(
    series: list[tuple[str, list[tuple[float, float]]]],
    title: str,
    x_label: str,
    y_label: str,
    x_ticks: list[float],
    x_tick_fmt=lambda v: f"{v:g}",
) -> str:
    xs = [p[0] for _, pts in series for p in pts]
    ys = [p[1] for _, pts in series for p in pts]
    sx, sy, y1 = _axes(xs, ys)
    body = [_grid_and_yticks(sy, y1)]
    for v in x_ticks:
        body.append(
            f'  <text x="{sx(v):.1f}" y="{H - MB + 18}" font-size="10" '
            f'text-anchor="middle" fill="{INK2}">{x_tick_fmt(v)}</text>'
        )
    body.append(
        f'  <line x1="{ML}" y1="{H - MB}" x2="{W - MR}" y2="{H - MB}" '
        f'stroke="{INK2}" stroke-width="1"/>'
    )
    labels = []
    for i, (label, pts) in enumerate(series):
        color = SERIES[i % len(SERIES)]
        d = " ".join(
            f"{'M' if j == 0 else 'L'}{sx(x):.1f},{sy(y):.1f}"
            for j, (x, y) in enumerate(pts)
        )
        body.append(
            f'  <path d="{d}" fill="none" stroke="{color}" stroke-width="2"/>'
        )
        for x, y in pts:
            body.append(
                f'  <circle cx="{sx(x):.1f}" cy="{sy(y):.1f}" r="3.5" '
                f'fill="{color}" stroke="{SURFACE}" stroke-width="2"/>'
            )
        lx, ly = pts[-1]
        labels.append([sx(lx) + 10, sy(ly) + 4, label])
    # direct labels at line ends (identity never color-alone), nudged
    # apart top-down so close line ends can't overlap the text
    labels.sort(key=lambda t: t[1])
    for j in range(1, len(labels)):
        labels[j][1] = max(labels[j][1], labels[j - 1][1] + 13)
    for x, y, label in labels:
        body.append(
            f'  <text x="{x:.1f}" y="{y:.1f}" font-size="11" '
            f'fill="{INK}">{label}</text>'
        )
    return _svg_frame(title, x_label, y_label, "\n".join(body))


def main() -> None:
    points = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "points.txt")
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "results")
    os.makedirs(outdir, exist_ok=True)
    rows = [r for r in parse_points(points) if r["metric"] == 0 and r["value"] > 0]

    # k x N grid: the same selection the bench wrote (SWEEP_KS x SWEEP_NS)
    grid = min_by(
        [r for r in rows if r["k"] in SWEEP_KS and r["N"] in SWEEP_NS],
        lambda r: (r["k"], r["N"]),
    )
    if grid:
        series = [
            (f"k={k}", [(n, grid[(k, n)]) for n in SWEEP_NS if (k, n) in grid])
            for k in SWEEP_KS
        ]
        series = [(lbl, pts) for lbl, pts in series if pts]
        svg = plot_lines(
            series,
            "k-mer reduce time by corpus truncation",
            "chars per document (N)",
            "time (ms)",
            [float(n) for n in SWEEP_NS],
        )
        with open(os.path.join(outdir, "sweep_kn.svg"), "w") as fh:
            fh.write(svg)
        print(f"wrote {outdir}/sweep_kn.svg ({len(series)} series)")

    # local-size permutation sweep: k=8, N=400, ls in SWEEP_LS
    ls_rows = min_by(
        [r for r in rows if r["ls"] in SWEEP_LS and r["k"] == 8 and r["N"] == 400],
        lambda r: r["ls"],
    )
    if ls_rows:
        import math

        pts = [(math.log2(ls), ls_rows[ls]) for ls in sorted(ls_rows)]
        svg = plot_lines(
            [("k=8, N=400", pts)],
            "reduce time by shuffle-partition count",
            "shuffle partitions (log2)",
            "time (ms)",
            [math.log2(v) for v in sorted(ls_rows)],
            x_tick_fmt=lambda v: f"{int(2 ** v)}",
        )
        with open(os.path.join(outdir, "sweep_ls.svg"), "w") as fh:
            fh.write(svg)
        print(f"wrote {outdir}/sweep_ls.svg ({len(pts)} points)")

    # reference-magnitude grid (bench.MAG_KS x MAG_NS, N to 5M chars):
    # log-x so the 1000x N range reads as decades
    mag = min_by(
        [r for r in rows if r["k"] in MAG_KS and r["N"] in MAG_NS],
        lambda r: (r["k"], r["N"]),
    )
    if mag:
        import math

        series = [
            (
                f"k={k}",
                [
                    (math.log10(n), mag[(k, n)])
                    for n in MAG_NS
                    if (k, n) in mag
                ],
            )
            for k in MAG_KS
        ]
        series = [(lbl, pts) for lbl, pts in series if pts]
        svg = plot_lines(
            series,
            "k-mer reduce time at reference magnitudes",
            "chars per document (log10 N)",
            "time (ms)",
            [math.log10(n) for n in MAG_NS],
            x_tick_fmt=lambda v: f"1e{int(round(v))}",
        )
        with open(os.path.join(outdir, "sweep_magnitude.svg"), "w") as fh:
            fh.write(svg)
        print(f"wrote {outdir}/sweep_magnitude.svg ({len(series)} series)")


if __name__ == "__main__":
    main()
