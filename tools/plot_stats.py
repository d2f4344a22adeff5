"""Stats plotting / trend tooling (VERDICT r4 missing #2): render the
per-scan OptimizationStats stream a run writes to ``stats.jsonl`` into
diagnostic figures, plus the prediction-vs-solve agreement plot.

Reference analogues:
  script/save_superodom_stats_matplotlib.py — archives + plots the
    OptimizationStats stream (iterations, solve time, latency, feature
    counts, uncertainties)
  script/save_imu_vs_icp.py:18-31 — IMU-prediction vs ICP-result
    agreement (here: ``total_translation`` / ``total_rotation`` are the
    per-scan |prediction - solved pose| deltas, the same signal)

Usage:
  python tools/plot_stats.py /tmp/run1            # dir with stats.jsonl
  python tools/plot_stats.py stats.jsonl --out /tmp/plots
  python tools/plot_stats.py run/ --csv           # also export stats.csv

Writes ``stats.png`` (six-panel overview) and ``imu_vs_icp.png``
(prediction agreement).  This is the diagnostic that makes a regression
like round-4's axis-hold visible: a frozen axis shows up as a flat-lining
prediction correction against a rising uncertainty share.
"""

import argparse
import csv
import json
import os
import sys

# fixed categorical order (validated palette, light mode), never cycled
C1, C2, C3, C4, C5, C6 = ("#2a78d6", "#eb6834", "#1baf7a",
                          "#eda100", "#e87ba4", "#008300")
GRID = dict(color="#e4e3df", linewidth=0.6)
TEXT2 = "#52514e"

PRED_SOURCE_NAMES = {0: "IMU_ORIENT", 1: "LIO", 2: "VIO", 3: "CONST_VEL",
                     4: "NONE"}


def load_stats(path):
    """Accept a stats.jsonl file or a run directory containing one."""
    if os.path.isdir(path):
        path = os.path.join(path, "stats.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _style(ax, title, ylabel=""):
    ax.set_title(title, fontsize=9, loc="left", color="#0b0b0b")
    ax.grid(True, **GRID)
    ax.set_axisbelow(True)
    ax.tick_params(labelsize=7, colors=TEXT2)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c9c8c3")
    if ylabel:
        ax.set_ylabel(ylabel, fontsize=7, color=TEXT2)


def plot_overview(stats, out_png):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    i = np.array([s["i"] for s in stats])
    fig, axes = plt.subplots(3, 2, figsize=(11, 8), dpi=120)
    fig.patch.set_facecolor("#fcfcfb")

    ax = axes[0][0]
    ax.plot(i, [s["surf_stack"] for s in stats], color=C1, lw=1.2,
            label="scan surf features")
    ax.plot(i, [s["surf_map"] for s in stats], color=C2, lw=1.2,
            label="map surf features")
    ax.set_yscale("log")
    _style(ax, "Feature counts (scan vs map)", "count (log)")
    ax.legend(fontsize=7, frameon=False)

    ax = axes[0][1]
    ax.plot(i, [s["n_iterations"] for s in stats], color=C1, lw=1.2)
    _style(ax, "ICP outer iterations per scan", "iterations")

    ax = axes[1][0]
    ax.plot(i, [s["time_elapsed_ms"] for s in stats], color=C1, lw=1.2,
            label="step time")
    ax.plot(i, [s["latency_ms"] for s in stats], color=C2, lw=1.2,
            label="latency")
    _style(ax, "Per-scan time (OptimizationStats.msg:9-10)", "ms")
    ax.legend(fontsize=7, frameon=False)

    ax = axes[1][1]
    unc = np.array([s["uncertainty"] for s in stats])  # [n, 6]
    names = ("x", "y", "z", "roll", "pitch", "yaw")
    for k, (name, color) in enumerate(zip(names, (C1, C2, C3, C4, C5, C6))):
        ax.plot(i, unc[:, k], color=color, lw=1.0, label=name)
    _style(ax, "Per-axis observability shares (uncertainty topic)", "share")
    ax.legend(fontsize=6, frameon=False, ncol=3)

    ax = axes[2][0]
    src = np.array([s["pred_source"] for s in stats])
    ax.step(i, src, color=C1, lw=1.2, where="post")
    deg = np.array([bool(s["degenerate"]) for s in stats])
    if deg.any():
        ax.fill_between(i, -0.5, 4.5, where=deg, color=C2, alpha=0.18,
                        linewidth=0, label="degenerate")
        ax.legend(fontsize=7, frameon=False)
    ax.set_yticks(sorted(PRED_SOURCE_NAMES))
    ax.set_yticklabels([PRED_SOURCE_NAMES[k]
                        for k in sorted(PRED_SOURCE_NAMES)], fontsize=6)
    _style(ax, "Prediction source / degeneracy flag")

    ax = axes[2][1]
    hist = np.array([s["plane_rejection_hist"] for s in stats])  # [n, 7]
    labels = ("success", "unknown", "too far", "not enough", "bad PCA",
              "bad fit", "masked")
    colors = (C3, TEXT2, C2, C4, C5, C6, "#c9c8c3")
    for k in range(min(hist.shape[1], 7)):
        ax.plot(i, hist[:, k], lw=1.0, color=colors[k], label=labels[k])
    _style(ax, "Plane-match rejection taxonomy (LidarSlam.h:85-94)",
           "count")
    ax.legend(fontsize=6, frameon=False, ncol=2)

    for ax in axes[-1]:
        ax.set_xlabel("scan", fontsize=7, color=TEXT2)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=fig.get_facecolor())
    plt.close(fig)
    return out_png


def plot_imu_vs_icp(stats, out_png):
    """Prediction-vs-solve agreement (reference save_imu_vs_icp.py): the
    per-scan correction the ICP applied ON TOP of the inertial/CV
    prediction.  Persistent growth = the prediction path is drifting;
    a flat-line at zero while uncertainty shares fall = an axis freeze."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    i = np.array([s["i"] for s in stats])
    dt = np.array([s["total_translation"] for s in stats])
    dr = np.degrees([s["total_rotation"] for s in stats])
    fig, axes = plt.subplots(2, 1, figsize=(11, 5), dpi=120, sharex=True)
    fig.patch.set_facecolor("#fcfcfb")

    w = max(1, len(i) // 40)
    roll = np.convolve(dt, np.ones(w) / w, mode="same")
    axes[0].plot(i, dt, color=C1, lw=0.9, label="per-scan")
    axes[0].plot(i, roll, color=C2, lw=1.6, label=f"rolling mean ({w})")
    _style(axes[0], "ICP correction on top of the prediction — translation",
           "m")
    axes[0].legend(fontsize=7, frameon=False)

    axes[1].plot(i, dr, color=C1, lw=0.9)
    _style(axes[1], "ICP correction on top of the prediction — rotation",
           "deg")
    axes[1].set_xlabel("scan", fontsize=7, color=TEXT2)

    fig.tight_layout()
    fig.savefig(out_png, facecolor=fig.get_facecolor())
    plt.close(fig)
    return out_png


def export_csv(stats, out_csv):
    """Flat archive of the stream (reference save_superodom_stats.py:22-60
    archives the same fields for trend comparison across runs)."""
    scalar_keys = [k for k, v in stats[0].items()
                   if not isinstance(v, (list, dict))]
    with open(out_csv, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(scalar_keys
                    + [f"uncertainty_{n}"
                       for n in ("x", "y", "z", "roll", "pitch", "yaw")])
        for s in stats:
            wr.writerow([s[k] for k in scalar_keys] + list(s["uncertainty"]))
    return out_csv


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="stats.jsonl or a run directory")
    ap.add_argument("--out", help="output directory (default: next to input)")
    ap.add_argument("--csv", action="store_true", help="also export CSV")
    args = ap.parse_args(argv)
    stats = load_stats(args.path)
    if not stats:
        raise SystemExit("no stats records found")
    base = args.out or (args.path if os.path.isdir(args.path)
                        else os.path.dirname(os.path.abspath(args.path)))
    os.makedirs(base, exist_ok=True)
    print(plot_overview(stats, os.path.join(base, "stats.png")))
    print(plot_imu_vs_icp(stats, os.path.join(base, "imu_vs_icp.png")))
    if args.csv:
        print(export_csv(stats, os.path.join(base, "stats.csv")))


if __name__ == "__main__":
    main()
