"""Stats plotting tool (tools/plot_stats.py; reference
save_superodom_stats_matplotlib.py / save_imu_vs_icp.py parity): the
figures and the CSV archive render from a real stats stream."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

matplotlib = pytest.importorskip("matplotlib")

from tools import plot_stats  # noqa: E402


def _fake_stats(n=30):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        out.append({
            "i": i, "t": 0.1 * i,
            "surf_stack": 1000, "surf_map": 100 * i + 50,
            "n_iterations": int(rng.integers(1, 5)),
            "time_elapsed_ms": float(rng.uniform(3, 8)),
            "latency_ms": float(rng.uniform(3, 9)),
            "uncertainty": rng.uniform(0, 1, 6).tolist(),
            "pred_source": int(rng.integers(0, 4)),
            "degenerate": bool(i in (10, 11)),
            "total_translation": float(rng.uniform(0, 0.05)),
            "total_rotation": float(rng.uniform(0, 0.01)),
            "plane_rejection_hist": rng.integers(0, 900, 7).tolist(),
        })
    return out


def test_plots_and_csv_render(tmp_path):
    stats = _fake_stats()
    p = tmp_path / "stats.jsonl"
    with open(p, "w") as f:
        for s in stats:
            f.write(json.dumps(s) + "\n")
    plot_stats.main([str(tmp_path), "--csv"])
    for name in ("stats.png", "imu_vs_icp.png", "stats.csv"):
        f = tmp_path / name
        assert f.exists() and f.stat().st_size > 1000, name
    # CSV archives one row per scan with the uncertainty columns expanded
    rows = (tmp_path / "stats.csv").read_text().strip().splitlines()
    assert len(rows) == len(stats) + 1
    assert "uncertainty_yaw" in rows[0]


def test_accepts_direct_file_path(tmp_path):
    stats = _fake_stats(5)
    p = tmp_path / "s.jsonl"
    with open(p, "w") as f:
        for s in stats:
            f.write(json.dumps(s) + "\n")
    out = tmp_path / "plots"
    plot_stats.main([str(p), "--out", str(out)])
    assert (out / "stats.png").exists()
