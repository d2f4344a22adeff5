import json

import numpy as np

from superodom_tpu.tools import benchmark as bm
from superodom_tpu.tools import visualize as viz


class FakeRun:
    def __init__(self, poses_t, poses_q=None, stats=None):
        self.poses_t = poses_t
        self.poses_q = poses_q if poses_q is not None else np.tile(
            [1.0, 0, 0, 0], (len(poses_t), 1))
        self.smoothed_t = poses_t
        self.stats = stats or []
        self.wall_time_s = 1.0
        self.scans_per_sec = float(len(poses_t))


def test_return_to_origin_pass_fail():
    good = np.zeros((10, 3))
    good[5] = [1, 1, 0]
    rep = bm.return_to_origin_report(good)
    assert rep["pass"] and rep["distance_m"] == 0.0
    bad = good.copy()
    bad[-1] = [0.2, 0, 0]
    rep = bm.return_to_origin_report(bad)
    assert not rep["pass"]
    assert abs(rep["distance_m"] - 0.2) < 1e-9


def test_ate_and_rpe(rng):
    gt = rng.normal(size=(50, 3))
    est = gt + 0.05
    ate = bm.ate_report(est, gt)
    np.testing.assert_allclose(ate["rmse_m"], np.sqrt(3) * 0.05, atol=1e-6)
    rpe = bm.relative_pose_error(est, gt, delta=5)
    np.testing.assert_allclose(rpe["rpe_rmse_m"], 0.0, atol=1e-6)


def test_stats_summary():
    stats = [
        {"surf_stack": 100, "surf_map": 1000, "n_iterations": 3,
         "degenerate": False, "imu_healthy": True, "pred_source": 0,
         "uncertainty": [0.1] * 6},
        {"surf_stack": 200, "surf_map": 2000, "n_iterations": 4,
         "degenerate": True, "imu_healthy": False, "pred_source": 4,
         "uncertainty": [0.2] * 6},
    ]
    s = bm.stats_summary(stats)
    assert s["n_scans"] == 2
    assert s["degenerate_frames"] == 1
    assert s["imu_unhealthy_frames"] == 1
    assert s["surf_map_final"] == 2000
    np.testing.assert_allclose(s["uncertainty_mean"], [0.15] * 6)


def test_full_report_and_write(tmp_path, rng):
    t = rng.normal(size=(20, 3)).astype(np.float64)
    t[-1] = t[0]
    run = FakeRun(t)
    rep = bm.full_report(run, gt_t=t)
    assert rep["return_to_origin"]["pass"]
    assert rep["ate"]["rmse_m"] == 0.0
    p = tmp_path / "report.json"
    bm.write_report(str(p), rep)
    assert json.loads(p.read_text())["scans_per_sec"] == 20.0


def test_visualize_exports(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    viz.write_ply(str(tmp_path / "m.ply"), pts)
    text = (tmp_path / "m.ply").read_text()
    assert "element vertex 100" in text

    run = FakeRun(rng.normal(size=(10, 3)))
    viz.export_run(str(tmp_path / "run"), run)
    lines = (tmp_path / "run" / "trajectory_tum.txt").read_text().splitlines()
    assert len(lines) == 10 and len(lines[0].split()) == 8


def test_device_sync_pytrees_and_relay_floor_structure():
    """device_sync must accept arbitrary pytrees (incl. no-array trees)
    and relay_floor.measure must emit the derived floor fields it
    documents — both run on whatever backend the suite uses."""
    import jax.numpy as jnp

    from superodom_tpu.runner import device_sync
    from tools import relay_floor

    device_sync({"a": jnp.arange(4), "b": (jnp.ones(()), None)})
    device_sync([])  # no arrays: must be a no-op, not an error
    device_sync(np.zeros(3))  # host-only leaves are ignored

    out = relay_floor.measure(chunk=10)
    for key in ("rpc_ms_tiny_put", "exec_ms_trivial", "sync_ms_ready",
                "backend"):
        assert key in out, key
    assert out["rpc_ms_tiny_put"] >= 0.0
