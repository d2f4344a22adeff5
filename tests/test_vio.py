"""6-DoF VIO-path undistortion (reference removePointDistortion<Odometry>,
featureExtraction.cpp:236-249,462-468): rotation-only IMU undistortion
leaves a v * scan_period translation smear; the posed path removes it."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from superodom_tpu.config import (
    ImuConfig,
    MapConfig,
    PipelineConfig,
    RegistrationConfig,
    SensorProfile,
)
from superodom_tpu.io import scenarios as sc
from superodom_tpu.io.datasets import ate_rmse
from superodom_tpu.runner import OdometryRunner


def _small_cfg(**kw):
    sensor = SensorProfile(
        name="velodyne", n_scan_lines=16, max_points=4096, min_range=0.2,
        max_range=130.0, filter_point_size=1, max_surface_features=1024,
        max_edge_features=128, scan_period=0.1, default_line_res=0.1,
        default_plane_res=0.2,
    )
    return PipelineConfig(
        sensor=sensor,
        map=MapConfig(table_size=1 << 13, cell_capacity=16),
        registration=RegistrationConfig(max_icp_iters=2, max_gn_iters=2),
        imu=ImuConfig(window_size=4, smoother_gn_iters=2),
        auto_voxel_size=False,
        **kw,
    )


def test_posed_undistortion_removes_translation_smear(rng):
    """Unit level: a translating-only sweep is exactly recovered by the
    posed path while the rotation-only path cannot touch it."""
    from superodom_tpu.frontend import undistort_points_posed

    v = np.array([8.0, 0.0, 0.0])  # fast translation, no rotation
    n = 512
    t_rel = np.sort(rng.uniform(0, 0.1, n)).astype(np.float32)
    pts_w = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    # body-frame observation at each point's time: p_b = p_w - v * t
    xyz = (pts_w - v[None, :] * t_rel[:, None]).astype(np.float32)

    k = 8
    path_t = np.linspace(-0.05, 0.2, k).astype(np.float32)
    path_q = np.tile(np.array([1, 0, 0, 0], np.float32), (k, 1))
    path_p = (v[None, :] * path_t[:, None]).astype(np.float32)
    out, q0, p0 = undistort_points_posed(
        jnp.asarray(xyz), jnp.asarray(t_rel), jnp.ones((n,), bool),
        0.0, jnp.asarray(path_t), jnp.asarray(path_q), jnp.asarray(path_p),
        jnp.ones((k,), bool),
    )
    # scan-start frame == world frame here (pose at t=0 is identity)
    np.testing.assert_allclose(np.asarray(out), pts_w, atol=1e-3)
    # the smear the rotation-only path would have left
    assert float(np.abs(np.asarray(xyz) - pts_w).max()) > 0.5


def test_vio_undistortion_fixes_fast_translation_ate(rng):
    """Pipeline level: at 7 m/s the rotation-only path measurably biases
    the trajectory; the posed path fixes it (VERDICT round-2 item 3)."""
    traj = sc.straight_traj(duration=5.0, speed=7.0, static_sec=1.5)
    world = sc.box_world((25.0, 10.0, 4.0), center=(15.0, 0.0, 0.0))
    ds = sc.make_scenario(
        rng, traj, world, n_scans=45, points_per_scan=4096, vio=True
    )

    ates = {}
    for use_vio in (False, True):
        cfg = _small_cfg(use_vio_undistortion=use_vio)
        runner = OdometryRunner(cfg)
        res = runner.run_dataset(ds, use_imu=True)
        ates[use_vio] = ate_rmse(res.poses_t, np.asarray(ds.gt_poses_t))

    # rotation-only: the 0.7 m smear biases the estimate measurably;
    # posed undistortion recovers most of it
    assert ates[True] < ates[False] * 0.6, ates
    assert ates[False] > 0.02, ates


def test_vio_window_coverage_gate(rng):
    """A VIO stream that stops mid-run must fall back to the IMU path (no
    stale prior, vio_available drops)."""
    traj = sc.straight_traj(duration=4.0, speed=3.0, static_sec=1.5)
    world = sc.box_world((20.0, 10.0, 4.0), center=(8.0, 0.0, 0.0))
    ds = sc.make_scenario(
        rng, traj, world, n_scans=40, points_per_scan=4096, vio=True
    )
    # truncate the VIO stream at t = 2.5 s (scan ~25 onward uncovered)
    keep = ds.vio.t < 2.5
    ds = ds._replace(vio=sc.VioStream(
        t=ds.vio.t[keep], q=ds.vio.q[keep], p=ds.vio.p[keep]))

    cfg = _small_cfg(use_vio_undistortion=True)
    runner = OdometryRunner(cfg)
    res = runner.run_dataset(ds, use_imu=True)
    # still tracks (IMU fallback), and the run completes with finite poses
    assert np.all(np.isfinite(res.poses_t))
    ate = ate_rmse(res.poses_t, np.asarray(ds.gt_poses_t))
    assert ate < 0.5, ate
