"""Alignment-risk / degeneracy detection in degenerate geometry
(reference EstimateRegistrationError, LidarSlam.cpp:854-889: BOTH the
position and orientation blocks of the tangent-space covariance are
analyzed; either one can flag the frame)."""

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


def _run(rng, world, traj, n_scans, **cfg_kw):
    ds = sc.make_scenario(rng, traj, world, n_scans=n_scans,
                          points_per_scan=4096)
    runner = OdometryRunner(_small_cfg(**cfg_kw))
    res = runner.run_dataset(ds, use_imu=True)
    return res


def test_cylinder_hall_fires_orientation_degeneracy(rng):
    """Featureless cylinder hall: position is constrained (shell + floor +
    ceiling) but rotation about the axis is unobservable — the ORIENTATION
    inverse condition number collapses while the position block stays
    healthy, and the combined flag fires (VERDICT round-2 item 5: the
    ori_degeneracy_threshold knob must be live)."""
    # a LARGE hall: the yaw-information leak from chord-plane normal tilt is
    # ~radius-independent while roll/pitch stiffness grows with radius, so
    # the orientation condition number separates cleanly at r=20
    traj = sc.straight_traj(duration=2.5, speed=0.4, static_sec=1.5)
    world = sc.cylinder_hall_world(radius=20.0, height=10.0)
    res = _run(rng, world, traj, n_scans=30)

    # settled frames (map warm, startup done)
    settled = res.stats[20:]
    pos_ic = np.array([s["pos_inverse_condition"] for s in settled])
    deg = np.array([s["degenerate"] for s in settled])
    # position block healthy (x/y from shell curvature, z from floor)...
    assert np.median(pos_ic) > 0.1, np.median(pos_ic)
    # ...yet the frame is flagged degenerate -> orientation block fired
    assert deg.mean() > 0.8, deg.mean()
    # and the weak rotation axis is the hall axis (z = yaw)
    dirs = np.array([s["orientation_error_dir"] for s in settled])
    assert np.median(np.abs(dirs[:, 2])) > 0.9, dirs


def test_box_room_not_degenerate(rng):
    """Fully constraining geometry: neither block fires (guards against a
    trigger-happy orientation threshold)."""
    traj = sc.straight_traj(duration=2.5, speed=0.4, static_sec=1.5)
    world = sc.box_world((10.0, 8.0, 3.0))
    res = _run(rng, world, traj, n_scans=30)
    deg = np.array([s["degenerate"] for s in res.stats[20:]])
    assert deg.mean() < 0.2, deg.mean()


def test_corridor_fires_position_degeneracy(rng):
    """Open-ended corridor: translation along the axis is unobservable —
    the POSITION block's condition collapses (vs ~0.6 in a closed room) and
    the error DIRECTION points down the corridor axis (the SuperLoc-style
    alignment-risk scenario; position_error_dir per LidarSlam.h:127-151)."""
    traj = sc.straight_traj(duration=2.5, speed=0.5, static_sec=1.5)
    world = sc.corridor_world(length=80.0, width=4.0, height=3.0, x0=-40.0)
    res = _run(rng, world, traj, n_scans=30)
    settled = res.stats[20:]
    pos_ic = np.array([s["pos_inverse_condition"] for s in settled])
    deg = np.array([s["degenerate"] for s in settled])
    dirs = np.array([s["position_error_dir"] for s in settled])
    assert np.median(pos_ic) < 0.2, np.median(pos_ic)
    # the weak direction is the corridor axis (x)
    assert np.median(np.abs(dirs[:, 0])) > 0.95, dirs
    assert deg.mean() > 0.8, deg.mean()
