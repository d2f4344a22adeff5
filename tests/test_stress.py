"""Adversarial stress battery (VERDICT round-2 item 1): the CI-scale
qualification of the estimator on hostile inputs — aggressive 6-DoF
excitation, stop-and-go, degeneracy transitions, IMU dropout, degraded and
outlier-laden scans, range-dependent noise, and far-mode scenes.

The reference qualifies on recorded challenge bags with a 10 cm
return-to-origin gate (script/save_benchmark_result.py:211-269); no bags
exist here, so io.scenarios generates the battery.  tools/stress_matrix.py
runs the SAME cases at full density against the tuned ship config and the
reference-envelope config; this file runs them at CI scale with a small
velodyne-like profile.
"""

import dataclasses

import numpy as np
import pytest

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

BATTERY = {c.name: c for c in sc.stress_battery(points_per_scan=4096)}


def _cfg(overrides: dict):
    sensor = SensorProfile(
        name="velodyne", n_scan_lines=16, max_points=4096, min_range=0.2,
        max_range=130.0, filter_point_size=1, max_surface_features=1024,
        max_edge_features=128, scan_period=0.1, default_line_res=0.1,
        default_plane_res=0.2,
    )
    cfg = PipelineConfig(
        sensor=sensor,
        map=MapConfig(table_size=1 << 13, cell_capacity=16),
        registration=RegistrationConfig(max_icp_iters=2, max_gn_iters=2),
        imu=ImuConfig(window_size=4, smoother_gn_iters=2),
        auto_voxel_size=False,
    )
    return dataclasses.replace(cfg, **overrides)


@pytest.mark.parametrize("name", sorted(BATTERY))
def test_stress_case(name, rng):
    case = BATTERY[name]
    ds = case.build(rng)
    runner = OdometryRunner(_cfg(case.cfg_overrides))
    sc.prime_prior_map(runner, case, rng)
    res = runner.run_dataset(ds, use_imu=True)

    assert np.all(np.isfinite(res.poses_t)), f"{name}: non-finite poses"
    s = case.settle
    ate = ate_rmse(res.poses_t[s:], np.asarray(ds.gt_poses_t)[s:])
    assert ate < case.ate_bound, f"{name}: ATE {ate:.3f} > {case.ate_bound}"
    if case.check is not None:
        case.check(res, ds, s)
    if case.post_check is not None:
        case.post_check(runner, res, ds, s)


def test_imu_dropout_actually_drops(rng):
    """The dropout window really removes IMU aiding for the covered scans
    (guards against the battery silently passing with IMU everywhere)."""
    case = BATTERY["imu_dropout"]
    ds = case.build(rng)
    # gap exists in the stream
    gaps = np.diff(ds.imu.t)
    assert gaps.max() > 1.0, gaps.max()
    runner = OdometryRunner(_cfg({}))
    res = runner.run_dataset(ds, use_imu=True)
    # scans inside (3.0, 4.5) fall back to non-IMU prediction but still track
    assert np.all(np.isfinite(res.poses_t))
