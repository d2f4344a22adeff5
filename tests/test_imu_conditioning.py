"""End-to-end IMU conditioning: tilted + off-center IMU mounting.

The raw IMU stream is synthesized in a TILTED, OFF-CENTER IMU frame
(R_imu_laser = 30 deg pitch, t_imu_laser nonzero); the runner must recover
the laser-frame measurements via the native buffer's conditioning chain
(rotation + lever-arm transport + gravity alignment — the reference's
imuConverter + Imu::imuInit, imuPreintegration.cpp:486-541,
imu_data.h:71-160).  Without conditioning, the smoother's gravity
assumption breaks by g*sin(30deg) ~ 4.9 m/s^2 and the smoothed trajectory
diverges — which is exactly what round 1 shipped.
"""

import dataclasses

import numpy as np
import pytest

from superodom_tpu.config import (
    Extrinsics,
    ImuConfig,
    MapConfig,
    PipelineConfig,
    RegistrationConfig,
    VLP_16,
)
from superodom_tpu.io.datasets import BoxWorld, SimImu, ate_rmse, make_dataset
from superodom_tpu.runner import OdometryRunner

PITCH = np.deg2rad(30.0)
R_IL = np.array([  # laser -> imu: 30 deg pitch about y
    [np.cos(PITCH), 0.0, np.sin(PITCH)],
    [0.0, 1.0, 0.0],
    [-np.sin(PITCH), 0.0, np.cos(PITCH)],
])
T_IL = np.array([0.15, -0.08, 0.05])  # laser origin in the imu frame


def _imu_to_raw_frame(imu: SimImu, rate: float = 200.0) -> SimImu:
    """Re-express simulated laser-frame IMU samples in the tilted,
    off-center IMU frame (inverse of the conditioning transport)."""
    gyr_l = np.asarray(imu.gyr, np.float64)
    acc_l = np.asarray(imu.acc, np.float64)
    gyr_i = gyr_l @ R_IL.T
    # angular acceleration by the same finite difference the conditioner uses
    alpha_i = np.zeros_like(gyr_i)
    alpha_i[1:] = (gyr_i[1:] - gyr_i[:-1]) * rate
    acc_i = acc_l @ R_IL.T
    acc_i = acc_i - np.cross(alpha_i, T_IL) - np.cross(
        gyr_i, np.cross(gyr_i, T_IL))
    return SimImu(t=imu.t, acc=acc_i.astype(np.float32),
                  gyr=gyr_i.astype(np.float32))


def _cfg():
    return PipelineConfig(
        sensor=dataclasses.replace(VLP_16, max_points=4096,
                                   max_surface_features=1024),
        map=MapConfig(table_size=1 << 14, cell_capacity=16),
        registration=RegistrationConfig(),
        imu=ImuConfig(window_size=4),
        extrinsics=Extrinsics.from_arrays(R_IL, T_IL),
        auto_voxel_size=False,
    )


@pytest.fixture(scope="module")
def tilted_dataset():
    rng = np.random.default_rng(17)
    ds = make_dataset(
        rng, n_scans=40, points_per_scan=4096,
        world=BoxWorld(half_extent=np.array([10.0, 8.0, 4.0])),
        radius=2.0, laps=0.5, static_scans=15,
        gyr_bias=(0.004, -0.002, 0.003), acc_bias=(0.0, 0.0, 0.0),
    )
    return ds._replace(imu=_imu_to_raw_frame(ds.imu))


def test_conditioning_recovers_laser_frame(tilted_dataset):
    """The conditioned window must match the original laser-frame samples:
    gravity along +z, gyro bias removed."""
    cfg = _cfg()
    runner = OdometryRunner(cfg)
    imu = tilted_dataset.imu
    for i in range(len(imu.t)):
        runner.add_imu(imu.t[i], imu.acc[i], imu.gyr[i])
    assert runner.imu_buf.initialized
    acc_mean, gyr_bias, q0 = runner.imu_init
    # conditioned static acc is gravity along +z of the LASER frame
    np.testing.assert_allclose(
        acc_mean, [0.0, 0.0, 9.80511], atol=0.05)
    # recovered bias = R_li @ (R_il @ bias_laser) = the simulated bias
    np.testing.assert_allclose(gyr_bias, [0.004, -0.002, 0.003], atol=5e-4)
    # static window: conditioned gyr near zero after bias removal
    t, acc, gyr, q = runner.imu_buf.window(0.2, 0.6, 32)
    assert np.abs(gyr).max() < 0.01
    np.testing.assert_allclose(acc[:, 2], 9.80511, atol=0.2)


def test_tilted_imu_tracks_with_conditioning(tilted_dataset):
    """Full pipeline on the tilted rig: conditioning keeps both the primary
    and the SMOOTHED trajectory tracking; disabling it (round-1 behavior:
    raw samples + extrinsic rotation only) breaks the smoothed output."""
    gt = np.asarray(tilted_dataset.gt_poses_t)

    cfg = _cfg()
    runner = OdometryRunner(cfg)  # condition_imu=True default
    res = runner.run_dataset(tilted_dataset, use_imu=True, warmup=False)
    ate = ate_rmse(res.poses_t, gt)
    smooth_err = float(np.linalg.norm(res.smoothed_t - res.poses_t,
                                      axis=1).max())
    ba_max = max(
        float(np.linalg.norm(s["acc_bias"])) for s in res.stats)
    unhealthy = sum(not s["imu_healthy"] for s in res.stats)
    assert ate < 0.25, f"primary ATE too high with conditioning: {ate}"
    assert smooth_err < 0.5, (
        f"smoothed diverges from primary despite conditioning: {smooth_err}")
    assert unhealthy == 0, f"failure gates tripped despite conditioning"

    runner_raw = OdometryRunner(cfg, condition_imu=False)
    res_raw = runner_raw.run_dataset(tilted_dataset, use_imu=True,
                                     warmup=False)
    ba_max_raw = max(
        float(np.linalg.norm(s["acc_bias"])) for s in res_raw.stats)
    smooth_err_raw = float(np.linalg.norm(
        res_raw.smoothed_t - res_raw.poses_t, axis=1).max())
    # without conditioning the gravity leak (g*sin 30 deg ~ 4.9 m/s^2) has
    # nowhere consistent to go: the marginalizing smoother absorbs part of
    # it into a ballooned acc bias and tilted/offset window states instead
    # of tripping the gates outright (the pre-marginalization solver did),
    # so the degradation signals are the smoothed-vs-primary divergence and
    # the bias blow-up — both must clearly separate from the conditioned run
    assert smooth_err_raw > 2.0 * smooth_err, (
        f"expected raw-IMU smoothed divergence: {smooth_err_raw} "
        f"vs {smooth_err}")
    assert ba_max_raw > 2.0 * ba_max, (
        f"expected raw-IMU bias blow-up: {ba_max_raw} vs {ba_max}")
