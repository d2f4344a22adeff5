"""Real-time ingestion semantics: skipFrame decimation, bounded scan queue
with drop-oldest shedding, IMU-coverage-deferred processing (reference
featureExtraction.cpp:710-842)."""

import dataclasses

import numpy as np

from superodom_tpu.config import (
    ImuConfig,
    MapConfig,
    PipelineConfig,
    RegistrationConfig,
    VLP_16,
)
from superodom_tpu.runner import OdometryRunner


def _cfg(**sensor_kw):
    return PipelineConfig(
        sensor=dataclasses.replace(VLP_16, max_points=1024,
                                   max_surface_features=256, **sensor_kw),
        map=MapConfig(table_size=1 << 12, cell_capacity=16),
        registration=RegistrationConfig(max_icp_iters=2, max_gn_iters=2),
        imu=ImuConfig(window_size=4, max_imu_per_scan=32),
        auto_voxel_size=False,
    )


def _scan(rng, n=512):
    return rng.uniform(-8, 8, (n, 3)).astype(np.float32), \
        np.sort(rng.uniform(0, 0.1, n)).astype(np.float32)


def test_skip_frame_decimation(rng):
    runner = OdometryRunner(_cfg(skip_frame=3))
    outs = []
    for i in range(9):
        xyz, t_rel = _scan(rng)
        outs += runner.push_scan(1.0 + i * 0.1, xyz, t_rel)
    # every 3rd frame processed (frames 3, 6, 9 -> 3 outputs)
    assert len(outs) == 3
    assert runner.frames_skipped == 6


def test_queue_shedding(rng):
    runner = OdometryRunner(_cfg())
    # feed ONE imu sample so the sync check returns "wait" forever
    runner.add_imu(0.0, np.array([0, 0, 9.8], np.float32),
                   np.zeros(3, np.float32))
    for i in range(60):
        xyz, t_rel = _scan(rng, 256)
        outs = runner.push_scan(1.0 + i * 0.1, xyz, t_rel)
        assert outs == []  # all waiting on IMU coverage
    assert len(runner._scan_queue) == runner.MAX_SCAN_QUEUE
    assert runner.frames_shed == 60 - runner.MAX_SCAN_QUEUE


def test_deferred_processing_until_imu_covers(rng):
    runner = OdometryRunner(_cfg())
    # static init needs 1 s of IMU before windows are consumed
    for k in range(220):
        runner.add_imu(k * 0.005, np.array([0, 0, 9.80511], np.float32),
                       np.zeros(3, np.float32))
    assert runner.imu_buf.initialized
    xyz, t_rel = _scan(rng)
    t0 = 220 * 0.005 + 0.05  # beyond the IMU stream
    assert runner.push_scan(t0, xyz, t_rel) == []
    assert len(runner._scan_queue) == 1
    # IMU catches up past the sweep end -> the queued scan drains
    for k in range(220, 280):
        outs_after = runner.add_imu(
            k * 0.005, np.array([0, 0, 9.80511], np.float32),
            np.zeros(3, np.float32))
    outs = runner.drain_scans()
    assert len(outs) == 1
    assert len(runner._scan_queue) == 0


def test_scan_predating_buffer_runs_lidar_only(rng):
    runner = OdometryRunner(_cfg())
    for k in range(300):
        runner.add_imu(5.0 + k * 0.005, np.array([0, 0, 9.80511], np.float32),
                       np.zeros(3, np.float32))
    runner.imu_buf.clean(5.5)
    xyz, t_rel = _scan(rng)
    outs = runner.push_scan(5.2, xyz, t_rel)  # predates the cleaned buffer
    assert len(outs) == 1  # processed immediately, LiDAR-only
    assert int(outs[0].prediction_source) in (0, 4)
