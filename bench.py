"""Benchmark: registered scans/sec at OS1-128 density on the attached device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the north-star target from BASELINE.md — 200 registered scans/sec
at OS1-128 density (131k raw points/scan) on one TPU v5e chip.  The
reference CPU system runs at ~10-30 scans/sec (10 Hz real time, bags
replayed at 2-3x, BASELINE.md rows 2/8).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from superodom_tpu.config import (
        ImuConfig,
        MapConfig,
        OS1_128,
        PipelineConfig,
        RegistrationConfig,
    )
    from superodom_tpu.io.datasets import BoxWorld, make_dataset
    from superodom_tpu.runner import OdometryRunner

    cfg = PipelineConfig(
        sensor=OS1_128,
        map=MapConfig(),
        registration=RegistrationConfig(),
        imu=ImuConfig(),
        auto_voxel_size=False,
    )

    rng = np.random.default_rng(7)
    n_scans = 60
    ds = make_dataset(
        rng,
        n_scans=n_scans,
        points_per_scan=cfg.sensor.max_points,  # OS1-128 density: 131072 pts
        world=BoxWorld(half_extent=np.array([40.0, 30.0, 8.0])),
        radius=8.0,
        distortion=True,
    )

    runner = OdometryRunner(cfg)
    res = runner.run_dataset_chunked(ds, use_imu=True, chunk=10)

    value = res.scans_per_sec
    baseline = 200.0  # north-star target (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "registered_scans_per_sec_os1_128",
                "value": round(value, 2),
                "unit": "scans/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
