import numpy as np

from superodom_tpu.io.datasets import make_dataset, ate_rmse
from superodom_tpu.runner import OdometryRunner

from test_pipeline import small_world, tiny_config


def test_chunked_replay_matches_per_scan(rng):
    """lax.scan-chunked replay must produce the same trajectory as the
    per-scan dispatch path."""
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=24, points_per_scan=2500, radius=2.0,
                      world=small_world(), distortion=False)
    r1 = OdometryRunner(cfg)
    res1 = r1.run_dataset(ds, use_imu=False, warmup=False)

    r2 = OdometryRunner(cfg)
    res2 = r2.run_dataset_chunked(ds, use_imu=False, chunk=8)

    assert len(res2.poses_t) == len(res1.poses_t)
    np.testing.assert_allclose(res2.poses_t, res1.poses_t, atol=1e-4)


def test_chunked_replay_with_imu_tracks(rng):
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=75, points_per_scan=2500, radius=2.0,
                      world=small_world(), distortion=True)
    r = OdometryRunner(cfg)
    res = r.run_dataset_chunked(ds, use_imu=True, chunk=15)
    ate = ate_rmse(res.poses_t, ds.gt_poses_t)
    assert ate < 0.15, f"ATE {ate}"
