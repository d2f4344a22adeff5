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


def test_long_run_stability(rng):
    """Multi-lap long run: bounded drift, finite states, bounded map size
    (the eviction/capacity story for unbounded runtime, SURVEY.md section 5
    long-context row)."""
    import dataclasses

    from superodom_tpu.config import MapConfig
    from superodom_tpu.mapstate import total_points

    cfg = dataclasses.replace(
        tiny_config(),
        map=MapConfig(cell_size=2.0, table_size=1 << 12, bucket_size=8,
                      cell_capacity=32, n_probes=4, evict_radius=60.0),
    )
    ds = make_dataset(rng, n_scans=150, points_per_scan=2500, radius=2.0,
                      world=small_world(), distortion=False, laps=2.0)
    r = OdometryRunner(cfg)
    res = r.run_dataset_chunked(ds, use_imu=False, chunk=25)
    assert np.isfinite(res.poses_t).all()
    ate = ate_rmse(res.poses_t, ds.gt_poses_t)
    assert ate < 0.2, f"long-run ATE {ate}"
    # revisiting the same loop must not grow the map unboundedly
    n_pts = int(total_points(r.state.surf_map))
    assert n_pts < cfg.map.table_size * cfg.map.cell_capacity * 0.5
