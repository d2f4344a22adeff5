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
                      cell_capacity=32, evict_radius=60.0),
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


def test_chunked_stats_parity():
    """Per-scan and chunked replays emit the SAME stats surface (the
    reference publishes full OptimizationStats every frame regardless of
    transport)."""
    import numpy as np

    from superodom_tpu.io.datasets import BoxWorld, make_dataset
    from superodom_tpu.runner import OdometryRunner

    rng = np.random.default_rng(3)
    ds = make_dataset(rng, n_scans=9, points_per_scan=2048,
                      world=BoxWorld(half_extent=np.array([8.0, 6.0, 3.0])),
                      radius=1.5, static_scans=3, laps=0.25)
    cfg = tiny_config()

    res_a = OdometryRunner(cfg).run_dataset(ds, use_imu=True, warmup=False)
    res_b = OdometryRunner(cfg).run_dataset_chunked(ds, use_imu=True, chunk=4)

    assert len(res_a.stats) == len(res_b.stats) == 9
    # identical field sets everywhere (including the chunked remainder scan)
    keys_a = {k for rec in res_a.stats for k in rec}
    keys_b = {k for rec in res_b.stats for k in rec}
    assert keys_a - keys_b == {"t"}  # per-scan mode also records scan time
    for field in ("surf_stack", "n_iterations", "pred_source",
                  "motion_accepted", "degenerate"):
        a = [rec[field] for rec in res_a.stats]
        b = [rec[field] for rec in res_b.stats]
        assert a == b, f"{field}: {a} != {b}"
    for field in ("uncertainty", "plane_rejection_hist", "obs_histogram"):
        for ra, rb in zip(res_a.stats, res_b.stats):
            np.testing.assert_allclose(ra[field], rb[field], atol=1e-4)
    assert all("time_elapsed_ms" in rec and "latency_ms" in rec
               for rec in res_b.stats)
    np.testing.assert_allclose(res_a.poses_t, res_b.poses_t, atol=1e-4)
