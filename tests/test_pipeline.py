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
import numpy as _np
from superodom_tpu.io.datasets import BoxWorld, ate_rmse, make_dataset


def small_world():
    return BoxWorld(half_extent=_np.array([8.0, 6.0, 3.0]))

from superodom_tpu.runner import OdometryRunner
from superodom_tpu import pipeline as pl


def tiny_config(max_points=4096, surf_cap=768) -> PipelineConfig:
    sensor = SensorProfile(
        name="velodyne", n_scan_lines=16, max_points=max_points,
        min_range=0.2, max_range=130.0, filter_point_size=2,
        max_surface_features=surf_cap, max_edge_features=64,
        scan_period=0.1, default_line_res=0.1, default_plane_res=0.2,
    )
    return PipelineConfig(
        sensor=sensor,
        map=MapConfig(cell_size=1.0, table_size=1 << 13, cell_capacity=24,
                      evict_radius=200.0),
        registration=RegistrationConfig(max_icp_iters=4, max_gn_iters=4),
        imu=ImuConfig(max_imu_per_scan=48, window_size=6, smoother_gn_iters=3),
        auto_voxel_size=False,
    )


def test_lidar_only_circle_trajectory(rng):
    """Minimum end-to-end slice (SURVEY.md build step 6): mapping mode,
    no IMU, constant-velocity prediction, closed-loop circle; checks ATE and
    the reference benchmark's 10 cm return-to-origin criterion scaled to the
    noise level of the synthetic world."""
    cfg = tiny_config()
    # distorted scans: the realistic no-IMU case — constant-velocity
    # de-skew (PipelineConfig.use_cv_undistortion) carries it (measured
    # ATE 0.048 with vs 0.111 without on this dataset)
    ds = make_dataset(rng, n_scans=40, points_per_scan=3000, radius=1.2, world=small_world(),
                      distortion=True)
    runner = OdometryRunner(cfg)
    res = runner.run_dataset(ds, use_imu=False)

    ate = ate_rmse(res.poses_t, ds.gt_poses_t)
    assert ate < 0.12, f"ATE {ate}"
    rto = np.linalg.norm(res.poses_t[-1] - ds.gt_poses_t[-1])
    assert rto < 0.15, f"return-to-origin {rto}"
    # stats stream present and sane
    assert res.stats[5]["surf_stack"] > 100
    assert res.stats[5]["surf_map"] > 1000
    # after the 10-frame startup window (reference laserMapping.h:220) the
    # no-IMU prediction source is constant velocity
    assert res.stats[15]["pred_source"] == pl.PRED_CONSTANT_VELOCITY


def test_imu_aided_run(rng):
    """With IMU: undistortion active, prediction source = IMU orientation,
    smoother produces finite biases and healthy status."""
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=75, points_per_scan=3000, radius=2.0, world=small_world(),
                      distortion=True)
    runner = OdometryRunner(cfg)
    res = runner.run_dataset(ds, use_imu=True)

    ate = ate_rmse(res.poses_t, ds.gt_poses_t)
    assert ate < 0.15, f"ATE {ate}"
    # after warmup the prediction source should be IMU orientation
    sources = [s["pred_source"] for s in res.stats[25:]]
    assert pl.PRED_IMU_ORIENTATION in sources
    assert all(s["imu_healthy"] for s in res.stats[25:])
    assert np.isfinite(res.smoothed_t).all()


def test_first_frame_seeds_map(rng):
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=2, points_per_scan=2000, radius=1.2, world=small_world())
    runner = OdometryRunner(cfg)
    out0 = runner.process_scan(ds.scans[0].t_start, ds.scans[0].xyz_body,
                               ds.scans[0].t_rel)
    assert int(out0.surf_map_num) == 0  # census before first insert
    assert bool(runner.state.initialized)
    out1 = runner.process_scan(ds.scans[1].t_start, ds.scans[1].xyz_body,
                               ds.scans[1].t_rel)
    assert int(out1.surf_map_num) > 300


def test_localization_mode_against_prior_map(rng):
    """Dual-mode operation (reference laserMapping.cpp:129-177): load a prior
    map, init from a configured pose, localize without (necessarily)
    updating the map."""
    cfg = tiny_config()
    # gentler turn rate: localization against a fixed prior map cannot lean
    # on a co-drifting map during the orientation-only startup frames
    ds = make_dataset(rng, n_scans=60, points_per_scan=3000, radius=2.0, world=small_world(),
                      distortion=False)
    # build the prior map by running SLAM once
    slam = OdometryRunner(cfg)
    slam.run_dataset(ds, use_imu=False)
    prior_surf_map = slam.state.surf_map

    # localization from a configured (true) init pose with a deliberate
    # small offset that ICP must absorb
    loc_cfg = dataclasses.replace(
        cfg,
        localization=dataclasses.replace(
            cfg.localization, enabled=True, update_map=False,
            init_pose_xyz=(0.08, -0.06, 0.02), init_pose_rpy=(0.0, 0.0, 0.02),
        ),
    )
    loc = OdometryRunner(loc_cfg)
    loc.state = loc.state._replace(surf_map=prior_surf_map)
    res = loc.run_dataset(ds, use_imu=False)
    ate = ate_rmse(res.poses_t, ds.gt_poses_t)
    assert ate < 0.12, f"localization ATE {ate}"
    # map must not grow in localization mode with update_map=False
    from superodom_tpu.mapstate import total_points
    assert int(total_points(loc.state.surf_map)) == int(total_points(prior_surf_map))


def test_velocity_failure_gate(rng):
    """A scan teleported far away must be rejected by the motion gate
    (reference checkMotionThresholds, LidarSlam.cpp:173-195)."""
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=6, points_per_scan=2500, radius=1.2, world=small_world(),
                      distortion=False)
    runner = OdometryRunner(cfg)
    for s in ds.scans[:5]:
        runner.process_scan(s.t_start, s.xyz_body, s.t_rel)
    pose_before = np.asarray(runner.state.pose.t)
    s = ds.scans[5]
    out = runner.process_scan(s.t_start, s.xyz_body + 50.0, s.t_rel)
    assert not bool(out.motion_accepted)
    pose_after = np.asarray(runner.state.pose.t)
    np.testing.assert_allclose(pose_after, pose_before, atol=1e-5)


def test_state_is_checkpointable(rng, tmp_path):
    """Whole-estimator checkpoint/resume: the state is one pytree
    (SURVEY.md section 5 checkpoint row)."""
    import jax

    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=8, points_per_scan=2000, radius=1.2, world=small_world())
    runner = OdometryRunner(cfg)
    for s in ds.scans[:4]:
        runner.process_scan(s.t_start, s.xyz_body, s.t_rel)

    flat, treedef = jax.tree_util.tree_flatten(runner.state)
    np.savez(tmp_path / "ckpt.npz", *[np.asarray(x) for x in flat])
    loaded = np.load(tmp_path / "ckpt.npz")
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(loaded[k]) for k in loaded.files]
    )

    r2 = OdometryRunner(cfg)
    r2.state = restored
    outs_a, outs_b = [], []
    for s in ds.scans[4:6]:
        outs_a.append(runner.process_scan(s.t_start, s.xyz_body, s.t_rel))
        outs_b.append(r2.process_scan(s.t_start, s.xyz_body, s.t_rel))
    np.testing.assert_allclose(
        np.asarray(outs_a[-1].pose.t), np.asarray(outs_b[-1].pose.t), atol=1e-5
    )


def test_vio_aiding_in_degenerate_corridor(rng):
    """Featureless-corridor handling (SuperLoc alignment risk): with only two
    parallel walls, x is unobservable and the estimator drifts; feeding an
    external VIO pose re-anchors it via the absolute-pose prior
    (reference addAbsolutePoseConstraints, LidarSlam.cpp:285-298)."""
    import dataclasses as dc

    from superodom_tpu.io.datasets import SimDataset, SimImu, SimScan

    cfg = tiny_config()
    cfg = dc.replace(cfg, startup_frames=0)

    # corridor world: two walls at y=+-2, no end caps -> x unconstrained
    n_wall = 6000
    uv = _np.random.default_rng(1).uniform(-30, 30, size=(n_wall, 2))
    walls = _np.zeros((n_wall, 3), _np.float32)
    walls[:, 0] = uv[:, 0]
    walls[:, 2] = _np.clip(uv[:, 1], -2.5, 2.5)
    walls[: n_wall // 2, 1] = -2.0
    walls[n_wall // 2:, 1] = 2.0

    # straight-line trajectory down the corridor
    n_scans = 20
    speed = 1.5
    gt_t = _np.zeros((n_scans, 3), _np.float32)
    gt_t[:, 0] = _np.arange(n_scans) * 0.1 * speed
    scans = []
    g = _np.random.default_rng(2)
    for i in range(n_scans):
        vis = walls[_np.abs(walls[:, 0] - gt_t[i, 0]) < 25]
        sel = vis[g.choice(len(vis), 2500)]
        body = sel - gt_t[i]
        body += g.normal(0, 0.005, body.shape)
        scans.append(SimScan(t_start=i * 0.1, xyz_body=body.astype(_np.float32),
                             t_rel=_np.sort(g.uniform(0, 0.1, len(body))).astype(_np.float32)))

    runner = OdometryRunner(cfg)
    drift_run = [
        runner.process_scan(s.t_start, s.xyz_body, s.t_rel) for s in scans
    ]
    # x is unobservable: the no-aiding estimate must NOT track x
    x_err_noaid = abs(float(drift_run[-1].pose.t[0]) - gt_t[-1, 0])
    assert x_err_noaid > 0.5, f"corridor was unexpectedly observable ({x_err_noaid})"
    # degeneracy must be flagged
    assert any(bool(o.icp.degenerate) for o in drift_run[2:])

    # with VIO aiding: feed ground-truth poses as the external estimate
    runner2 = OdometryRunner(cfg)
    outs = []
    for i, s in enumerate(scans):
        runner2.set_vio_pose(_np.array([1.0, 0, 0, 0], _np.float32), gt_t[i])
        outs.append(runner2.process_scan(s.t_start, s.xyz_body, s.t_rel))
    x_err_aided = abs(float(outs[-1].pose.t[0]) - gt_t[-1, 0])
    assert x_err_aided < 0.2, f"VIO aiding failed: x err {x_err_aided}"
    # y stays locked by the walls in both runs
    assert abs(float(outs[-1].pose.t[1])) < 0.1
    assert any(int(o.prediction_source) == pl.PRED_VIO_ODOM for o in outs)


def test_high_rate_output(rng):
    """IMU-rate odometry output between scans (reference ~200 Hz
    state_estimation, published every 4th sample at ~50 Hz)."""
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=25, points_per_scan=2000, radius=1.2,
                      world=small_world())
    runner = OdometryRunner(cfg)
    res_imu_i = 0
    imu = ds.imu
    for s in ds.scans:
        t_end = s.t_start + float(s.t_rel[-1])
        while res_imu_i < len(imu.t) and imu.t[res_imu_i] <= t_end + 0.02:
            runner.add_imu(imu.t[res_imu_i], imu.acc[res_imu_i],
                           imu.gyr[res_imu_i])
            res_imu_i += 1
        out = runner.process_scan(s.t_start, s.xyz_body, s.t_rel)
    ts, qs, ps, vs = runner.high_rate_states()
    assert len(ts) >= 10  # ~20 samples per 0.1 s window at 200 Hz
    assert np.isfinite(ps).all() and np.isfinite(vs).all()
    # the propagated path starts near the latest smoothed pose
    assert np.linalg.norm(ps[0] - np.asarray(out.smoothed_pose.t)) < 0.5


def test_lio_prediction_catches_acceleration_transient(rng):
    """With enable_lio_prediction, the ICP initial guess at the
    static->moving transition must be much closer to the converged pose
    (the preintegrated accelerometer sees the onset; IMU-orientation /
    constant-velocity prediction cannot — reference latent LIO source,
    laserMapping.cpp:384-412)."""
    import dataclasses

    from superodom_tpu.io.datasets import BoxWorld, ate_rmse, make_dataset

    ds = make_dataset(rng, n_scans=34, points_per_scan=3000,
                      world=BoxWorld(half_extent=np.array([10.0, 8.0, 4.0])),
                      radius=2.5, laps=0.5, static_scans=15)
    cfg = tiny_config()

    def run(lio):
        # translation de-skew OFF: the sim's onset is a velocity STEP, so
        # the smoother velocity driving the de-skew lags reality for the
        # very scans under test and the converged-pose reference wobbles
        # between mid-sweep and start-of-sweep conventions — this test
        # isolates the prediction-SOURCE comparison under the reference's
        # own rotation-only (smear) semantics
        c = dataclasses.replace(cfg, enable_lio_prediction=lio,
                                use_translation_deskew=False)
        r = OdometryRunner(c)
        res = r.run_dataset(ds, use_imu=True, warmup=False)
        # total_translation = |prediction - converged pose| per scan
        pred_err = np.array([s["total_translation"] for s in res.stats])
        ate = ate_rmse(res.poses_t, np.asarray(ds.gt_poses_t))
        src = np.array([s["pred_source"] for s in res.stats])
        return pred_err, ate, src

    pred_off, ate_off, _ = run(False)
    pred_on, ate_on, src_on = run(True)
    onset = slice(15, 18)  # scans AT the motion transient
    # the sim's onset is a velocity STEP (acceleration impulse smeared over
    # ~2 IMU samples), so even a perfect inertial prediction only sees part
    # of it; and ~3 scans in, the constant-velocity source has the
    # post-transient velocity too, so only the transient scans separate the
    # sources.  Assert the realistic ~25%+ tightening there.
    assert pred_on[onset].mean() < 0.8 * pred_off[onset].mean(), (
        f"LIO prediction not tighter at onset: {pred_on[onset]} vs "
        f"{pred_off[onset]}")
    assert 1 in src_on.tolist()  # PRED_LIO_ODOM used
    # accuracy not materially degraded.  The margin is wider than the
    # prediction-error one: at 4 m/s the rotation-only undistortion leaves a
    # v*scan_period smear, so the solved poses are effectively stamped
    # slightly off their keyframe times — the marginalizing smoother (which
    # actually integrates the IMU against those stamps, unlike the
    # pre-round-3 lidar-slaved window) absorbs the skew into velocity and
    # hands the LIO source a slightly biased prediction.  The posed
    # undistortion path removes the smear (test_vio.py).
    assert ate_on < max(ate_off * 1.35, 0.15), (ate_on, ate_off)


def test_capped_insert_keeps_tracking(rng):
    """Regression: when per-scan features exceed the map's insert-width cap,
    the capped write set must be a spatially UNIFORM sample and the solved
    pose must not replace the prediction while accepted correspondences are
    scarce.  Before the hashed-order cut + min_plane_matches gate, the
    coordinate-ordered prefix cut starved one side of the scene of map
    points for tens of frames and an under-constrained GN jumped ~1-2 m on
    a STATIC platform (seen at VLP-16/OS1 densities with the default
    insert_width; reference inserts the full cloud, LocalMap.h:529-645)."""
    cfg = tiny_config()
    # bind the cap hard: 768-feature scans, 256-lane insert budget
    cfg = dataclasses.replace(cfg, map=dataclasses.replace(cfg.map, insert_width=256))
    ds = make_dataset(rng, n_scans=40, points_per_scan=3000, radius=1.2,
                      world=small_world(), distortion=False)
    runner = OdometryRunner(cfg)
    res = runner.run_dataset(ds, use_imu=False)

    gt = np.asarray(ds.gt_poses_t)
    err = np.linalg.norm(res.poses_t - gt, axis=1)
    # static lead-in (make_dataset static_scans=15) must stay pinned
    assert err[:14].max() < 0.05, f"static-phase drift {err[:14].max()}"
    ate = ate_rmse(res.poses_t, gt)
    assert ate < 0.2, f"ATE {ate} with bound insert cap"


def test_high_rate_streaming_in_replay(rng):
    """run_dataset(high_rate=True) streams the ~50 Hz propagated state
    (VERDICT round-2 item 7): correct rate, monotonic time, and continuity
    across scan boundaries (each window re-anchors at the latest smoothed
    state, so boundary jumps are bounded by the smoother correction)."""
    cfg = tiny_config()
    # gentle dynamics (~1 m/s): boundary jumps measure the smoother
    # correction, which must be small when the estimator tracks well
    ds = make_dataset(rng, n_scans=40, points_per_scan=2000, radius=1.5,
                      laps=0.25, world=small_world())
    runner = OdometryRunner(cfg)
    res = runner.run_dataset(ds, use_imu=True, high_rate=True)

    t = res.high_rate_t
    p = res.high_rate_p
    assert t is not None and len(t) > 0
    # ~200 Hz decimated by 4 => ~50 Hz over the ~3 s replay
    span = t[-1] - t[0]
    assert len(t) > span * 35, (len(t), span)
    assert np.all(np.diff(t) > 0)  # strictly monotonic, no duplicates
    assert np.isfinite(p).all() and np.isfinite(res.high_rate_v).all()
    # continuity: consecutive ~20 ms samples on a slow trajectory move a
    # few cm; a broken boundary handoff would jump by the anchor offset
    jumps = np.linalg.norm(np.diff(p, axis=0), axis=1)
    assert jumps.max() < 0.15, jumps.max()
    # the stream tracks the scan-rate smoothed trajectory
    idx = np.searchsorted(t, np.asarray(ds.times)[5:-1])
    idx = np.clip(idx, 0, len(t) - 1)
    d = np.linalg.norm(p[idx] - res.smoothed_t[5:-1], axis=1)
    assert np.median(d) < 0.2, np.median(d)
