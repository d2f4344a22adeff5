import numpy as np
import jax.numpy as jnp

from superodom_tpu import frontend as fe
from superodom_tpu import geometry as geo


def test_propagate_orientation_constant_rate():
    n = 20
    t = np.arange(n, dtype=np.float32) * 0.01
    gyr = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
    qs = fe.propagate_orientation(
        geo.quat_identity(), jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        jnp.asarray(t), jnp.asarray(gyr), jnp.ones(n, bool), -0.01)
    # after the last sample: yaw = t_last + 0.01 (from the t0=-0.01 bootstrap)
    yaw = np.asarray(geo.so3_log(qs[-1]))[2]
    np.testing.assert_allclose(yaw, t[-1] + 0.01, atol=1e-3)


def test_undistort_pure_rotation():
    """Points sampled during a known rotation must map back to the
    scan-start frame (reference removePointDistortion semantics)."""
    m = 32
    w = 1.0  # rad/s about z
    t_imu = np.arange(m, dtype=np.float32) * 0.01
    qs = np.stack([np.asarray(geo.so3_exp(jnp.asarray([0, 0, w * t], jnp.float32)))
                   for t in t_imu])
    imu = fe.ImuWindow(
        t=jnp.asarray(t_imu),
        acc=jnp.zeros((m, 3), jnp.float32),
        gyr=jnp.tile(jnp.asarray([0, 0, w], jnp.float32)[None], (m, 1)),
        q=jnp.asarray(qs, jnp.float32),
        mask=jnp.ones((m,), bool),
    )
    # world points on a wall; sensor rotates; body-frame measurement of a
    # static point p_w at time t is R(t)^-1 p_w
    p_w = np.array([[2.0, 0.5, 0.3], [1.0, -1.0, 0.2], [0.5, 2.0, -0.4]],
                   np.float32)
    t_rel = np.array([0.0, 0.1, 0.25], np.float32)
    body = np.stack([
        np.asarray(geo.quat_rotate(geo.quat_conj(jnp.asarray(
            geo.so3_exp(jnp.asarray([0, 0, w * t], jnp.float32)))),
            jnp.asarray(p)))
        for p, t in zip(p_w, t_rel)
    ])
    scan = fe.Scan(
        xyz=jnp.asarray(body),
        t_rel=jnp.asarray(t_rel),
        mask=jnp.ones((3,), bool),
        t_start=jnp.asarray(0.0, jnp.float32),
        ring=jnp.zeros((3,), jnp.int32),
    )
    out, q_init, _ = fe.undistort_scan(
        scan, imu, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    # scan-start frame == world frame here (identity at t=0)
    np.testing.assert_allclose(np.asarray(out), p_w, atol=5e-3)


def test_undistort_with_extrinsic():
    """With a nontrivial imu->lidar extrinsic the conjugation
    T_l_i * T_rel * T_i_l must be applied (featureExtraction.cpp:303-305)."""
    m = 16
    w = 0.8
    t_imu = np.arange(m, dtype=np.float32) * 0.02
    qs = np.stack([np.asarray(geo.so3_exp(jnp.asarray([0, 0, w * t], jnp.float32)))
                   for t in t_imu])
    imu = fe.ImuWindow(
        t=jnp.asarray(t_imu), acc=jnp.zeros((m, 3), jnp.float32),
        gyr=jnp.zeros((m, 3), jnp.float32), q=jnp.asarray(qs, jnp.float32),
        mask=jnp.ones((m,), bool))
    # lidar rotated 90 deg about z relative to imu
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    t_il = np.array([0.1, 0.0, 0.05], np.float32)
    # a static world point seen at t: p_l(t) = T_wl(t)^-1 p_w where
    # T_wl = T_wi(t) * T_il
    p_w = np.array([1.5, 0.7, 0.2], np.float32)
    t_rel = np.array([0.2], np.float32)
    q_wi = np.asarray(geo.so3_exp(jnp.asarray([0, 0, w * 0.2], jnp.float32)))
    R_wi = np.asarray(geo.quat_to_matrix(jnp.asarray(q_wi)))
    R_wl = R_wi @ Rz
    t_wl = R_wi @ t_il
    body = (R_wl.T @ (p_w - t_wl))[None]
    scan = fe.Scan(
        xyz=jnp.asarray(body), t_rel=jnp.asarray(t_rel),
        mask=jnp.ones((1,), bool), t_start=jnp.asarray(0.0, jnp.float32),
        ring=jnp.zeros((1,), jnp.int32))
    out, q_init, t_init = fe.undistort_scan(
        scan, imu, jnp.asarray(Rz), jnp.asarray(t_il))
    # expected: point in the scan-START lidar frame: T_wl(0)^-1 p_w
    T0_R = np.eye(3, dtype=np.float32) @ Rz
    T0_t = t_il
    expected = T0_R.T @ (p_w - T0_t)
    np.testing.assert_allclose(np.asarray(out)[0], expected, atol=5e-3)


def test_uniform_feature_extraction_gates():
    xyz = np.array(
        [
            [5.0, 0.0, 0.0],   # lane 0: not on stride
            [5.0, 1.0, 0.0],   # lane 1: kept
            [5.0, 1.0, 0.0],   # lane 2: not on stride
            [5.0, 1.0, 0.0],   # lane 3: duplicate of previous
            [0.05, 0.0, 0.0],  # lane 4: not on stride
            [0.05, 0.01, 0.0], # lane 5: inside blind radius
            [4.0, 2.0, 1.0],   # lane 6: not on stride
            [4.0, 2.0, 1.1],   # lane 7: kept
        ],
        np.float32,
    )
    mask = fe.uniform_feature_extraction(
        jnp.asarray(xyz), jnp.ones(8, bool), stride=2, min_range=0.2,
        max_range=100.0)
    np.testing.assert_array_equal(np.where(np.asarray(mask))[0], [1, 7])


def test_select_features_even_decimation():
    n = 100
    xyz = np.arange(n, dtype=np.float32)[:, None] * np.ones(3, np.float32)
    mask = np.ones(n, bool)
    out, out_mask = fe.select_features(jnp.asarray(xyz), jnp.asarray(mask), 10)
    assert int(out_mask.sum()) == 10
    picked = np.sort(np.asarray(out)[np.asarray(out_mask)][:, 0])
    # evenly spread over the input, not the first 10
    assert picked[-1] > 80
    gaps = np.diff(picked)
    assert gaps.min() >= 8 and gaps.max() <= 12


def test_select_features_fewer_than_capacity():
    xyz = np.ones((20, 3), np.float32)
    mask = np.zeros(20, bool)
    mask[3:7] = True
    out, out_mask = fe.select_features(jnp.asarray(xyz), jnp.asarray(mask), 10)
    assert int(out_mask.sum()) == 4


def test_curvature_edge_extraction():
    """A wall with a protruding pole: pole points (sharp depth change along
    the ring) must be flagged as edges, flat wall interior must not."""
    n = 64
    # one ring, points sweep along y at x=5 (flat), except a jump at 30..33
    y = np.linspace(-3, 3, n).astype(np.float32)
    x = np.full(n, 5.0, np.float32)
    x[30:34] = 2.0  # pole closer to the sensor
    xyz = np.stack([x, y, np.zeros(n, np.float32)], -1)
    ring = np.zeros(n, np.int32)
    mask = np.ones(n, bool)
    em = fe.curvature_edge_extraction(
        jnp.asarray(xyz), jnp.asarray(ring), jnp.asarray(mask),
        half_window=3, curvature_threshold=0.05)
    em = np.asarray(em)
    # discontinuity neighborhoods flagged
    assert em[29:35].any()
    # flat interior not flagged
    assert not em[10:25].any()


def test_undistort_posed_path():
    """Full 6-DoF (VIO-style) undistortion: points sampled while the sensor
    both rotates and translates map back to the scan-start frame."""
    m = 16
    t_path = np.arange(m, dtype=np.float32) * 0.02
    w = 0.6
    v = np.array([1.0, 0.5, 0.0], np.float32)  # m/s
    qs = np.stack([np.asarray(geo.so3_exp(jnp.asarray([0, 0, w * t], jnp.float32)))
                   for t in t_path])
    ps = t_path[:, None] * v[None, :]

    p_w = np.array([[3.0, 1.0, 0.5], [2.0, -1.0, 0.0]], np.float32)
    t_rel = np.array([0.05, 0.22], np.float32)
    body = []
    for p, t in zip(p_w, t_rel):
        q = np.asarray(geo.so3_exp(jnp.asarray([0, 0, w * t], jnp.float32)))
        R = np.asarray(geo.quat_to_matrix(jnp.asarray(q)))
        body.append(R.T @ (p - t * v))
    body = np.stack(body)

    out, q0, t0 = fe.undistort_points_posed(
        jnp.asarray(body), jnp.asarray(t_rel), jnp.ones(2, bool),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(t_path), jnp.asarray(qs, jnp.float32),
        jnp.asarray(ps, jnp.float32), jnp.ones(m, bool))
    # scan-start pose is identity -> output == world coords
    np.testing.assert_allclose(np.asarray(out), p_w, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t0), 0.0, atol=1e-5)


def test_host_decimated_layout_matches_full_width():
    """runner.make_scan's host-side stride+dup decimation must select exactly
    the lanes the full-width device path (uniform_feature_extraction) would:
    same candidate set, same feature gates, same t_rel."""
    import dataclasses

    from superodom_tpu.config import PipelineConfig, SensorProfile
    from superodom_tpu.runner import OdometryRunner

    sensor = SensorProfile(
        name="velodyne", n_scan_lines=16, max_points=1024, min_range=0.2,
        max_range=130.0, filter_point_size=3, max_surface_features=128,
        max_edge_features=32, scan_period=0.1, default_line_res=0.1,
        default_plane_res=0.2,
    )
    cfg = PipelineConfig(sensor=sensor, auto_voxel_size=False)
    rng = np.random.default_rng(3)
    n = 900
    xyz = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    xyz[100] = xyz[99]  # duplicate return
    xyz[202] = xyz[201]  # duplicate landing on a stride lane (202 = 1+3*67)
    xyz[301] = 0.01  # blind zone
    t_rel = np.linspace(0, 0.1, n).astype(np.float32)

    # full-width reference path
    full = np.zeros((1024, 3), np.float32)
    full[:n] = xyz
    mask_full = np.arange(1024) < n
    fm = fe.uniform_feature_extraction(
        jnp.asarray(full), jnp.asarray(mask_full), 3, 0.2, 130.0)
    full_idx = np.where(np.asarray(fm))[0]

    # host-decimated path
    runner = OdometryRunner(cfg)
    scan = runner.make_scan(0.0, xyz, t_rel)
    w = fe.decimated_width(1024, 3)
    assert scan.xyz.shape == (w, 3)
    gates = fe.uniform_feature_gates(
        scan.xyz, jnp.zeros((1, 3), jnp.float32), scan.mask, 0.2, 130.0,
        skip_dup=True)
    dec_idx = 1 + 3 * np.where(np.asarray(gates))[0]
    np.testing.assert_array_equal(full_idx, dec_idx)
    # t_rel of selected lanes matches the raw per-point times
    sel_lanes = np.where(np.asarray(gates))[0]
    np.testing.assert_allclose(
        np.asarray(scan.t_rel)[sel_lanes], t_rel[1::3][: w][sel_lanes])


def test_decimated_and_full_width_pipeline_agree():
    """End-to-end: replaying the same dataset through the decimated runner
    and through hand-built full-width scans lands on the same trajectory
    (identical feature candidates; thinning table sizes are matched)."""
    import dataclasses

    from superodom_tpu.io.datasets import BoxWorld, make_dataset
    from superodom_tpu.runner import OdometryRunner
    from tests.test_pipeline import tiny_config

    cfg = tiny_config()
    rng = np.random.default_rng(11)
    ds = make_dataset(rng, n_scans=12, points_per_scan=3000, radius=2.0,
                      world=BoxWorld(half_extent=np.array([8.0, 6.0, 3.0])))

    r_dec = OdometryRunner(cfg)
    res_dec = r_dec.run_dataset(ds, use_imu=True)

    cfg_full = dataclasses.replace(cfg, use_edge_features=False)
    r_full = OdometryRunner(cfg_full)
    # bypass decimation by building full-width scans directly
    import superodom_tpu.runner as rn

    outs = []
    imu_i = 0
    for s in ds.scans:
        t_end = s.t_start + float(s.t_rel[-1])
        while imu_i < len(ds.imu.t) and ds.imu.t[imu_i] <= t_end + 0.02:
            r_full.add_imu(ds.imu.t[imu_i], ds.imu.acc[imu_i],
                           ds.imu.gyr[imu_i])
            imu_i += 1
        n_max = cfg.sensor.max_points
        nn = min(len(s.xyz_body), n_max)
        xyz_arr = np.zeros((n_max, 3), np.float32)
        t_arr = np.zeros((n_max,), np.float32)
        xyz_arr[:nn] = s.xyz_body[:nn]
        t_arr[:nn] = s.t_rel[:nn]
        scan = rn.Scan(
            xyz=jnp.asarray(xyz_arr), t_rel=jnp.asarray(t_arr),
            mask=jnp.asarray(np.arange(n_max) < nn),
            t_start=jnp.asarray(s.t_start, jnp.float32),
            ring=jnp.zeros((n_max,), jnp.int32))
        win, ok = r_full._imu_window(s.t_start, t_end)
        r_full.state, out = r_full.step_fn(r_full.state, scan, win,
                                           jnp.asarray(ok))
        outs.append(np.asarray(out.pose.t))
    np.testing.assert_allclose(res_dec.poses_t, np.stack(outs), atol=2e-2)
