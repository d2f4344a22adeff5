import numpy as np
import jax
import jax.numpy as jnp

from superodom_tpu.config import ImuConfig
from superodom_tpu.frontend import ImuWindow
from superodom_tpu import inertial as iner
from superodom_tpu import geometry as geo


CFG = ImuConfig(max_imu_per_scan=48, window_size=6, smoother_gn_iters=3)
G = CFG.gravity


def make_window(t, acc, gyr, m=48):
    n = len(t)
    pad = m - n
    return ImuWindow(
        t=jnp.asarray(np.pad(t, (0, pad)), jnp.float32),
        acc=jnp.asarray(np.pad(acc, ((0, pad), (0, 0))), jnp.float32),
        gyr=jnp.asarray(np.pad(gyr, ((0, pad), (0, 0))), jnp.float32),
        q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32)[None], (m, 1)),
        mask=jnp.asarray(np.arange(m) < n),
    )


def test_static_init(rng):
    n = 200
    acc = np.tile([0.1, -0.05, 9.79], (n, 1)) + rng.normal(0, 0.01, (n, 3))
    gyr = np.tile([0.002, -0.001, 0.003], (n, 1)) + rng.normal(0, 1e-3, (n, 3))
    init = iner.imu_static_init(
        jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
        jnp.ones(n, bool), jnp.eye(3, dtype=jnp.float32))
    assert bool(init.ok)
    np.testing.assert_allclose(np.asarray(init.gyr_bias),
                               [0.002, -0.001, 0.003], atol=5e-4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(init.gravity)), 9.81,
                               atol=1e-3)
    # R_gravity^T aligns measured acceleration with +z
    aligned = np.asarray(init.R_gravity).T @ np.asarray(init.acc_mean)
    np.testing.assert_allclose(aligned[:2], 0.0, atol=2e-3)


def test_preintegrate_static():
    """Static IMU measuring gravity: dv = g_imu * dt, dp = 0.5 g_imu dt^2,
    dq = identity."""
    n = 21
    t = np.arange(n) * 0.005
    acc = np.tile([0.0, 0.0, G], (n, 1))
    gyr = np.zeros((n, 3))
    pre = iner.preintegrate(make_window(t, acc, gyr), jnp.zeros(3), jnp.zeros(3))
    dt = float(pre.dt)
    np.testing.assert_allclose(dt, 0.105, atol=1e-3)  # first sample adds 1/200
    np.testing.assert_allclose(np.asarray(pre.dq), [1, 0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pre.dv), [0, 0, G * dt], rtol=1e-3)
    # dp ~ 0.5 g dt^2 (first-sample bootstrap makes it approximate)
    assert abs(float(pre.dp[2]) - 0.5 * G * dt**2) < 0.01


def test_preintegrate_rotation():
    """Constant yaw rate: dq must equal exp(w * dt)."""
    n = 41
    t = np.arange(n) * 0.005
    w = 0.5
    acc = np.tile([0.0, 0.0, G], (n, 1))
    gyr = np.tile([0.0, 0.0, w], (n, 1))
    pre = iner.preintegrate(make_window(t, acc, gyr), jnp.zeros(3), jnp.zeros(3))
    ang = np.asarray(geo.so3_log(pre.dq))
    np.testing.assert_allclose(ang, [0, 0, w * float(pre.dt)], atol=2e-3)


def test_preintegrate_bias_jacobian():
    """Autodiff bias Jacobians must predict the effect of a small bias
    change on the preintegrated quantities."""
    n = 30
    t = np.arange(n) * 0.005
    acc = np.tile([0.3, -0.2, G], (n, 1))
    gyr = np.tile([0.1, 0.05, -0.2], (n, 1))
    win = make_window(t, acc, gyr)
    pre0 = iner.preintegrate(win, jnp.zeros(3), jnp.zeros(3))
    db = jnp.asarray([0.01, -0.02, 0.015], jnp.float32)
    pre1 = iner.preintegrate(win, jnp.zeros(3), db * 0)  # same
    # perturb gyro bias
    pre_g = iner.preintegrate(win, jnp.zeros(3), db)
    pred_dlog = np.asarray(pre0.J_q_bg) @ np.asarray(db)
    actual_dlog = np.asarray(geo.so3_log(pre_g.dq)) - np.asarray(
        geo.so3_log(pre0.dq))
    np.testing.assert_allclose(pred_dlog, actual_dlog, atol=2e-4)
    # perturb acc bias
    pre_a = iner.preintegrate(win, db, jnp.zeros(3))
    pred_dv = np.asarray(pre0.J_v_ba) @ np.asarray(db)
    np.testing.assert_allclose(pred_dv, np.asarray(pre_a.dv - pre0.dv),
                               atol=2e-4)


def _run_smoother(poses, times, windows, cfg=CFG):
    st = iner.smoother_init(cfg)
    outs = []
    for pose, t, win in zip(poses, times, windows):
        st, sm = iner.smoother_update(st, cfg, pose, t, win)
        outs.append(sm)
    return st, outs


def test_smoother_recovers_gyro_bias():
    """Stationary robot with a gyro-bias-corrupted IMU and perfect lidar
    poses: the window smoother must estimate the bias (the role of GTSAM's
    bias states, imuPreintegration.cpp:279-337)."""
    bias_g = np.array([0.02, -0.01, 0.03], np.float32)
    n_keys = 10
    windows, poses, times = [], [], []
    for k in range(n_keys):
        t = 0.1 * k + np.arange(21) * 0.005
        acc = np.tile([0.0, 0.0, G], (21, 1))
        gyr = np.tile(bias_g, (21, 1))
        windows.append(make_window(t, acc, gyr))
        poses.append(geo.Pose.identity())
        times.append(0.1 * (k + 1))
    st, outs = _run_smoother(poses, times, windows)
    assert not bool(st.failed)
    np.testing.assert_allclose(np.asarray(st.bg[-1]), bias_g, atol=5e-3)
    np.testing.assert_allclose(np.asarray(st.v[-1]), 0.0, atol=0.05)
    # smoothed pose sticks to the (perfect) lidar poses
    np.testing.assert_allclose(np.asarray(outs[-1].t), 0.0, atol=0.02)


def test_smoother_failure_detection():
    """Inconsistent lidar poses implying >30 m/s velocity must trip the
    failure gate (imuPreintegration.cpp:398-417)."""
    windows, poses, times = [], [], []
    for k in range(6):
        t = 0.1 * k + np.arange(21) * 0.005
        acc = np.tile([0.0, 0.0, G], (21, 1))
        gyr = np.zeros((21, 3))
        windows.append(make_window(t, acc, gyr))
        # teleporting poses: 10 m per 0.1 s = 100 m/s
        poses.append(geo.Pose(geo.quat_identity(),
                              jnp.asarray([10.0 * k, 0.0, 0.0], jnp.float32)))
        times.append(0.1 * (k + 1))
    st, _ = _run_smoother(poses, times, windows)
    assert bool(st.failed)
    # reset semantics: velocity and biases zeroed
    np.testing.assert_allclose(np.asarray(st.v[-1]), 0.0, atol=1e-5)
    assert int(st.key) == 0


def test_high_rate_propagation():
    """Forward propagation from the latest state at IMU rate (the ~200 Hz
    output path, imuPreintegration.cpp:544-570)."""
    cfg = CFG
    st = iner.smoother_init(cfg)
    # seed one keyframe at origin
    t0 = np.arange(21) * 0.005
    win0 = make_window(t0, np.tile([0, 0, G], (21, 1)), np.zeros((21, 3)))
    st, _ = iner.smoother_update(st, cfg, geo.Pose.identity(), 0.1, win0)
    # constant body-x acceleration of 1 m/s^2
    t1 = 0.1 + np.arange(41) * 0.005
    win1 = make_window(t1, np.tile([1.0, 0, G], (41, 1)), np.zeros((41, 3)))
    poses, vels, mask = iner.propagate_high_rate(st, cfg, win1)
    ts = np.asarray(win1.t)[np.asarray(mask)]
    xs = np.asarray(poses.t)[np.asarray(mask), 0]
    dt_total = ts[-1] - ts[0] + 1 / 200.0
    assert abs(xs[-1] - 0.5 * dt_total**2) < 5e-3
    vx = np.asarray(vels)[np.asarray(mask), 0]
    assert abs(vx[-1] - dt_total) < 5e-3


# ---------------------------------------------------------------------------
# smoother value-add (VERDICT round-2 item 6): tests that would FAIL if the
# fixed-lag-GN-approximates-ISAM2 claim (PARITY #6) or the white-noise IMU
# weight simplification (PARITY #7) were wrong
# ---------------------------------------------------------------------------


def _sinusoid_sequence(n_keys, acc_bias=np.zeros(3), gyr_bias=np.zeros(3),
                       amp=0.5, freq=0.5, pose_noise=0.0, seed=0,
                       rate=200.0):
    """Keyframes along an x-sinusoid with a consistent IMU stream
    (acc = a_body + g + bias).  Acceleration excitation makes the acc bias
    observable (a constant-velocity sequence would not).

    Window k carries the samples in (0.1k, 0.1(k+1)] — contiguous tiling,
    no duplicated boundary sample — and the ground-truth keyframes are
    integrated from the sampled accelerations with the SAME right-rectangle
    rule as the preintegration chain, so at the true bias the IMU factors
    are exactly consistent with the pose priors (a closed-form gt would
    alias the discretization error into the estimated bias)."""
    rng = np.random.default_rng(seed)
    w = 2 * np.pi * freq
    dt = 1.0 / rate
    n_per = int(round(0.1 * rate))
    windows, poses, times, gt = [], [], [], []
    v = np.zeros(3)
    p = np.zeros(3)
    for k in range(n_keys):
        t = 0.1 * k + (np.arange(n_per) + 1) * dt
        a_x = -amp * w * w * np.sin(w * t)
        a_true = np.stack([a_x, np.zeros_like(t), np.zeros_like(t)], axis=1)
        for a in a_true:  # right-rectangle, matching _integrate_chain
            p = p + v * dt + 0.5 * a * dt * dt
            v = v + a * dt
        acc = a_true + np.array([0.0, 0.0, G]) + acc_bias[None, :]
        gyr = np.tile(gyr_bias, (n_per, 1))
        windows.append(make_window(t, acc.astype(np.float32),
                                   gyr.astype(np.float32)))
        gt.append(p.copy())
        meas = gt[-1] + rng.normal(0, pose_noise, 3)
        poses.append(geo.Pose(geo.quat_identity(),
                              jnp.asarray(meas, jnp.float32)))
        times.append(0.1 * (k + 1))
    return windows, poses, times, np.asarray(gt)


def test_smoother_recovers_acc_bias():
    """Accelerating platform with a biased accelerometer and perfect lidar
    poses: the bias states must converge to the injected acc bias (the role
    of GTSAM's BetweenFactor-chained bias estimation,
    imuPreintegration.cpp:279-337)."""
    bias_a = np.array([0.15, -0.1, 0.2], np.float32)
    windows, poses, times, _ = _sinusoid_sequence(60, acc_bias=bias_a)
    st, outs = _run_smoother(poses, times, windows)
    assert not bool(st.failed)
    # convergence is asymptotic: marginalized factors stay linearized at
    # the estimates they were dropped with, so early (wrong-bias) info must
    # decay out of the carried prior (ImuConfig.prior_forgetting)
    np.testing.assert_allclose(np.asarray(st.ba[-1]), bias_a, atol=0.04)
    # with the bias absorbed the smoothed pose still tracks the lidar pose
    np.testing.assert_allclose(np.asarray(outs[-1].t[1:]), 0.0, atol=0.02)


def test_smoother_window_6_vs_12_equivalent():
    """PARITY #6: with true fixed-lag marginalization the lag length is
    immaterial once both windows are warm — states beyond the lag live on
    inside the carried marginal prior, so doubling the window at the
    reference's reset horizon must not change the estimates materially
    (fixed-lag ~ ISAM2-with-reset equivalence).  The comparison starts
    after BOTH windows have filled and begun marginalizing (key 25 > 2x12);
    before that their startup transients legitimately differ."""
    bias_a = np.array([0.1, -0.05, 0.08], np.float32)
    bias_g = np.array([0.01, 0.02, -0.015], np.float32)
    outs = {}
    for w in (6, 12):
        cfg = ImuConfig(max_imu_per_scan=48, window_size=w,
                        smoother_gn_iters=3)
        windows, poses, times, _ = _sinusoid_sequence(
            40, acc_bias=bias_a, gyr_bias=bias_g)
        st = iner.smoother_init(cfg)
        sm = []
        for pose, t, win in zip(poses, times, windows):
            st, s = iner.smoother_update(st, cfg, pose, t, win)
            sm.append(np.asarray(s.t))
        outs[w] = (np.asarray(sm), np.asarray(st.ba[-1]),
                   np.asarray(st.bg[-1]))
    np.testing.assert_allclose(outs[6][0][25:], outs[12][0][25:], atol=4e-3)
    np.testing.assert_allclose(outs[6][1], outs[12][1], atol=0.02)
    np.testing.assert_allclose(outs[6][2], outs[12][2], atol=2e-3)


def test_smoother_beats_raw_lidar_on_noisy_poses():
    """PARITY #7: with the lidar prior weighted at its true noise level,
    fusing the (clean) IMU must beat the raw lidar poses — the test fails
    if the IMU factors or their weights are wrong."""
    noise = 0.05
    cfg = ImuConfig(max_imu_per_scan=48, window_size=6, smoother_gn_iters=3,
                    lidar_correction_noise=noise)
    windows, poses, times, gt = _sinusoid_sequence(
        40, pose_noise=noise, seed=3)
    st = iner.smoother_init(cfg)
    sm = []
    for pose, t, win in zip(poses, times, windows):
        st, s = iner.smoother_update(st, cfg, pose, t, win)
        sm.append(np.asarray(s.t))
    sm = np.asarray(sm)
    raw = np.asarray([np.asarray(p.t) for p in poses])
    # skip the first half-window while the smoother fills
    rmse_raw = np.sqrt(np.mean((raw[6:] - gt[6:]) ** 2))
    rmse_sm = np.sqrt(np.mean((sm[6:] - gt[6:]) ** 2))
    assert rmse_sm < 0.75 * rmse_raw, (rmse_sm, rmse_raw)
