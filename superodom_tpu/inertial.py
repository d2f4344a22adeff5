"""Inertial subsystem: IMU initialization, preintegration, sliding-window
smoothing, failure detection and high-rate state propagation.

TPU-native rebuild of the reference IMU-preintegration node
(reference src/ImuPreintegration/imuPreintegration.cpp), replacing GTSAM:

* PreintegratedImuMeasurements -> a ``lax.scan`` over the IMU window
  producing (dR, dv, dp, dt); bias Jacobians come from ``jax.jacfwd`` of the
  same scan instead of hand-derived propagation.
* ISAM2 with per-key lidar pose priors + ImuFactor + bias BetweenFactor
  (imuPreintegration.cpp:279-337) -> a dense fixed-lag Gauss-Newton smoother
  over a W-state window; the graph-reset-at-100-keys behavior
  (:162-205,372) is subsumed by the fixed lag with a carried prior.
* failure detection gates (:398-417) and the IMU-rate repropagation
  (:339-367) are pure functions on the state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from superodom_tpu.config import ImuConfig
from superodom_tpu.frontend import ImuWindow
from superodom_tpu.geometry import (
    Pose,
    quat_conj,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    so3_exp,
    so3_log,
    gravity_align_matrix,
)


class ImuInitState(NamedTuple):
    """Output of static initialization (reference Imu::imuInit,
    imu_data.h:71-160): measurement means, gravity, gyro bias and the
    gravity-alignment rotation composed with the laser extrinsic."""

    acc_mean: jnp.ndarray  # f32[3]
    gyr_mean: jnp.ndarray  # f32[3]
    acc_cov: jnp.ndarray  # f32[3]
    gyr_cov: jnp.ndarray  # f32[3]
    gravity: jnp.ndarray  # f32[3] gravity vector in imu frame
    gyr_bias: jnp.ndarray  # f32[3]
    R_gravity: jnp.ndarray  # f32[3,3] roll/pitch gravity alignment
    R_imu_laser_gravity: jnp.ndarray  # f32[3,3] R_gravity^-1 @ R_imu_laser
    ok: jnp.ndarray  # bool


def imu_static_init(
    acc: jnp.ndarray,
    gyr: jnp.ndarray,
    mask: jnp.ndarray,
    R_imu_laser: jnp.ndarray,
    gravity_norm: float = 9.81,
) -> ImuInitState:
    """Masked-mean/covariance initialization over a ~1 s static buffer."""
    w = mask.astype(acc.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    acc_mean = jnp.sum(acc * w[:, None], axis=0) / n
    gyr_mean = jnp.sum(gyr * w[:, None], axis=0) / n
    acc_cov = jnp.sum(((acc - acc_mean) ** 2) * w[:, None], axis=0) / jnp.maximum(
        n - 1.0, 1.0
    )
    gyr_cov = jnp.sum(((gyr - gyr_mean) ** 2) * w[:, None], axis=0) / jnp.maximum(
        n - 1.0, 1.0
    )
    gravity = -acc_mean / jnp.maximum(jnp.linalg.norm(acc_mean), 1e-6) * gravity_norm
    R_g = gravity_align_matrix(acc_mean)
    R_ilg = R_g.T @ R_imu_laser  # reference: Roll_Pitch_Gravity^-1 * imu_laser_R
    return ImuInitState(
        acc_mean=acc_mean,
        gyr_mean=gyr_mean,
        acc_cov=acc_cov,
        gyr_cov=gyr_cov,
        gravity=gravity,
        gyr_bias=gyr_mean,
        R_gravity=R_g,
        R_imu_laser_gravity=R_ilg,
        ok=jnp.sum(mask.astype(jnp.int32)) > 10,
    )


class Preintegrated(NamedTuple):
    """Forster-style preintegrated IMU measurement over one interval."""

    dq: jnp.ndarray  # f32[4] delta rotation (body_i -> body_j)
    dv: jnp.ndarray  # f32[3] delta velocity in body_i frame
    dp: jnp.ndarray  # f32[3] delta position in body_i frame
    dt: jnp.ndarray  # f32 total integration time
    # first-order bias sensitivity (via jacfwd of the scan):
    J_q_bg: jnp.ndarray  # f32[3,3] d so3_log(dq) / d bg
    J_v_ba: jnp.ndarray  # f32[3,3]
    J_v_bg: jnp.ndarray  # f32[3,3]
    J_p_ba: jnp.ndarray  # f32[3,3]
    J_p_bg: jnp.ndarray  # f32[3,3]
    # biases the interval was integrated at — first-order corrections in the
    # IMU factor are relative to THESE, not to the current estimate
    ref_ba: jnp.ndarray  # f32[3]
    ref_bg: jnp.ndarray  # f32[3]


def _sample_dts(t, mask, dtype, rate=200.0):
    """Per-sample integration dt with the reference's bootstrapping and
    clamping (imuPreintegration.cpp:258-264): first valid sample uses one
    nominal IMU period (1/rate), gaps are clamped to [1e-4, 0.5], invalid
    lanes contribute 0."""
    idx = jnp.cumsum(mask.astype(jnp.int32))
    first = mask & (idx == 1)
    t_masked = jnp.where(mask, t, -jnp.float32(3.4e38))
    run_max = jax.lax.associative_scan(jnp.maximum, t_masked)
    prev_t = jnp.concatenate(
        [jnp.full((1,), -jnp.float32(3.4e38), dtype), run_max[:-1]]
    )
    dt = jnp.clip(t - prev_t, 1e-4, 0.5)
    dt = jnp.where(first, 1.0 / rate, dt)
    return jnp.where(mask, dt, 0.0)


def _integrate_chain(t, acc, gyr, mask, ba, bg, dtype, q0=None, gravity_w=None,
                     v0=None, p0=None, rate=200.0):
    """Parallel (log-depth) strapdown integration via associative scans:
    the quaternion chain Q_i = dq_1 * ... * dq_i is an associative product;
    velocities/positions follow by prefix sums.  Semantics match the
    sequential formulation: a_i is rotated by the attitude BEFORE sample i,
    p uses the velocity before the sample (midpoint on acceleration).

    Returns per-sample (q[i], v[i], p[i]) inclusive of sample i, plus dts.
    """
    dt = _sample_dts(t, mask, dtype, rate)
    a = acc - ba
    g = gyr - bg
    dq = so3_exp(g * dt[:, None])  # identity where dt == 0
    Q = jax.lax.associative_scan(quat_mul, dq)
    Q = quat_normalize(Q)
    if q0 is not None:
        Q = quat_normalize(quat_mul(q0[None, :], Q))
        q_prev = jnp.concatenate([q0[None, :], Q[:-1]], axis=0)
    else:
        q_prev = jnp.concatenate([quat_identity(dtype)[None, :], Q[:-1]], axis=0)
    acc_w = quat_rotate(q_prev, a)
    if gravity_w is not None:
        acc_w = acc_w + gravity_w[None, :]
    acc_w = jnp.where(mask[:, None], acc_w, 0.0)
    dv = acc_w * dt[:, None]
    v = jnp.cumsum(dv, axis=0)
    if v0 is not None:
        v = v + v0[None, :]
        v_prev = jnp.concatenate([v0[None, :], v[:-1]], axis=0)
    else:
        v_prev = jnp.concatenate([jnp.zeros((1, 3), dtype), v[:-1]], axis=0)
    dp = v_prev * dt[:, None] + 0.5 * acc_w * dt[:, None] ** 2
    p = jnp.cumsum(dp, axis=0)
    if p0 is not None:
        p = p + p0[None, :]
    return Q, v, p, dt


def _preintegrate_raw(t, acc, gyr, mask, ba, bg, dtype, rate=200.0):
    Q, v, p, dt = _integrate_chain(t, acc, gyr, mask, ba, bg, dtype, rate=rate)
    return Q[-1], v[-1], p[-1], jnp.sum(dt)


def preintegrate(imu: ImuWindow, ba: jnp.ndarray, bg: jnp.ndarray,
                 rate: float = 200.0) -> Preintegrated:
    """Preintegrate the masked IMU window at reference biases, with bias
    Jacobians computed by forward-mode autodiff of the integration itself
    (replacing GTSAM's hand-propagated Jacobians)."""
    dtype = imu.acc.dtype

    def f(b):
        ba_, bg_ = b[:3], b[3:]
        q, v, p, dt = _preintegrate_raw(
            imu.t, imu.acc, imu.gyr, imu.mask, ba_, bg_, dtype, rate=rate
        )
        return jnp.concatenate([so3_log(q), v, p]), (q, v, p, dt)

    b0 = jnp.concatenate([ba, bg])
    J, (q, v, p, dt) = jax.jacfwd(f, has_aux=True)(b0)
    return Preintegrated(
        dq=q,
        dv=v,
        dp=p,
        dt=dt,
        J_q_bg=J[0:3, 3:6],
        J_v_ba=J[3:6, 0:3],
        J_v_bg=J[3:6, 3:6],
        J_p_ba=J[6:9, 0:3],
        J_p_bg=J[6:9, 3:6],
        ref_ba=ba,
        ref_bg=bg,
    )


class SmootherState(NamedTuple):
    """Fixed-lag window of navigation states at lidar keyframes.

    True fixed-lag smoothing: each state keeps its ORIGINAL lidar pose
    measurement (``meas_q``/``meas_p``), and when a state falls off the
    window it is marginalized (Schur complement) into the carried Gaussian
    prior (``prior_q``/``prior_x``/``prior_info``) on the new oldest state —
    the finite-lag equivalent of the information ISAM2 accumulates in the
    reference (imuPreintegration.cpp:279-337).  Bias information therefore
    ACCUMULATES across updates instead of being re-anchored ad hoc."""

    q: jnp.ndarray  # f32[W,4] world<-imu orientation
    p: jnp.ndarray  # f32[W,3]
    v: jnp.ndarray  # f32[W,3]
    ba: jnp.ndarray  # f32[W,3]
    bg: jnp.ndarray  # f32[W,3]
    t: jnp.ndarray  # f32[W] keyframe times
    meas_q: jnp.ndarray  # f32[W,4] lidar pose measurement per keyframe
    meas_p: jnp.ndarray  # f32[W,3]
    preint: Preintegrated  # stacked [W] (interval i-1 -> i; lane 0 unused)
    prior_q: jnp.ndarray  # f32[4] marginal-prior mean orientation (lane 0)
    prior_x: jnp.ndarray  # f32[12] marginal-prior mean [p, v, ba, bg]
    prior_info: jnp.ndarray  # f32[15,15] marginal-prior information
    valid: jnp.ndarray  # bool[W]
    key: jnp.ndarray  # i32 keyframes since init
    failed: jnp.ndarray  # bool, failure detected last update


def _stack_preint(w: int, dtype=jnp.float32) -> Preintegrated:
    z3 = jnp.zeros((w, 3), dtype)
    z33 = jnp.zeros((w, 3, 3), dtype)
    return Preintegrated(
        dq=jnp.tile(quat_identity(dtype)[None], (w, 1)),
        dv=z3,
        dp=z3,
        dt=jnp.zeros((w,), dtype),
        J_q_bg=z33,
        J_v_ba=z33,
        J_v_bg=z33,
        J_p_ba=z33,
        J_p_bg=z33,
        ref_ba=z3,
        ref_bg=z3,
    )


def _init_prior_info(cfg: ImuConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Information of the initial prior on the first window state: free pose
    (the lidar measures it), weak velocity, moderate biases (the role of
    GTSAM's priorPoseNoise/priorVelNoise/priorBiasNoise,
    imuPreintegration.cpp:162-177)."""
    diag = (
        [0.0] * 6
        + [1.0 / cfg.init_vel_sigma**2] * 3
        + [1.0 / cfg.init_acc_bias_sigma**2] * 3
        + [1.0 / cfg.init_gyr_bias_sigma**2] * 3
    )
    return jnp.diag(jnp.asarray(diag, dtype))


def smoother_init(cfg: ImuConfig, dtype=jnp.float32) -> SmootherState:
    w = cfg.window_size
    return SmootherState(
        q=jnp.tile(quat_identity(dtype)[None], (w, 1)),
        p=jnp.zeros((w, 3), dtype),
        v=jnp.zeros((w, 3), dtype),
        ba=jnp.zeros((w, 3), dtype),
        bg=jnp.zeros((w, 3), dtype),
        t=jnp.zeros((w,), dtype),
        meas_q=jnp.tile(quat_identity(dtype)[None], (w, 1)),
        meas_p=jnp.zeros((w, 3), dtype),
        preint=_stack_preint(w, dtype),
        prior_q=quat_identity(dtype),
        prior_x=jnp.zeros((12,), dtype),
        prior_info=_init_prior_info(cfg, dtype),
        valid=jnp.zeros((w,), bool),
        key=jnp.zeros((), jnp.int32),
        failed=jnp.zeros((), bool),
    )


import functools


@functools.lru_cache(maxsize=8)
def _bias_cumsum_map_np(w: int):
    import numpy as onp

    T = onp.eye(w * 15, dtype=onp.float32)
    for i in range(w):
        for j in range(i):
            for off in (9, 12):  # ba, bg sub-blocks of the 15-wide tangent
                T[i * 15 + off:i * 15 + off + 3,
                  j * 15 + off:j * 15 + off + 3] = onp.eye(3)
    return T


def _bias_cumsum_map(w: int, dtype) -> jnp.ndarray:
    """Block-lower-triangular map from (first-bias, per-interval bias
    increments) coordinates to the direct per-state bias tangents:
    ``dba_i = dba_base + sum_{j<=i} u_j`` (identity on q/p/v blocks)."""
    return jnp.asarray(_bias_cumsum_map_np(w), dtype)


def _imu_residuals(q_i, p_i, v_i, ba_i, bg_i, q_j, p_j, v_j, pre: Preintegrated,
                   gravity_w):
    """Forster-style preintegration residuals with first-order bias
    correction relative to the interval's own integration bias (the role of
    gtsam::ImuFactor)."""
    dba = ba_i - pre.ref_ba
    dbg = bg_i - pre.ref_bg
    dq_corr = quat_mul(pre.dq, so3_exp(pre.J_q_bg @ dbg))
    dv_corr = pre.dv + pre.J_v_ba @ dba + pre.J_v_bg @ dbg
    dp_corr = pre.dp + pre.J_p_ba @ dba + pre.J_p_bg @ dbg
    dt = pre.dt

    q_i_inv = quat_conj(q_i)
    r_q = so3_log(quat_mul(quat_conj(dq_corr), quat_mul(q_i_inv, q_j)))
    r_v = quat_rotate(q_i_inv, v_j - v_i - gravity_w * dt) - dv_corr
    r_p = (
        quat_rotate(q_i_inv, p_j - p_i - v_i * dt - 0.5 * gravity_w * dt * dt)
        - dp_corr
    )
    return r_q, r_v, r_p


def propagate_state(
    state: SmootherState, cfg: ImuConfig, pre: Preintegrated
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Propagate the newest smoothed state through a preintegrated interval:
    (q_pred, p_pred, v_pred) at the interval end.  This is the IMU-odometry
    prediction (the reference's latent LIO prediction source and the state
    bootstrap inside process_imu_odometry, imuPreintegration.cpp:369-396)."""
    dtype = state.p.dtype
    gravity_w = jnp.array([0.0, 0.0, -cfg.gravity], dtype)
    q_pred = quat_normalize(quat_mul(state.q[-1], pre.dq))
    dt = pre.dt
    v_pred = state.v[-1] + gravity_w * dt + quat_rotate(state.q[-1], pre.dv)
    p_pred = (
        state.p[-1]
        + state.v[-1] * dt
        + 0.5 * gravity_w * dt * dt
        + quat_rotate(state.q[-1], pre.dp)
    )
    return q_pred, p_pred, v_pred


def _pose_prior_res(delta15, q0, p0, mq, mp, w):
    """Weighted lidar pose-prior residual on one state ([6])."""
    q = quat_normalize(quat_mul(q0, so3_exp(delta15[0:3])))
    p = p0 + delta15[3:6]
    r_q = so3_log(quat_mul(quat_conj(mq), q)) * w
    r_p = (p - mp) * w
    return jnp.concatenate([r_q, r_p])


def _pair_factor_res(delta30, xi, xj, pre_i, sig_vq, sig_vv, wpair, wba, wbg,
                     gravity_w):
    """Weighted IMU preintegration + bias random-walk residuals between
    consecutive window states ([15])."""
    qi0, pi0, vi0, bai0, bgi0 = xi
    qj0, pj0, vj0, baj0, bgj0 = xj
    di, dj = delta30[:15], delta30[15:]
    qi = quat_normalize(quat_mul(qi0, so3_exp(di[0:3])))
    pi = pi0 + di[3:6]
    vi = vi0 + di[6:9]
    bai = bai0 + di[9:12]
    bgi = bgi0 + di[12:15]
    qj = quat_normalize(quat_mul(qj0, so3_exp(dj[0:3])))
    pj = pj0 + dj[3:6]
    vj = vj0 + dj[6:9]
    baj = baj0 + dj[9:12]
    bgj = bgj0 + dj[12:15]
    r_q, r_v, r_p = _imu_residuals(
        qi, pi, vi, bai, bgi, qj, pj, vj, pre_i, gravity_w
    )
    return jnp.concatenate([
        r_q * sig_vq * wpair,
        r_v * sig_vv * wpair,
        r_p * sig_vv * wpair,
        (baj - bai) * (wba * wpair),
        (bgj - bgi) * (wbg * wpair),
    ])


def _state_tangent15(q, p, v, ba, bg, prior_q, prior_x):
    """Tangent coordinates of a state around the marginal-prior mean."""
    r_q = so3_log(quat_mul(quat_conj(prior_q), q))
    return jnp.concatenate([
        r_q,
        p - prior_x[0:3],
        v - prior_x[3:6],
        ba - prior_x[6:9],
        bg - prior_x[9:12],
    ])


# per-GN-iteration trust-region caps for [dq, dp, dv, dba, dbg]
# the velocity cap must let a genuinely inconsistent pose stream push
# |v| past the 30 m/s failure gate within a couple of updates
_TRUST_CAPS = [0.5] * 3 + [2.0] * 3 + [12.0] * 3 + [0.2] * 3 + [0.1] * 3


def _scaled_solve(A, rhs, damp=1e-7):
    """Jacobi-scaled damped linear solve.  The bias random-walk weights
    (~1e4, squared in the normal equations) give raw systems a ~1e8+
    condition number an f32 solve cannot survive; rescaling to unit diagonal
    lets one damping constant serve blocks whose weights span ~1e5."""
    d = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(A), 1e-8))
    As = A * d[:, None] * d[None, :] + damp * jnp.eye(A.shape[0], dtype=A.dtype)
    if rhs.ndim == 1:
        return d * jnp.linalg.solve(As, d * rhs)
    return d[:, None] * jnp.linalg.solve(As, d[:, None] * rhs)


def _interval_weights(cfg, pre_dt):
    """IMU-factor weights from the preintegrated white-noise scale over one
    interval (the role of GTSAM's propagated preintMeasCov): sigma ~
    noise_density * sqrt(dt); bias random walk ~ walk_density * sqrt(dt)."""
    dt_ref = jnp.maximum(pre_dt, 1e-2)
    sig_vq = 1.0 / (cfg.gyr_noise * jnp.sqrt(dt_ref) + 1e-6)
    sig_vv = 1.0 / (cfg.acc_noise * jnp.sqrt(dt_ref) + 1e-6)
    wba = 1.0 / jnp.maximum(
        cfg.acc_bias_noise * jnp.sqrt(jnp.maximum(pre_dt, 1e-3)), 1e-9
    )
    wbg = 1.0 / jnp.maximum(
        cfg.gyr_bias_noise * jnp.sqrt(jnp.maximum(pre_dt, 1e-3)), 1e-9
    )
    return sig_vq, sig_vv, wba, wbg


def _marginalize_oldest(state: SmootherState, cfg: ImuConfig, lidar_w,
                        gravity_w, dtype):
    """Schur-complement the oldest window state into a Gaussian prior on its
    successor.

    The dropped state's factors — the carried prior, its lidar pose prior,
    and the IMU pair factor to state 1 — are linearized at the current
    estimates and eliminated; the result is the exact (to GN order)
    marginal factor on state 1.  This is what makes the fixed-lag window
    equivalent to the reference's ISAM2-with-reset (PARITY #6): information
    accumulates in ``prior_info`` instead of being forgotten.
    """
    z15 = jnp.zeros((15,), dtype)
    z30 = jnp.zeros((30,), dtype)
    pre1 = jax.tree_util.tree_map(lambda a: a[1], state.preint)
    sig_vq, sig_vv, wba, wbg = _interval_weights(cfg, pre1.dt)
    xi = (state.q[0], state.p[0], state.v[0], state.ba[0], state.bg[0])
    xj = (state.q[1], state.p[1], state.v[1], state.ba[1], state.bg[1])

    one = jnp.ones((), dtype)
    pair = lambda d: _pair_factor_res(d, xi, xj, pre1, sig_vq, sig_vv, one,
                                      wba, wbg, gravity_w)
    rp, Jp = pair(z30), jax.jacfwd(pair)(z30)
    pr = lambda d: _pose_prior_res(d, state.q[0], state.p[0],
                                   state.meas_q[0], state.meas_p[0], lidar_w)
    r6, J6 = pr(z15), jax.jacfwd(pr)(z15)
    r0 = _state_tangent15(*xi, state.prior_q, state.prior_x)

    H = Jp.T @ Jp
    g = Jp.T @ rp
    H = H.at[:15, :15].add(J6.T @ J6 + state.prior_info)
    g = g.at[:15].add(J6.T @ r6 + state.prior_info @ r0)

    A, B, C = H[:15, :15], H[:15, 15:], H[15:, 15:]
    AinvB = _scaled_solve(A, B)
    Ainvg = _scaled_solve(A, g[:15])
    info = C - B.T @ AinvB
    info = 0.5 * (info + info.T)
    gm = g[15:] - B.T @ Ainvg

    # re-center the prior mean at the marginal optimum (GN order),
    # trust-capped like the window steps
    caps = jnp.asarray(_TRUST_CAPS, dtype)
    delta = jnp.clip(-_scaled_solve(info, gm), -caps, caps)
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
    q1 = quat_normalize(quat_mul(state.q[1], so3_exp(delta[0:3])))
    x1 = jnp.concatenate(
        [state.p[1], state.v[1], state.ba[1], state.bg[1]]
    ) + delta[3:]

    # exponential forgetting: marginalized factors stay linearized at the
    # estimates they were dropped with, so information accumulated early
    # (while biases were still converging) would pin the estimate off-truth
    # forever.  Geometric decay bounds that stale info's weight — the soft
    # equivalent of the reference's periodic ISAM2 reset
    # (imuPreintegration.cpp:162-205) — and also caps total information so
    # f32 stays healthy over unbounded runtime.
    info = info * jnp.asarray(cfg.prior_forgetting, dtype)
    scale = jnp.minimum(1.0, 1e6 / jnp.maximum(jnp.max(jnp.diag(info)), 1.0))
    info = info * scale + 1e-6 * jnp.eye(15, dtype=dtype)
    bad = ~(jnp.all(jnp.isfinite(info)) & jnp.all(jnp.isfinite(x1)))
    info = jnp.where(bad, _init_prior_info(cfg, dtype), info)
    x1 = jnp.where(bad, jnp.concatenate(
        [state.p[1], state.v[1], state.ba[1], state.bg[1]]), x1)
    return q1, x1, info


def smoother_update(
    state: SmootherState,
    cfg: ImuConfig,
    lidar_pose_imu: Pose,
    t_key,
    imu: ImuWindow,
    pre: Preintegrated | None = None,
) -> Tuple[SmootherState, Pose]:
    """Shift in a new keyframe constrained by the lidar pose (expressed in
    the IMU frame, i.e. already composed with lidar2Imu as in
    imuPreintegration.cpp:284) and re-solve the window by dense GN.

    Fixed-lag semantics: the state falling off the window is first
    marginalized into the carried prior (:func:`_marginalize_oldest`), and
    every window state keeps its ORIGINAL lidar measurement as its pose
    factor — together these make the finite window equivalent (to GN /
    first-order marginalization accuracy) to the reference's full ISAM2
    graph with periodic reset (imuPreintegration.cpp:279-337,162-205).

    ``pre`` may carry the interval's preintegration if the caller already
    computed it (the pipeline shares it with the LIO prediction source).
    Returns the updated window and the smoothed latest pose.
    """
    W = cfg.window_size
    dtype = state.p.dtype
    gravity_w = jnp.array([0.0, 0.0, -cfg.gravity], dtype)
    lidar_w = jnp.asarray(1.0 / cfg.lidar_correction_noise, dtype)

    if pre is None:
        pre = preintegrate(imu, state.ba[-1], state.bg[-1], rate=cfg.imu_rate)

    # marginalize the state about to fall off (only meaningful when the
    # window is full; otherwise the carried prior passes through)
    marg = state.valid[0] & state.valid[1]
    mq1, mx1, minfo = _marginalize_oldest(state, cfg, lidar_w, gravity_w,
                                          dtype)
    prior_q = jnp.where(marg, mq1, state.prior_q)
    prior_x = jnp.where(marg, mx1, state.prior_x)
    prior_info = jnp.where(marg, minfo, state.prior_info)

    # propagate a predicted state for the new keyframe
    q_pred, p_pred, v_pred = propagate_state(state, cfg, pre)

    first = ~state.valid[-1]
    q_new = jnp.where(first, lidar_pose_imu.q, q_pred)
    p_new = jnp.where(first, lidar_pose_imu.t, p_pred)
    v_new = jnp.where(first, jnp.zeros(3, dtype), v_pred)

    shift = lambda arr, new: jnp.concatenate([arr[1:], new[None]], axis=0)
    st = SmootherState(
        q=shift(state.q, q_new),
        p=shift(state.p, p_new),
        v=shift(state.v, v_new),
        ba=shift(state.ba, state.ba[-1]),
        bg=shift(state.bg, state.bg[-1]),
        t=shift(state.t, jnp.asarray(t_key, dtype)),
        meas_q=shift(state.meas_q, lidar_pose_imu.q),
        meas_p=shift(state.meas_p, lidar_pose_imu.t),
        preint=jax.tree_util.tree_map(
            lambda a, n: jnp.concatenate([a[1:], n[None]], axis=0),
            state.preint, pre
        ),
        prior_q=prior_q,
        prior_x=prior_x,
        prior_info=prior_info,
        valid=shift(state.valid, jnp.array(True)),
        key=state.key + 1,
        failed=state.failed,
    )

    # lidar pose priors: every state at its ORIGINAL measurement (tight,
    # sigma = lidar_correction_noise as in the reference); invalid lanes
    # dropped.  The marginal prior applies to lane 0 once the window is
    # full (prior_gate)
    prior_w = st.valid.astype(dtype) * lidar_w
    prior_gate = st.valid[0].astype(dtype)

    sig_vq, sig_vv, w_bias_a, w_bias_g = _interval_weights(cfg, st.preint.dt)
    sig_vq = sig_vq[-1]
    sig_vv = sig_vv[-1]
    w_bias_a = st.valid.astype(dtype) * w_bias_a
    w_bias_g = st.valid.astype(dtype) * w_bias_g

    pair_valid = (st.valid[:-1] & st.valid[1:]).astype(dtype)
    pre_pairs = jax.tree_util.tree_map(lambda a: a[1:], st.preint)

    def gn_iter(carry, _):
        q_c, p_c, v_c, ba_c, bg_c = carry

        # ---- block-sparse normal equations -----------------------------
        # The factor graph couples each state only to its priors (block
        # diagonal) and its successor (block tridiagonal).  Differentiating
        # per-factor (15- and 30-wide tangents, vmapped over lanes) instead
        # of one (15*W)-wide jacfwd over the whole window cuts the dominant
        # smoother cost ~3x; H is assembled from the blocks.
        z15 = jnp.zeros((15,), dtype)
        z30 = jnp.zeros((30,), dtype)

        r_pr, J_pr = jax.vmap(
            lambda q0, p0, mq, mp, w: (
                _pose_prior_res(z15, q0, p0, mq, mp, w),
                jax.jacfwd(_pose_prior_res)(z15, q0, p0, mq, mp, w),
            )
        )(q_c, p_c, st.meas_q, st.meas_p, prior_w)  # [W,6], [W,6,15]

        xi = (q_c[:-1], p_c[:-1], v_c[:-1], ba_c[:-1], bg_c[:-1])
        xj = (q_c[1:], p_c[1:], v_c[1:], ba_c[1:], bg_c[1:])
        r_pair, J_pair = jax.vmap(
            lambda xi_, xj_, pre_, wp, wa, wg: (
                _pair_factor_res(z30, xi_, xj_, pre_, sig_vq, sig_vv, wp,
                                 wa, wg, gravity_w),
                jax.jacfwd(_pair_factor_res)(z30, xi_, xj_, pre_, sig_vq,
                                             sig_vv, wp, wa, wg, gravity_w),
            )
        )(xi, xj, pre_pairs, pair_valid, w_bias_a[1:], w_bias_g[1:])
        # r_pair [W-1,15], J_pair [W-1,15,30]

        H = jnp.zeros((W * 15, W * 15), dtype)
        g = jnp.zeros((W * 15,), dtype)
        Hp = jnp.einsum("wri,wrj->wij", J_pr, J_pr)  # [W,15,15]
        gp = jnp.einsum("wri,wr->wi", J_pr, r_pr)
        for i in range(W):  # static unroll, W is small
            H = H.at[i * 15:(i + 1) * 15, i * 15:(i + 1) * 15].add(Hp[i])
            g = g.at[i * 15:(i + 1) * 15].add(gp[i])
        Hq = jnp.einsum("wri,wrj->wij", J_pair, J_pair)  # [W-1,30,30]
        gq = jnp.einsum("wri,wr->wi", J_pair, r_pair)
        for i in range(W - 1):
            sl = slice(i * 15, i * 15 + 30)
            H = H.at[sl, sl].add(Hq[i])
            g = g.at[sl].add(gq[i])
        # marginal prior on the oldest state (J ~ identity in its tangent)
        r0 = _state_tangent15(q_c[0], p_c[0], v_c[0], ba_c[0], bg_c[0],
                              st.prior_q, st.prior_x)
        H = H.at[:15, :15].add(prior_gate * st.prior_info)
        g = g.at[:15].add(prior_gate * (st.prior_info @ r0))
        # Hierarchical bias reparametrization: the bias random-walk factors
        # are ~1e5x stiffer than the IMU factors, so in the direct
        # parametrization the COMMON-MODE bias direction is a tiny
        # eigenvalue of the Jacobi-scaled system — below any safe f32
        # damping floor.  Re-expressing bias states as (first bias +
        # per-interval increments) via the linear map T gives the common
        # mode its OWN diagonal entry (curvature = the marginal prior's +
        # IMU factors' bias information): the stiff walk factors become
        # decoupled penalties on the increments and the scaled system
        # conditions like the pose/velocity blocks.
        T = _bias_cumsum_map(W, dtype)
        delta = T @ _scaled_solve(T.T @ H @ T, -(T.T @ g))
        delta = delta.reshape(W, 15)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        # trust region: bound each sub-block's per-iteration step
        caps = jnp.asarray(_TRUST_CAPS, dtype)
        delta = jnp.clip(delta, -caps, caps)
        out = (
            quat_normalize(quat_mul(q_c, so3_exp(delta[:, 0:3]))),
            p_c + delta[:, 3:6],
            v_c + delta[:, 6:9],
            ba_c + delta[:, 9:12],
            bg_c + delta[:, 12:15],
        )
        return out, None

    # static unroll: 2-3 iterations of [W,15]-scale work — a lax.scan wrapper
    # would add a while loop's layout constraints for no shape savings
    carry = (st.q, st.p, st.v, st.ba, st.bg)
    for _ in range(cfg.smoother_gn_iters):
        carry, _ = gn_iter(carry, None)
    q_f, p_f, v_f, ba_f, bg_f = carry

    # failure detection (imuPreintegration.cpp:398-417)
    failed = (
        (jnp.linalg.norm(v_f[-1]) > cfg.max_velocity)
        | (jnp.linalg.norm(ba_f[-1]) > cfg.max_acc_bias)
        | (jnp.linalg.norm(bg_f[-1]) > cfg.max_gyr_bias)
    )
    # on failure: keep lidar poses, zero velocity/bias, reset the carried
    # prior (resetParams behavior)
    keep = ~failed

    def sel(new, fallback):
        return jnp.where(keep, new, fallback)

    out = SmootherState(
        q=sel(q_f, st.meas_q),
        p=sel(p_f, st.meas_p),
        v=sel(v_f, jnp.zeros_like(v_f)),
        ba=sel(ba_f, jnp.zeros_like(ba_f)),
        bg=sel(bg_f, jnp.zeros_like(bg_f)),
        t=st.t,
        meas_q=st.meas_q,
        meas_p=st.meas_p,
        preint=st.preint,
        prior_q=sel(st.prior_q, st.meas_q[0]),
        prior_x=sel(st.prior_x, jnp.zeros((12,), dtype)),
        prior_info=sel(st.prior_info, _init_prior_info(cfg, dtype)),
        valid=st.valid,
        key=jnp.where(failed, 0, st.key),
        failed=failed,
    )
    return out, Pose(out.q[-1], out.p[-1])


def propagate_high_rate(
    state: SmootherState, cfg: ImuConfig, imu: ImuWindow
) -> Tuple[Pose, jnp.ndarray, jnp.ndarray]:
    """IMU-rate odometry: integrate the window forward from the latest
    smoothed state with current biases (reference repropagate_imuodometry +
    imuHandler predict, imuPreintegration.cpp:339-367,565).

    Returns per-sample (poses, velocities) stacked over the window.
    """
    dtype = state.p.dtype
    gravity_w = jnp.array([0.0, 0.0, -cfg.gravity], dtype)
    qs, vs, ps, _ = _integrate_chain(
        imu.t, imu.acc, imu.gyr, imu.mask, state.ba[-1], state.bg[-1], dtype,
        q0=state.q[-1], gravity_w=gravity_w, v0=state.v[-1], p0=state.p[-1],
        rate=cfg.imu_rate,
    )
    return Pose(qs, ps), vs, imu.mask
