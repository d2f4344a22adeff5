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
    """Fixed-lag window of navigation states at lidar keyframes."""

    q: jnp.ndarray  # f32[W,4] world<-imu orientation
    p: jnp.ndarray  # f32[W,3]
    v: jnp.ndarray  # f32[W,3]
    ba: jnp.ndarray  # f32[W,3]
    bg: jnp.ndarray  # f32[W,3]
    t: jnp.ndarray  # f32[W] keyframe times
    preint: Preintegrated  # stacked [W] (interval i-1 -> i; lane 0 unused)
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


def smoother_init(cfg: ImuConfig, dtype=jnp.float32) -> SmootherState:
    w = cfg.window_size
    return SmootherState(
        q=jnp.tile(quat_identity(dtype)[None], (w, 1)),
        p=jnp.zeros((w, 3), dtype),
        v=jnp.zeros((w, 3), dtype),
        ba=jnp.zeros((w, 3), dtype),
        bg=jnp.zeros((w, 3), dtype),
        t=jnp.zeros((w,), dtype),
        preint=_stack_preint(w, dtype),
        valid=jnp.zeros((w,), bool),
        key=jnp.zeros((), jnp.int32),
        failed=jnp.zeros((), bool),
    )


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

    ``pre`` may carry the interval's preintegration if the caller already
    computed it (the pipeline shares it with the LIO prediction source).
    Returns the updated window and the smoothed latest pose.
    """
    W = cfg.window_size
    dtype = state.p.dtype
    gravity_w = jnp.array([0.0, 0.0, -cfg.gravity], dtype)

    if pre is None:
        pre = preintegrate(imu, state.ba[-1], state.bg[-1], rate=cfg.imu_rate)

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
        preint=jax.tree_util.tree_map(
            lambda a, n: jnp.concatenate([a[1:], n[None]], axis=0), state.preint, pre
        ),
        valid=shift(state.valid, jnp.array(True)),
        key=state.key + 1,
        failed=state.failed,
    )

    # measurement: lidar pose prior on the newest state (tight, sigma =
    # lidar_correction_noise as in the reference) and on every older state
    # from its previous estimate (keeps the window anchored ~ marginals)
    meas_q = shift(state.q, lidar_pose_imu.q)
    meas_p = shift(state.p, lidar_pose_imu.t)
    # drop priors for invalid lanes
    prior_w = st.valid.astype(dtype) / cfg.lidar_correction_noise

    # IMU-factor weights from the preintegrated white-noise scale over one
    # interval (the role of GTSAM's propagated preintMeasCov): sigma ~
    # noise_density * sqrt(dt)
    dt_ref = jnp.maximum(st.preint.dt[-1], 1e-2)
    sig_vq = 1.0 / (cfg.gyr_noise * jnp.sqrt(dt_ref) + 1e-6)
    sig_vv = 1.0 / (cfg.acc_noise * jnp.sqrt(dt_ref) + 1e-6)
    w_bias_a = st.valid.astype(dtype) / jnp.maximum(
        cfg.acc_bias_noise * jnp.sqrt(jnp.maximum(st.preint.dt, 1e-3)), 1e-9
    )
    w_bias_g = st.valid.astype(dtype) / jnp.maximum(
        cfg.gyr_bias_noise * jnp.sqrt(jnp.maximum(st.preint.dt, 1e-3)), 1e-9
    )

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

        def prior_res(delta15, q0, p0, mq, mp, w):
            q = quat_normalize(quat_mul(q0, so3_exp(delta15[0:3])))
            p = p0 + delta15[3:6]
            r_q = so3_log(quat_mul(quat_conj(mq), q)) * w
            r_p = (p - mp) * w
            return jnp.concatenate([r_q, r_p])  # [6]

        def pair_res(delta30, xi, xj, pre_i, wpair, wba, wbg):
            qi0, pi0, vi0, bai0, bgi0 = xi
            qj0, pj0, vj0, _baj0, _bgj0 = xj
            di, dj = delta30[:15], delta30[15:]
            qi = quat_normalize(quat_mul(qi0, so3_exp(di[0:3])))
            pi = pi0 + di[3:6]
            vi = vi0 + di[6:9]
            bai = bai0 + di[9:12]
            bgi = bgi0 + di[12:15]
            qj = quat_normalize(quat_mul(qj0, so3_exp(dj[0:3])))
            pj = pj0 + dj[3:6]
            vj = vj0 + dj[6:9]
            baj = _baj0 + dj[9:12]
            bgj = _bgj0 + dj[12:15]
            r_q, r_v, r_p = _imu_residuals(
                qi, pi, vi, bai, bgi, qj, pj, vj, pre_i, gravity_w
            )
            return jnp.concatenate([
                r_q * sig_vq * wpair,
                r_v * sig_vv * wpair,
                r_p * sig_vv * wpair,
                (baj - bai) * (wba * wpair),
                (bgj - bgi) * (wbg * wpair),
            ])  # [15]

        z15 = jnp.zeros((15,), dtype)
        z30 = jnp.zeros((30,), dtype)

        pr_fn = lambda d, q0, p0, mq, mp, w: prior_res(d, q0, p0, mq, mp, w)
        r_pr, J_pr = jax.vmap(
            lambda q0, p0, mq, mp, w: (
                pr_fn(z15, q0, p0, mq, mp, w),
                jax.jacfwd(pr_fn)(z15, q0, p0, mq, mp, w),
            )
        )(q_c, p_c, meas_q, meas_p, prior_w)  # [W,6], [W,6,15]

        xi = (q_c[:-1], p_c[:-1], v_c[:-1], ba_c[:-1], bg_c[:-1])
        xj = (q_c[1:], p_c[1:], v_c[1:], ba_c[1:], bg_c[1:])
        r_pair, J_pair = jax.vmap(
            lambda xi_, xj_, pre_, wp, wa, wg: (
                pair_res(z30, xi_, xj_, pre_, wp, wa, wg),
                jax.jacfwd(pair_res)(z30, xi_, xj_, pre_, wp, wa, wg),
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
        # Jacobi preconditioning: the bias random-walk weights
        # (1/acc_w ~ 1e4, squared in H) give H a ~1e8 condition number,
        # which an f32 solve cannot survive; rescale to unit diagonal.
        d = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-8))
        # damping at the f32 precision floor: the bias random walk is ~1e5x
        # stiffer than the IMU factors and heavier damping freezes the
        # common-mode bias direction entirely
        Hs = H * d[:, None] * d[None, :] + 1e-7 * jnp.eye(W * 15, dtype=dtype)
        delta = -(d * jnp.linalg.solve(Hs, d * g)).reshape(W, 15)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        # trust region: bound each sub-block's per-iteration step
        caps = jnp.asarray(
            [0.5] * 3 + [2.0] * 3 + [5.0] * 3 + [0.2] * 3 + [0.1] * 3, dtype
        )
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
    # on failure: keep lidar pose, zero velocity/bias (resetParams behavior)
    keep = ~failed

    def sel(new, fallback):
        return jnp.where(keep, new, fallback)

    out = SmootherState(
        q=sel(q_f, meas_q),
        p=sel(p_f, meas_p),
        v=sel(v_f, jnp.zeros_like(v_f)),
        ba=sel(ba_f, jnp.zeros_like(ba_f)),
        bg=sel(bg_f, jnp.zeros_like(bg_f)),
        t=st.t,
        preint=st.preint,
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
