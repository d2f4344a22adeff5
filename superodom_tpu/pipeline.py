"""The odometry pipeline: one jitted pure function
``step(state, scan, imu_window) -> (state', output)``.

This single XLA program replaces the reference's three ROS 2 processes and
their topic chain (featureExtraction -> laserMapping -> imuPreintegration;
reference src/*_node.cpp, SURVEY.md section 1): undistortion, feature
extraction, auto voxel sizing, prediction-source selection, scan-to-map ICP,
motion gating, map update, and inertial smoothing all execute on device with
static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from superodom_tpu.config import PipelineConfig, RuntimeParams
from superodom_tpu.frontend import (
    ImuWindow,
    Scan,
    VioWindow,
    curvature_edge_extraction,
    decimated_width,
    thin_and_select,
    undistort_points,
    undistort_points_posed,
    uniform_feature_extraction,
    uniform_feature_gates,
)
from superodom_tpu.geometry import (
    Pose,
    matrix_to_quat,
    quat_angle,
    quat_conj,
    quat_from_rpy,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    rpy_from_quat,
    so3_exp,
    so3_log,
)
from superodom_tpu.inertial import (
    SmootherState,
    preintegrate,
    propagate_high_rate,
    propagate_state,
    smoother_init,
    smoother_update,
)
from superodom_tpu.mapstate import (
    VoxelHashMap,
    census_box,
    empty_map,
    evict_far,
    insert,
)
from superodom_tpu.registration import (
    IcpStats,
    PosePrior,
    icp_register,
)

# PredictionSource enum (reference LidarSlam.h:50-52)
PRED_IMU_ORIENTATION = 0
PRED_LIO_ODOM = 1
PRED_VIO_ODOM = 2
PRED_NEURAL_IMU_ODOM = 3
PRED_CONSTANT_VELOCITY = 4


class OdomState(NamedTuple):
    """Full estimator state — one pytree, trivially checkpointable
    (replaces scattered mutable members of the three reference nodes)."""

    pose: Pose  # T_w_lidar (latest accepted)
    pose_prev: Pose  # previous frame's pose (constant-velocity source)
    q_odom_pre: jnp.ndarray  # previous IMU orientation sample (q_wodom_pre)
    startup_count: jnp.ndarray  # i32 (laserMapping.cpp:272 startup logic)
    initialized: jnp.ndarray  # bool — first frame seeds the map instead of ICP
    frame_count: jnp.ndarray  # i32
    last_time: jnp.ndarray  # f32 previous scan timestamp
    rt: RuntimeParams  # adaptive voxel resolutions
    edge_map: VoxelHashMap
    surf_map: VoxelHashMap
    smoother: SmootherState
    degenerate: jnp.ndarray  # bool — from last registration
    uncertainty: jnp.ndarray  # f32[6] per-axis alignment risk of last frame
    obs_ema: jnp.ndarray  # f32[3] EMA of translation observability shares
    # (gates LIO trust under degeneracy: single-frame excursions in a
    # degenerate corridor must not re-arm LIO, see _select_prediction)
    vio_pose: Pose  # external odometry prediction (VIO path)
    vio_available: jnp.ndarray  # bool
    prev_imu: ImuWindow  # previous scan's IMU window — the smoother's
    # preintegration interval [t_{k-1}, t_k] (imuPreintegration.cpp:250-276
    # integrates up to the correction time, i.e. the PAST interval)


class StepOutput(NamedTuple):
    """Everything the reference publishes per scan, as one struct
    (laser_odometry + OptimizationStats + uncertainties + health)."""

    pose: Pose  # registered lidar pose (laser_odometry)
    smoothed_pose: Pose  # inertial-smoothed pose in lidar frame
    vel_body: jnp.ndarray  # f32[3] body-frame linear velocity
    ang_vel_body: jnp.ndarray  # f32[3] body-frame angular velocity
    acc_bias: jnp.ndarray  # f32[3]
    gyr_bias: jnp.ndarray  # f32[3]
    prediction_source: jnp.ndarray  # i32 enum
    icp: IcpStats
    surf_stack_num: jnp.ndarray  # i32 features in this scan
    edge_stack_num: jnp.ndarray
    surf_map_num: jnp.ndarray  # i32 map features near pose
    edge_map_num: jnp.ndarray
    average_distance: jnp.ndarray  # scene-scale statistic
    motion_accepted: jnp.ndarray  # bool — motion gates passed
    imu_healthy: jnp.ndarray  # bool — smoother failure detection
    translation_from_last: jnp.ndarray
    rotation_from_last: jnp.ndarray
    total_translation: jnp.ndarray  # |pose - initial guess| (stats fields)
    total_rotation: jnp.ndarray


def empty_imu_window(m: int, dtype=jnp.float32) -> ImuWindow:
    """All-masked-out IMU window (identity orientations)."""
    return ImuWindow(
        t=jnp.zeros((m,), dtype),
        acc=jnp.zeros((m, 3), dtype),
        gyr=jnp.zeros((m, 3), dtype),
        q=jnp.tile(quat_identity(dtype)[None], (m, 1)),
        mask=jnp.zeros((m,), bool),
    )


def empty_vio_window(k: int, dtype=jnp.float32) -> VioWindow:
    """All-masked-out external-odometry window."""
    return VioWindow(
        t=jnp.zeros((k,), dtype),
        q=jnp.tile(quat_identity(dtype)[None], (k, 1)),
        p=jnp.zeros((k, 3), dtype),
        mask=jnp.zeros((k,), bool),
    )


def edge_map_config(cfg: PipelineConfig) -> "MapConfig":
    """The edge map's table config: full-size when edge features are on,
    minimal otherwise (no reason to carry + census a 10+ MB unused table)."""
    import dataclasses as _dc

    if cfg.use_edge_features:
        return cfg.map
    return _dc.replace(cfg.map, table_size=64, bucket_size=8,
                       cell_capacity=4)


def init_state(cfg: PipelineConfig, dtype=jnp.float32) -> OdomState:
    loc = cfg.localization
    if loc.enabled:
        q0 = quat_from_rpy(*[jnp.asarray(v, dtype) for v in loc.init_pose_rpy])
        t0 = jnp.asarray(loc.init_pose_xyz, dtype)
    else:
        q0 = quat_identity(dtype)
        t0 = jnp.zeros(3, dtype)
    pose0 = Pose(q0, t0)
    return OdomState(
        pose=pose0,
        pose_prev=pose0,
        q_odom_pre=quat_identity(dtype),
        startup_count=jnp.asarray(cfg.startup_frames, jnp.int32),
        initialized=jnp.asarray(False),
        frame_count=jnp.asarray(0, jnp.int32),
        last_time=jnp.asarray(0.0, dtype),
        rt=RuntimeParams(
            line_res=jnp.asarray(cfg.sensor.default_line_res, dtype),
            plane_res=jnp.asarray(cfg.sensor.default_plane_res, dtype),
        ),
        edge_map=empty_map(edge_map_config(cfg), dtype),
        surf_map=empty_map(cfg.map, dtype),
        smoother=smoother_init(cfg.imu, dtype),
        degenerate=jnp.asarray(False),
        uncertainty=jnp.zeros((6,), dtype),
        # conservative: the EMA must EARN trust from measured shares.  A
        # ones-init left min(obs_ema) above the LIO threshold for ~15
        # frames after an observable->degenerate transition (or a
        # localization start inside a corridor), re-arming LIO exactly in
        # the window the veto exists to cover (ADVICE r4).
        obs_ema=jnp.zeros((3,), dtype),
        vio_pose=Pose.identity(dtype),
        vio_available=jnp.asarray(False),
        prev_imu=empty_imu_window(cfg.imu.max_imu_per_scan, dtype),
    )


OBS_EMA_DECAY = 0.8  # per-accepted-frame decay of the observability EMA


def update_obs_ema(obs_ema, uncertainty3, run_icp):
    """Per-axis translation-observability EMA, advanced only on frames
    whose solve actually ran (a skipped/gated frame carries no new
    observability evidence).  The EMA — not the instantaneous share —
    feeds the LIO trust gate: a degenerate corridor's single-frame
    excursions above the threshold must not re-arm LIO (measured:
    per-frame gating leaked enough trusted frames to corrupt y/z by
    1.8 m), while a baffled avenue's stationary share keeps its trust."""
    return jnp.where(
        run_icp,
        OBS_EMA_DECAY * obs_ema + (1.0 - OBS_EMA_DECAY) * uncertainty3,
        obs_ema,
    )


def lio_obs_trusted(degenerate, obs_ema, min_observability: float,
                    obs_inst=None):
    """LIO-prediction trust gate (see PipelineConfig.lio_min_observability):
    trust when the last solve was healthy, OR when every translation
    axis's observability holds a real feature share — the regime
    separation between a baffled avenue (condition-number degenerate but
    every axis observed; position-holding there outruns the
    correspondence gates) and a featureless corridor (an axis truly
    starved; LIO there closes a feedback loop).

    BOTH the EMA and the instantaneous share must clear the threshold
    (ADVICE r4): the EMA alone vetoes a corridor's single-frame
    excursions but takes ~11 frames (0.8 decay) to drop trust after an
    observable->degenerate transition — exactly the window the veto
    exists to cover; the instantaneous share drops the same frame."""
    trusted = ~degenerate
    if min_observability > 0.0:
        share_ok = jnp.min(obs_ema) > min_observability
        if obs_inst is not None:
            share_ok = share_ok & (jnp.min(obs_inst) > min_observability)
        trusted = trusted | share_ok
    return trusted


def _extract_roll_pitch(q: jnp.ndarray) -> jnp.ndarray:
    """Zero the yaw component (reference utils::extractRollPitch used at
    first-frame init, laserMapping.cpp:286)."""
    roll, pitch, _ = rpy_from_quat(q)
    return quat_from_rpy(roll, pitch, jnp.zeros_like(roll))


def _select_prediction(
    cfg: PipelineConfig,
    state: OdomState,
    q_imu: jnp.ndarray,
    imu_available: jnp.ndarray,
    lio_pose: Pose | None = None,
    lio_available: jnp.ndarray | None = None,
) -> Tuple[Pose, jnp.ndarray, jnp.ndarray]:
    """Prediction-source state machine (reference setInitialGuess +
    selectPosePrediction + determinePredictionSource,
    laserMapping.cpp:264-412).  The NIO path stays latent (as in the slim
    reference, statuses hardwired false, laserMapping.cpp:680-684); the VIO
    path activates under degeneracy when an external pose is supplied; the
    LIO path (preintegrated smoother state propagated to the scan time) is
    realized here — it predicts THROUGH acceleration transients that
    IMU-orientation / constant-velocity prediction miss."""
    dtype = state.pose.t.dtype
    R_il = jnp.asarray(np.asarray(cfg.extrinsics.R_imu_laser), dtype)
    q_extr = quat_normalize(matrix_to_quat(R_il))

    # --- first frame -------------------------------------------------------
    rp = _extract_roll_pitch(q_imu)
    q_first = quat_normalize(quat_mul(quat_conj(q_extr), rp))
    q_first = jnp.where(imu_available, q_first, quat_identity(dtype))
    first_pose = Pose(q_first, jnp.zeros(3, dtype))
    if cfg.localization.enabled:
        first_pose = Pose(state.pose.q, state.pose.t)  # configured init pose

    # --- startup: IMU orientation only ------------------------------------
    startup_pose = Pose(
        jnp.where(imu_available, q_imu, state.pose.q), state.pose.t
    )

    # --- normal operation ---------------------------------------------------
    use_vio = state.degenerate & state.vio_available
    # IMU orientation: q_pred = q_curr * q_pre^-1 * q_now (laserMapping.cpp:364)
    q_pred = quat_normalize(
        quat_mul(state.pose.q, quat_mul(quat_conj(state.q_odom_pre), q_imu))
    )
    # constant velocity: T * (T_prev^-1 * T) (laserMapping.cpp:371-375)
    rel = state.pose_prev.inverse().compose(state.pose)
    cv_pose = state.pose.compose(rel)
    # The IMU-orientation source HOLDS the last position and relies on the
    # full ICP correction for translation (reference laserMapping.cpp:
    # 371-375).  Extrapolating translation at constant velocity here was
    # tried and REVERTED: a position-hold prediction cannot compound a
    # velocity error across frames, while CV extrapolation against weak
    # corrections (far-field scenes) turns an under-corrected frame into a
    # runaway (stress battery far_field: 0.25 m ATE held vs 21.6 m CV).
    # Remapping never needs the prediction to carry translation because its
    # motion gate restricts it to near-static platforms.
    imu_pose = Pose(q_pred, state.pose.t)

    normal_pose = jax.tree_util.tree_map(
        lambda a, b: jnp.where(imu_available, a, b), imu_pose, cv_pose
    )
    source = jnp.where(
        imu_available, PRED_IMU_ORIENTATION, PRED_CONSTANT_VELOCITY
    )
    if lio_pose is not None:
        # the reference trusts LIO only when the LAST solve was healthy
        # (determinePredictionSource checks isDegenerate first,
        # laserMapping.cpp:384-402): in a truly unobservable corridor the
        # smoother's velocity is fed by unobservable lidar poses and LIO
        # prediction closes a feedback loop.  But a scene can flag
        # degenerate by condition number while every axis keeps a real
        # feature share (a long baffled avenue) — there, position-holding
        # at speed outruns the correspondence gates and stalls tracking
        # permanently.  The observability gate separates the regimes
        # (see PipelineConfig.lio_min_observability).
        trusted = lio_obs_trusted(
            state.degenerate, state.obs_ema, cfg.lio_min_observability,
            obs_inst=state.uncertainty[:3],
        )
        use_lio = lio_available & imu_available & trusted
        normal_pose = jax.tree_util.tree_map(
            lambda a, b: jnp.where(use_lio, a, b), lio_pose, normal_pose
        )
        source = jnp.where(use_lio, PRED_LIO_ODOM, source)
    normal_pose = jax.tree_util.tree_map(
        lambda a, b: jnp.where(use_vio, a, b), state.vio_pose, normal_pose
    )
    source = jnp.where(use_vio, PRED_VIO_ODOM, source).astype(jnp.int32)

    in_startup = (state.startup_count > 0) & state.initialized
    pred = jax.tree_util.tree_map(
        lambda s, n: jnp.where(in_startup, s, n), startup_pose, normal_pose
    )
    pred = jax.tree_util.tree_map(
        lambda f, p: jnp.where(state.initialized, p, f), first_pose, pred
    )
    source = jnp.where(state.initialized & ~in_startup, source, PRED_IMU_ORIENTATION)
    return pred, source, use_vio


def _adjust_voxel_size(
    cfg: PipelineConfig, rt: RuntimeParams, xyz, mask
) -> Tuple[RuntimeParams, jnp.ndarray]:
    """Scene-scale adaptive resolutions (reference adjustVoxelSize,
    laserMapping.cpp:600-651): product of per-axis mean |coord| selects
    near/far presets."""
    w = mask.astype(xyz.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    avg = jnp.sum(jnp.abs(xyz) * w[:, None], axis=0) / n
    average_distance = avg[0] * avg[1] * avg[2]
    if not cfg.auto_voxel_size:
        return rt, average_distance
    near = average_distance < 25.0
    far = average_distance > 65.0
    line = jnp.where(near, 0.1, jnp.where(far, 0.4, rt.line_res))
    plane = jnp.where(near, 0.2, jnp.where(far, 0.8, rt.plane_res))
    return RuntimeParams(line_res=line, plane_res=plane), average_distance


def step(
    cfg: PipelineConfig,
    state: OdomState,
    scan: Scan,
    imu: ImuWindow,
    imu_available: jnp.ndarray,
    vio: VioWindow | None = None,
) -> Tuple[OdomState, StepOutput]:
    """Process one scan end-to-end.  Static under ``jax.jit`` given ``cfg``.

    Mirrors laserMapping::process (laserMapping.cpp:768-793) with the
    feature-extraction stage inlined ahead of it and the inertial smoother
    after it.  ``vio`` (an external 6-DoF pose path covering the sweep) is
    consumed only when ``cfg.use_vio_undistortion`` — see
    :func:`_apply_vio_undistortion`.
    """
    dtype = scan.xyz.dtype
    sensor = cfg.sensor
    reg = cfg.registration
    np_ext = cfg.extrinsics
    R_il = jnp.asarray(np.asarray(np_ext.R_imu_laser), dtype)
    t_il = jnp.asarray(np.asarray(np_ext.t_imu_laser), dtype)

    # ---------------- frontend: extract features, then undistort -----------
    # Feature gates/thinning run on the RAW cloud and only the selected
    # features are undistorted: distortion over one sweep (<= a few cm at
    # normal platform speeds) is far below the thinning resolution, and the
    # reference only undistorts everything because it republishes the full
    # cloud, which this pipeline does not.
    #
    # Two static scan layouts (dispatched on the input width):
    # * HOST-DECIMATED (runner.make_scan, edge features off): the stride +
    #   duplicate gates already ran on host over contiguous numpy views, the
    #   device receives only the ~N/stride candidate lanes.  A device-side
    #   strided slice is NOT equivalent: XLA lowers it to per-row gathers
    #   (~0.3 ms per 44k-lane slice on v5e, measured) while the host slice
    #   is free and cuts upload bandwidth by the stride factor.
    # * FULL-WIDTH (edge extraction needs the raw ring-major cloud): stride
    #   and duplicate gates run on device, wide ops are top_k-compacted.
    pre_decimated = scan.xyz.shape[0] < sensor.max_points
    if pre_decimated:
        if cfg.use_edge_features:
            raise ValueError(
                "edge extraction needs the full ring-major cloud; "
                "pass full-width scans when use_edge_features=True"
            )
        if scan.xyz.shape[0] != decimated_width(
            sensor.max_points, sensor.filter_point_size
        ):
            raise ValueError(
                f"scan width {scan.xyz.shape[0]} is neither max_points "
                f"({sensor.max_points}) nor the decimated width "
                f"({decimated_width(sensor.max_points, sensor.filter_point_size)})"
            )
        sxyz, strel = scan.xyz, scan.t_rel
        feat_mask = uniform_feature_gates(
            sxyz, jnp.zeros((1, 3), dtype), scan.mask,
            sensor.min_range, sensor.max_range, skip_dup=True,
        )
    else:
        sxyz, strel = scan.xyz, scan.t_rel
        feat_mask = uniform_feature_extraction(
            scan.xyz, scan.mask, sensor.filter_point_size, sensor.min_range,
            sensor.max_range,
        )

    rt, average_distance = _adjust_voxel_size(cfg, state.rt, sxyz, feat_mask)

    # scan-stack voxel thinning (the role of downSizeFilterSurf,
    # laserMapping.cpp:643-645).  Scatter-claim keeps the first point per
    # voxel instead of PCL's centroid — one O(N) scatter instead of two
    # full argsorts; wide clouds are top_k-compacted first so the scatter
    # runs narrow (see frontend.thin_and_select).
    surf_raw, surf_mask, surf_trel = thin_and_select(
        sxyz, feat_mask, rt.plane_res, sensor.max_surface_features,
        sensor.compact_width, strel, mode=sensor.scan_thin_mode,
        table_bits=max((sensor.max_points * 4 - 1).bit_length(), 4),
    )
    surf_u, q_w_orig_l, _ = undistort_points(
        surf_raw, surf_trel, surf_mask, scan.t_start, imu, R_il, t_il
    )
    surf_pts = jnp.where(imu_available, surf_u, surf_raw)
    q_imu_pred = jnp.where(imu_available, q_w_orig_l, quat_identity(dtype))

    # only past the startup window: before that the inter-frame twist /
    # smoother velocity is first-frame/startup garbage and smearing the
    # scan with it poisons the young map (observed: 3x ATE on
    # outliers_clusters from de-skewed pre-init frames)
    settled = state.frame_count > cfg.startup_frames

    # constant-velocity de-skew for IMU-less sweeps (KISS-ICP-style; see
    # PipelineConfig.use_cv_undistortion): extrapolate the previous
    # inter-scan twist across this sweep
    use_cv = jnp.asarray(False)
    use_trans = jnp.asarray(False)
    if cfg.use_cv_undistortion:
        rel = state.pose_prev.inverse().compose(state.pose)
        nominal = sensor.scan_period * max(sensor.skip_frame, 1)
        rot_vec = so3_log(rel.q)
        # motion-sanity guard: a rollback or teleport must not smear the
        # scan with a garbage twist
        sane = (jnp.linalg.norm(rel.t) < 2.0) & (
            jnp.linalg.norm(rot_vec) < 0.5)
        use_cv = ~imu_available & state.initialized & sane & settled
        s = (surf_trel / nominal)[:, None]
        q_s = so3_exp(s * rot_vec[None, :])
        cv = quat_rotate(q_s, surf_raw) + s * rel.t[None, :]
        cv = jnp.where(surf_mask[:, None], cv, surf_raw)
        surf_pts = jnp.where(use_cv, cv, surf_pts)
    # translation de-skew for IMU-COVERED sweeps: the IMU path removes
    # rotation only (as does the reference, removePointDistortion<Imu>,
    # featureExtraction.cpp:292-313), leaving the v * scan_period
    # translation smear in the scan — ~0.4 m at 4 m/s, which a deeply
    # converged ICP then engraves into the young map (measured at full
    # density: the whole-trajectory along-track error saturates at exactly
    # v*T/2 — the estimator tracks the mid-sweep pose — aggressive_6dof
    # ATE 0.42, closed_loop return-to-origin 0.22 at 5 ICP iters).
    # Rotation comes from the IMU slerp; translation from the SMOOTHER's
    # velocity rotated into the body frame with the smoother's own
    # orientation (frame-consistent pair).  NOT from the pose-difference
    # twist: that feeds the last solve's estimation error back into the
    # next scan's de-skew, a positive-feedback 2-cycle that measurably
    # grows an alternating-sign oscillation near rest (closed_loop
    # endpoint error 0.38 m); the IMU-filtered smoother velocity is the
    # damped source.
    if cfg.use_translation_deskew:
        v_b = quat_rotate(quat_conj(state.smoother.q[-1]),
                          state.smoother.v[-1])
        smoother_ok = state.smoother.valid[-1] & ~state.smoother.failed
        v_sane = jnp.linalg.norm(v_b) < cfg.imu.max_velocity
        use_trans = (imu_available & state.initialized & smoother_ok
                     & v_sane & settled)
        tr = jnp.where(surf_mask[:, None],
                       surf_trel[:, None] * v_b[None, :], 0.0)
        surf_pts = jnp.where(use_trans, surf_u + tr, surf_pts)

    # 6-DoF VIO-path undistortion (reference removePointDistortion<Odometry>,
    # featureExtraction.cpp:236-249,462-468): when the external pose path
    # covers the sweep, rotation AND translation of the platform during the
    # sweep are removed — rotation-only IMU undistortion leaves a
    # v * scan_period smear under fast translation.
    vio_ok = jnp.asarray(False)
    vio_start = state.vio_pose
    if cfg.use_vio_undistortion and vio is not None:
        vio_ok = _vio_covers(scan, vio)
        surf_v, q_vio0, p_vio0 = undistort_points_posed(
            surf_raw, surf_trel, surf_mask, scan.t_start,
            vio.t, vio.q, vio.p, vio.mask,
        )
        surf_pts = jnp.where(vio_ok, surf_v, surf_pts)
        vio_start = Pose(q_vio0, p_vio0)

    if cfg.use_edge_features:
        em_full = curvature_edge_extraction(
            scan.xyz, scan.ring, scan.mask,
            curvature_threshold=cfg.edge_curvature_threshold,
            min_range=sensor.min_range,
        )
        edge_raw, edge_mask, edge_trel = thin_and_select(
            scan.xyz, em_full, rt.line_res, sensor.max_edge_features,
            sensor.compact_width // 2, scan.t_rel,
        )
        edge_u, _, _ = undistort_points(
            edge_raw, edge_trel, edge_mask, scan.t_start, imu, R_il, t_il
        )
        edge_pts = jnp.where(imu_available, edge_u, edge_raw)
        if cfg.use_cv_undistortion:
            se = (edge_trel / nominal)[:, None]
            q_se = so3_exp(se * rot_vec[None, :])
            cv_e = quat_rotate(q_se, edge_raw) + se * rel.t[None, :]
            cv_e = jnp.where(edge_mask[:, None], cv_e, edge_raw)
            edge_pts = jnp.where(use_cv, cv_e, edge_pts)
        if cfg.use_translation_deskew:
            tr_e = jnp.where(edge_mask[:, None],
                             edge_trel[:, None] * v_b[None, :], 0.0)
            edge_pts = jnp.where(use_trans, edge_u + tr_e, edge_pts)
        if cfg.use_vio_undistortion and vio is not None:
            edge_v, _, _ = undistort_points_posed(
                edge_raw, edge_trel, edge_mask, scan.t_start,
                vio.t, vio.q, vio.p, vio.mask,
            )
            edge_pts = jnp.where(vio_ok, edge_v, edge_pts)
    else:
        # slim-release parity: empty edge clouds (featureExtraction.cpp:429)
        edge_pts = jnp.zeros((sensor.max_edge_features, 3), dtype)
        edge_mask = jnp.zeros((sensor.max_edge_features,), bool)

    # ---------------- prediction ------------------------------------------
    if cfg.use_vio_undistortion and vio is not None:
        # a covering VIO window refreshes the external-pose aiding for THIS
        # scan (prediction source + absolute-pose prior under degeneracy);
        # availability is per-scan freshness, not sticky — a dropped-out VIO
        # stream must not leave a stale prior active (the reference checks
        # vision/laser time alignment, laserMapping.cpp:384-412)
        state = state._replace(
            vio_pose=jax.tree_util.tree_map(
                lambda a, b: jnp.where(vio_ok, a, b), vio_start,
                state.vio_pose,
            ),
            vio_available=vio_ok,
        )
    # LIO source: preintegrate the carried previous interval ONCE; shared
    # with the smoother below (integrate_imumeasurement's dual role in the
    # reference, imuPreintegration.cpp:250-276)
    lidar2imu = Pose(matrix_to_quat(R_il), t_il)
    pre = preintegrate(state.prev_imu, state.smoother.ba[-1],
                       state.smoother.bg[-1], rate=cfg.imu.imu_rate)
    lio_pose = None
    lio_available = None
    if cfg.enable_lio_prediction:
        q_lio, p_lio, _v = propagate_state(state.smoother, cfg.imu, pre)
        lio_imu_pose = Pose(q_lio, p_lio)
        lio_pose = lio_imu_pose.compose(lidar2imu.inverse())
        # trust the propagated state once the window has real history and
        # the interval actually carries IMU samples
        lio_available = (
            state.smoother.valid[0]
            & ~state.smoother.failed
            & (pre.dt > 1e-3)
            & jnp.any(state.prev_imu.mask)
        )
    pred_pose, source, use_vio = _select_prediction(
        cfg, state, q_imu_pred, imu_available, lio_pose, lio_available
    )

    # ---------------- scan-to-map registration ----------------------------
    half_extent = jnp.asarray([125.0, 125.0, 75.0], dtype)  # 5x5x3 of 50 m blocks
    surf_map_num = census_box(state.surf_map, cfg.map, pred_pose.t, half_extent)
    edge_map_num = census_box(state.edge_map, cfg.map, pred_pose.t, half_extent)
    enough = surf_map_num > reg.min_map_surf_features  # LidarSlam.cpp:379-381

    prior = PosePrior(
        pose=state.vio_pose,
        information=_vio_information(state, surf_mask, reg, dtype),
        enabled=use_vio,
    )
    # The per-axis match-count hold is armed only while the map is young
    # (warm-up window + the 5-frame re-warm after a velocity-gate rollback,
    # startup_count resets below): that's where the measured pathology lives
    # (a warming-up map's tilted fits walked 0.43 m at rest with zero
    # axis votes).  Past warm-up, sparse votes are real signal — an
    # unscoped hold froze the travel axis in far-field scenes (round-4
    # regression).  See RegistrationConfig.axis_hold_min_matches.
    hold_enabled = (state.startup_count > 0) | (
        state.frame_count <= cfg.startup_frames
    )
    reg_pose, icp_stats = icp_register(
        state.edge_map, state.surf_map, cfg.map, reg, pred_pose,
        edge_pts, edge_mask, surf_pts, surf_mask, rt, prior,
        use_edges=cfg.use_edge_features,
        hold_enabled=hold_enabled,
    )
    # accepted-correspondence sufficiency: plane_rejection_hist[0] counts
    # MATCH_SUCCESS codes of the final extraction (+ edge successes when the
    # edge path is on) — see min_plane_matches in RegistrationConfig
    n_matches = icp_stats.plane_rejection_hist[0]
    if cfg.use_edge_features:
        n_matches = n_matches + icp_stats.line_rejection_hist[0]
    enough_matches = n_matches >= reg.min_plane_matches
    run_icp = state.initialized & enough & enough_matches
    pose = jax.tree_util.tree_map(
        lambda r, p: jnp.where(run_icp, r, p), reg_pose, pred_pose
    )
    # NaN guard: a pathological solve never corrupts the trajectory
    finite = jnp.all(jnp.isfinite(pose.t)) & jnp.all(jnp.isfinite(pose.q))
    pose = jax.tree_util.tree_map(
        lambda a, b: jnp.where(finite, a, b), pose, pred_pose
    )

    # ---------------- post-optimization (LidarSlam.cpp:155-210) ------------
    # manual yaw correction: yaw += |dt| * yaw_ratio (deg/m)
    trans_from_last, rot_from_last = _pose_delta(state.pose, pose)
    if reg.yaw_ratio != 0.0:
        roll, pitch, yaw = rpy_from_quat(pose.q)
        yaw = yaw + trans_from_last * (reg.yaw_ratio * jnp.pi / 180.0)
        pose = Pose(quat_from_rpy(roll, pitch, yaw), pose.t)

    dt_scan = scan.t_start - state.last_time
    vel_gate = jnp.where(
        state.initialized & (dt_scan > 1e-6),
        trans_from_last / jnp.maximum(dt_scan, 1e-6)
        < reg.velocity_failure_threshold,
        True,
    )
    small_motion = (trans_from_last < 0.02) & (rot_from_last < 0.005)
    accepted = vel_gate & ~small_motion
    # rollbacks (the reference still inserts the scan into the map:
    # checkMotionThresholds forces acceptResult=true, LidarSlam.cpp:193)
    pose = jax.tree_util.tree_map(
        lambda cur, last: jnp.where(vel_gate & ~small_motion, cur, last),
        pose, state.pose,
    )
    startup_count = jnp.where(
        ~vel_gate, 5, jnp.maximum(state.startup_count - 1, 0)
    ).astype(jnp.int32)

    # ---------------- map update ------------------------------------------
    do_update_map = jnp.asarray(
        (not cfg.localization.enabled) or cfg.localization.update_map
    )
    surf_world = pose.apply(surf_pts)
    edge_world = pose.apply(edge_pts)
    # insert on a cadence (lax.cond executes one branch): consecutive scans
    # overlap almost entirely and the point-table scatter is the costliest
    # op in the step; the first frames always insert to seed the map
    # NOTE: a lax.cond whose identity branch passes the (tens of MB) map
    # through forces a buffer copy on the skipped frames; use conds only
    # when the cadence actually skips work (cadence > 1)
    def _cadenced(pred_static_on, pred, fn, mp):
        if pred_static_on:
            return fn(mp)
        return jax.lax.cond(pred, fn, lambda m: m, mp)

    do_insert = (state.frame_count % cfg.map.insert_cadence == 0) | (
        state.frame_count < 8
    )
    surf_map = _cadenced(
        cfg.map.insert_cadence == 1, do_insert,
        lambda mp: insert(mp, cfg.map, surf_world,
                          surf_mask & do_update_map, rt.plane_res),
        state.surf_map,
    )
    # evict on a cadence: a full-table distance pass every frame is wasted
    # work (the rolling region moves slowly) — unless conds cost more
    do_evict = state.frame_count % cfg.map.evict_cadence == 0
    surf_map = _cadenced(
        cfg.map.evict_cadence == 1, do_evict,
        lambda mp: evict_far(mp, cfg.map, pose.t), surf_map,
    )
    if cfg.use_edge_features:
        edge_map = _cadenced(
            cfg.map.insert_cadence == 1, do_insert,
            lambda mp: insert(mp, cfg.map, edge_world,
                              edge_mask & do_update_map, rt.line_res),
            state.edge_map,
        )
        edge_map = _cadenced(
            cfg.map.evict_cadence == 1, do_evict,
            lambda mp: evict_far(mp, cfg.map, pose.t), edge_map,
        )
    else:
        edge_map = state.edge_map

    # ---------------- inertial smoother (process 3) ------------------------
    # The IMU factor between keyframes k-1 -> k preintegrates the PAST
    # interval (the previous scan's window, carried in state), matching the
    # reference's integrate-up-to-correction-time semantics
    # (imuPreintegration.cpp:250-276).  ``pre`` was computed for the LIO
    # prediction above.
    pose_imu_frame = pose.compose(lidar2imu)
    smoother, smoothed_imu = smoother_update(
        state.smoother, cfg.imu, pose_imu_frame, scan.t_start,
        state.prev_imu, pre=pre,
    )
    smoothed_pose = smoothed_imu.compose(lidar2imu.inverse())

    # ---------------- body velocities (laserMapping.cpp:744-758) ----------
    vel_w = (pose.t - state.pose.t) / jnp.maximum(dt_scan, 1e-6)
    vel_body = quat_rotate(quat_conj(pose.q), vel_w)
    dq = quat_mul(pose.q, quat_conj(state.pose.q))
    ang_vel_w = so3_log(dq) / jnp.maximum(dt_scan, 1e-6)
    ang_vel_body = quat_rotate(quat_conj(pose.q), ang_vel_w)
    zero_v = ~state.initialized | (dt_scan <= 1e-6)
    vel_body = jnp.where(zero_v, 0.0, vel_body)
    ang_vel_body = jnp.where(zero_v, 0.0, ang_vel_body)

    total_trans, total_rot = _pose_delta(pred_pose, pose)

    new_state = OdomState(
        pose=pose,
        pose_prev=state.pose,
        q_odom_pre=jnp.where(imu_available, q_imu_pred, state.q_odom_pre),
        startup_count=startup_count,
        initialized=jnp.asarray(True),
        frame_count=state.frame_count + 1,
        last_time=jnp.asarray(scan.t_start, dtype),
        rt=rt,
        edge_map=edge_map,
        surf_map=surf_map,
        smoother=smoother,
        degenerate=icp_stats.degenerate & run_icp,
        uncertainty=jnp.where(run_icp, icp_stats.uncertainty,
                              state.uncertainty),
        obs_ema=update_obs_ema(
            state.obs_ema, icp_stats.uncertainty[:3], run_icp
        ),
        vio_pose=state.vio_pose,
        vio_available=state.vio_available,
        prev_imu=imu._replace(mask=imu.mask & imu_available),
    )
    out = StepOutput(
        pose=pose,
        smoothed_pose=smoothed_pose,
        vel_body=vel_body,
        ang_vel_body=ang_vel_body,
        acc_bias=smoother.ba[-1],
        gyr_bias=smoother.bg[-1],
        prediction_source=source,
        icp=icp_stats,
        surf_stack_num=jnp.sum(surf_mask.astype(jnp.int32)),
        edge_stack_num=jnp.sum(edge_mask.astype(jnp.int32)),
        surf_map_num=surf_map_num,
        edge_map_num=edge_map_num,
        average_distance=average_distance,
        motion_accepted=accepted,
        imu_healthy=~smoother.failed,
        translation_from_last=trans_from_last,
        rotation_from_last=rot_from_last,
        total_translation=total_trans,
        total_rotation=total_rot,
    )
    return new_state, out


def _pose_delta(a: Pose, b: Pose):
    rel = a.inverse().compose(b)
    return jnp.linalg.norm(rel.t), quat_angle(rel.q)


def _vio_covers(scan: Scan, vio: VioWindow) -> jnp.ndarray:
    """Sweep-coverage gate for the external pose path: >= 2 samples spanning
    [t_start, t_end] (the reference requires the scan fully inside the
    measurement timespan, synchronize_measurements,
    featureExtraction.cpp:171-217)."""
    n = jnp.sum(vio.mask.astype(jnp.int32))
    tmin = jnp.min(jnp.where(vio.mask, vio.t, jnp.inf))
    tmax = jnp.max(jnp.where(vio.mask, vio.t, -jnp.inf))
    t_end = scan.t_start + jnp.max(jnp.where(scan.mask, scan.t_rel, 0.0))
    return (n >= 2) & (tmin <= scan.t_start + 1e-6) & (tmax + 1e-6 >= t_end)


def _vio_information(state, surf_mask, reg, dtype):
    """Information weights of the absolute-pose constraint under degeneracy
    (reference addAbsolutePoseConstraints, LidarSlam.cpp:285-298): per-axis
    weights scale with the PREVIOUS frame's carried alignment-risk
    uncertainty — a well-constrained axis leans on the lidar, an
    unconstrained one on the external prior.  NOTE the reference's
    "uncertainty" convention: the value is the (x3, capped) share of
    features observing the axis, so LOW means poorly observed."""
    n_feat = jnp.sum(surf_mask.astype(dtype))
    vcf = reg.visual_confidence_factor
    unc = state.uncertainty  # f32[6]; LOW value = axis poorly observed
    # (1 - unc): a poorly-observed axis leans harder on the external prior
    w_t = (1.0 - unc[:3]) * jnp.maximum(50.0, n_feat * 0.1) * vcf
    w_rp = jnp.full((2,), jnp.maximum(10.0, n_feat * 0.01) * vcf, dtype)
    w_yaw = jnp.zeros((1,), dtype)  # yaw weight zeroed in the reference (:294)
    return jnp.concatenate([w_t, w_rp, w_yaw])


import functools


@functools.lru_cache(maxsize=32)
def make_step_fn(cfg: PipelineConfig):
    """jit-compiled step with the config closed over (static).

    Cached by config (frozen dataclasses hash) so repeated runners with the
    same config reuse one compiled program.  When
    ``cfg.use_vio_undistortion`` the compiled step takes a trailing
    VioWindow argument.
    """

    if cfg.use_vio_undistortion:
        def _step(state, scan, imu, imu_available, vio):
            return step(cfg, state, scan, imu, imu_available, vio)
    else:
        def _step(state, scan, imu, imu_available):
            return step(cfg, state, scan, imu, imu_available)

    return jax.jit(_step)


class HighRateOut(NamedTuple):
    """Per-scan IMU-rate odometry block emitted by the chunked replay
    (reference ~200 Hz state_estimation stream published every 4th sample
    => ~50 Hz, imuPreintegration.cpp:629,648-650).  Width = the scan's
    static IMU window; ``mask`` marks live samples."""

    t: jnp.ndarray  # f32[m] sample times
    q: jnp.ndarray  # f32[m,4]
    p: jnp.ndarray  # f32[m,3]
    v: jnp.ndarray  # f32[m,3]
    mask: jnp.ndarray  # bool[m]


@functools.lru_cache(maxsize=32)
def make_chunked_step_fn(cfg: PipelineConfig, high_rate: bool = False):
    """jit-compiled replay of a CHUNK of scans via lax.scan.

    One device dispatch processes many scans back to back — this amortizes
    host->device transfer and dispatch latency, which dominates single-scan
    stepping on remote-attached accelerators.  Inputs are Scan/ImuWindow
    pytrees with a leading chunk dimension (plus stacked VioWindows when
    ``cfg.use_vio_undistortion``); returns (final state, stacked
    StepOutputs).

    ``high_rate=True`` additionally integrates each scan's IMU window
    forward from the post-update smoothed state INSIDE the scan body and
    stacks the result — the IMU-rate odometry stream and the replay
    throughput then come from the same device program (the reference
    publishes both concurrently, imuPreintegration.cpp:629,648-650).
    Returns (final state, (stacked StepOutputs, stacked HighRateOut))."""

    def _hr(st2, imu):
        poses, vels, mask = propagate_high_rate(st2.smoother, cfg.imu, imu)
        return HighRateOut(t=imu.t, q=poses.q, p=poses.t, v=vels,
                           mask=mask & ~st2.smoother.failed)

    if cfg.use_vio_undistortion:
        def _chunk(state, scans, imus, avails, vios):
            def body(st, inp):
                scan, imu, avail, vio = inp
                st, out = step(cfg, st, scan, imu, avail, vio)
                return st, (out, _hr(st, imu)) if high_rate else out

            return jax.lax.scan(body, state, (scans, imus, avails, vios))
    else:
        def _chunk(state, scans, imus, avails):
            def body(st, inp):
                scan, imu, avail = inp
                st, out = step(cfg, st, scan, imu, avail)
                return st, (out, _hr(st, imu)) if high_rate else out

            return jax.lax.scan(body, state, (scans, imus, avails))

    # NOTE: donating the state is tempting (maps are tens of MB) but state
    # leaves legally alias (pose_prev shares pose's buffer after a rollback),
    # which donation rejects; the per-chunk copy is negligible at chunk>=10.
    return jax.jit(_chunk)
