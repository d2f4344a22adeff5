"""Scan preprocessing frontend: IMU orientation propagation, motion
undistortion, and uniform feature extraction.

TPU-native rebuild of the reference feature-extraction node
(reference src/FeatureExtraction/featureExtraction.cpp): the ROS callbacks
and ring buffers become pure functions over fixed-size masked arrays; the
per-point interpolation loop (removePointDistortion, :222-314) becomes a
vmapped searchsorted + slerp against the IMU window.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from superodom_tpu.geometry import (
    Pose,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_slerp,
    so3_exp,
)
from superodom_tpu.ops.voxel import (
    uniform_stride_mask,
    voxel_downsample_scatter,
)


class Scan(NamedTuple):
    """One LiDAR sweep as fixed-size masked arrays (replaces PCL
    PointcloudXYZITR, reference sensor_data/pointcloud/point_os.h).

    ``ring`` carries the scan-line id; points are expected ring-major /
    time-ordered within a ring (the native order of all three supported
    sensors), which the curvature-based edge extractor relies on."""

    xyz: jnp.ndarray  # f32[N,3] sensor frame
    t_rel: jnp.ndarray  # f32[N] per-point time since scan start [s]
    mask: jnp.ndarray  # bool[N]
    t_start: jnp.ndarray  # f32 scalar, scan start time [s]
    ring: jnp.ndarray  # i32[N] scan line id (zeros when unknown)


class ImuWindow(NamedTuple):
    """IMU samples covering (at least) one scan, fixed capacity
    (replaces MapRingBuffer<Imu>, reference container/MapRingBuffer.h)."""

    t: jnp.ndarray  # f32[M] absolute sample times
    acc: jnp.ndarray  # f32[M,3]
    gyr: jnp.ndarray  # f32[M,3]
    q: jnp.ndarray  # f32[M,4] propagated world orientation q_w_i
    mask: jnp.ndarray  # bool[M]


class VioWindow(NamedTuple):
    """External (e.g. visual-inertial) odometry pose samples covering one
    scan, expressed as T_w_lidar — the 6-DoF undistortion path of the
    reference (removePointDistortion<Odometry> over visualOdomBuf,
    featureExtraction.cpp:236-249,462-468)."""

    t: jnp.ndarray  # f32[K] absolute sample times
    q: jnp.ndarray  # f32[K,4] lidar-frame world orientation
    p: jnp.ndarray  # f32[K,3] lidar-frame world position
    mask: jnp.ndarray  # bool[K]


def propagate_orientation(
    q0: jnp.ndarray,
    gyr0: jnp.ndarray,
    t: jnp.ndarray,
    gyr: jnp.ndarray,
    mask: jnp.ndarray,
    t0,
) -> jnp.ndarray:
    """Integrate gyro rates into per-sample orientations:
    q_i = q_{i-1} * exp(dt * (w_i + w_{i-1}) / 2)
    (reference updateImuOrientation, featureExtraction.cpp:574-583).

    ``q0``/``gyr0``/``t0`` are the previous window's last state so
    integration is continuous across windows.
    """

    def step(carry, inp):
        q_prev, g_prev, t_prev = carry
        t_i, g_i, m_i = inp
        dt = jnp.clip(t_i - t_prev, 0.0, 0.5)
        dq = so3_exp(dt * 0.5 * (g_i + g_prev))
        q_i = quat_normalize(quat_mul(q_prev, dq))
        q_i = jnp.where(m_i, q_i, q_prev)
        new_carry = (
            q_i,
            jnp.where(m_i, g_i, g_prev),
            jnp.where(m_i, t_i, t_prev),
        )
        return new_carry, q_i

    (_, _, _), qs = jax.lax.scan(
        step, (q0, gyr0, jnp.asarray(t0, t.dtype)), (t, gyr, mask)
    )
    return qs


def _interp_pose_at(imu: ImuWindow, pos: jnp.ndarray, times: jnp.ndarray) -> Pose:
    """Slerp-interpolated pose at arbitrary times from the IMU window
    (rotation from gyro integration, translation optional e.g. VIO).

    Mirrors getInterpolatedPoseAtTime (featureExtraction.cpp:255-276): clamps
    to the window ends outside the covered span.
    """
    m = imu.t.shape[0]
    valid_t = jnp.where(imu.mask, imu.t, jnp.inf)
    # index of first sample with t > query (upper_bound).  A comparison
    # matrix beats jnp.searchsorted here: the window is tiny (M<=64) and
    # searchsorted lowers to a vmapped binary-search while-loop (~0.17 ms
    # for 2048 queries on v5e) while [Q,M] compare+reduce fuses to ~nothing.
    after = jnp.sum(
        (valid_t[None, :] <= times[:, None]).astype(jnp.int32), axis=-1
    )
    n_valid = jnp.sum(imu.mask.astype(jnp.int32))
    after = jnp.clip(after, 1, jnp.maximum(n_valid - 1, 1))
    before = after - 1

    t0 = imu.t[before]
    t1 = imu.t[after]
    ratio = jnp.clip((times - t0) / jnp.maximum(t1 - t0, 1e-6), 0.0, 1.0)
    q = quat_slerp(imu.q[before], imu.q[after], ratio)
    p = (1.0 - ratio)[..., None] * pos[before] + ratio[..., None] * pos[after]
    return Pose(q, p)


def undistort_points(
    xyz: jnp.ndarray,
    t_rel: jnp.ndarray,
    mask: jnp.ndarray,
    t_start,
    imu: ImuWindow,
    R_i_l: jnp.ndarray,
    t_i_l: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Motion undistortion: re-express points in the scan-start lidar frame
    using slerp-interpolated IMU orientation (reference
    removePointDistortion<Imu>, featureExtraction.cpp:222-314).

    T_final = T_l_i * (T_w_start^-1 * T_w_point) * T_i_l applied per point.
    Works on any point subset (the pipeline undistorts only the selected
    feature points; the reference undistorts the full cloud because it
    republishes it).

    Returns (undistorted xyz, q_w_original_l, t_w_original_l): the initial
    orientation/position guess shipped to mapping in the reference's
    LaserFeature message.
    """
    t_start = jnp.asarray(t_start, xyz.dtype)
    zeros = jnp.zeros((imu.t.shape[0], 3), dtype=xyz.dtype)
    start_pose = _interp_pose_at(imu, zeros, t_start[None])
    q_w_start = start_pose.q[0]

    pt_times = t_start + t_rel
    pt_pose = _interp_pose_at(imu, zeros, pt_times)

    # T_orig_cur = T_w_start^-1 * T_w_cur (rotation-only for the IMU path)
    q_rel = quat_mul(
        jnp.broadcast_to(
            quat_normalize(q_w_start * jnp.array([1, -1, -1, -1], xyz.dtype)),
            pt_pose.q.shape,
        ),
        pt_pose.q,
    )
    # conjugate by the imu->lidar extrinsic: p' = R_l_i (q_rel (R_i_l p + t_i_l)) + t_l_i
    p_imu = xyz @ R_i_l.T + t_i_l
    p_rot = quat_rotate(q_rel, p_imu)
    p_out = (p_rot - t_i_l) @ R_i_l  # R_l_i = R_i_l^T ; t_l_i = -R_i_l^T t_i_l

    out = jnp.where(mask[:, None], p_out, xyz)

    # initial guess: T_w_original * T_i_l (featureExtraction.cpp:283-289)
    q_w_original_l = quat_normalize(
        quat_mul(q_w_start, _matrix_quat(R_i_l, xyz.dtype))
    )
    t_w_original_l = quat_rotate(q_w_start, t_i_l)
    return out, q_w_original_l, t_w_original_l


def undistort_points_posed(
    xyz: jnp.ndarray,
    t_rel: jnp.ndarray,
    mask: jnp.ndarray,
    t_start,
    path_t: jnp.ndarray,
    path_q: jnp.ndarray,
    path_p: jnp.ndarray,
    path_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Undistortion against a full 6-DoF pose path (rotation AND
    translation), e.g. external visual-inertial odometry — the
    removePointDistortion<Odometry> path of the reference
    (featureExtraction.cpp:236-249,462-468).  The path is given in the lidar
    frame; points are re-expressed in the scan-start lidar frame:
    p' = T_start^-1 * T(t_point) * p.

    Returns (undistorted xyz, q_w_original, t_w_original).
    """
    t_start = jnp.asarray(t_start, xyz.dtype)
    win = ImuWindow(t=path_t, acc=jnp.zeros_like(path_p),
                    gyr=jnp.zeros_like(path_p), q=path_q, mask=path_mask)
    start = _interp_pose_at(win, path_p, t_start[None])
    start_pose = Pose(start.q[0], start.t[0])

    pt_pose = _interp_pose_at(win, path_p, t_start + t_rel)
    rel_q = quat_mul(
        jnp.broadcast_to(
            quat_normalize(start_pose.q * jnp.array([1, -1, -1, -1], xyz.dtype)),
            pt_pose.q.shape,
        ),
        pt_pose.q,
    )
    inv_q = quat_normalize(start_pose.q * jnp.array([1, -1, -1, -1], xyz.dtype))
    rel_t = quat_rotate(inv_q[None, :], pt_pose.t - start_pose.t[None, :])
    out = quat_rotate(rel_q, xyz) + rel_t
    out = jnp.where(mask[:, None], out, xyz)
    return out, start_pose.q, start_pose.t


def undistort_scan(
    scan: Scan,
    imu: ImuWindow,
    R_i_l: jnp.ndarray,
    t_i_l: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-cloud undistortion (see undistort_points)."""
    return undistort_points(
        scan.xyz, scan.t_rel, scan.mask, scan.t_start, imu, R_i_l, t_i_l
    )


def _matrix_quat(R: jnp.ndarray, dtype) -> jnp.ndarray:
    from superodom_tpu.geometry import matrix_to_quat

    return matrix_to_quat(R.astype(dtype))


def uniform_feature_gates(
    xyz: jnp.ndarray,
    prev: jnp.ndarray,
    mask: jnp.ndarray,
    min_range: float,
    max_range: float,
    skip_dup: bool = False,
):
    """Point-quality gates of uniformFeatureExtraction
    (featureExtraction.cpp:504-525) WITHOUT the stride selection: duplicate
    of the preceding raw point, blind-zone, max-range, finite.  ``prev`` is
    each lane's predecessor in the raw cloud; pass ``skip_dup=True`` when
    the duplicate gate already ran on host (runner.make_scan's decimated
    layout) — ``prev`` is then ignored."""
    rng_sq = jnp.sum(xyz * xyz, axis=-1)
    in_range = (rng_sq > min_range**2) & (rng_sq < max_range**2)
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    out = mask & in_range & finite
    if not skip_dup:
        if prev.shape != xyz.shape:
            # a (1,3) placeholder prev would silently broadcast into a wrong
            # duplicate gate; only skip_dup=True may pass a placeholder
            raise ValueError(
                f"prev.shape {prev.shape} != xyz.shape {xyz.shape}; pass "
                "skip_dup=True when the duplicate gate already ran on host"
            )
        dup = jnp.all(jnp.abs(xyz - prev) <= 1e-7, axis=-1)
        out = out & ~dup
    return out


def decimated_width(max_points: int, stride: int) -> int:
    """Lane count of the host-decimated scan layout: the lanes
    uniform_stride_mask selects (indices 1, 1+s, 1+2s, ... < max_points)."""
    return len(range(1, max_points, stride))


def uniform_feature_extraction(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    stride: int,
    min_range: float,
    max_range: float,
):
    """Uniform surface-feature downsampling (reference
    uniformFeatureExtraction, featureExtraction.cpp:504-525): every
    ``stride``-th point, rejecting duplicates of the previous point and
    blind-zone returns.

    The reference's condition mixes || and && with a precedence quirk; the
    intended semantics (non-duplicate AND outside blind radius) is
    implemented here, plus a max-range gate.

    Returns (mask) selecting surface feature points among the input lanes.
    """
    n = xyz.shape[0]
    stride_m = uniform_stride_mask(n, stride)
    prev = jnp.roll(xyz, 1, axis=0)
    return stride_m & uniform_feature_gates(xyz, prev, mask, min_range,
                                            max_range)


def curvature_edge_extraction(
    xyz: jnp.ndarray,
    ring: jnp.ndarray,
    mask: jnp.ndarray,
    half_window: int = 5,
    curvature_threshold: float = 0.2,
    min_range: float = 0.5,
):
    """LOAM-style edge (corner) detection: local curvature along each scan
    line; high-curvature points are edges.

    The slim reference publishes empty edge clouds
    (featureExtraction.cpp:429-436) while its registration core fully
    supports them (ComputeLineDistanceParameters); this extractor completes
    the capability.  c_i = || sum_{|j|<=w, j!=0} (p_{i+j} - p_i) || / (2w |p_i|),
    computed with shifted arrays and same-ring gating (no per-point loops).

    Returns a boolean edge mask over the input lanes.
    """
    n = xyz.shape[0]
    rng_norm = jnp.linalg.norm(xyz, axis=-1)
    acc = jnp.zeros_like(xyz)
    neigh_ok = jnp.ones((n,), bool)
    for off in range(-half_window, half_window + 1):
        if off == 0:
            continue
        nb = jnp.roll(xyz, -off, axis=0)
        nb_ring = jnp.roll(ring, -off, axis=0)
        nb_mask = jnp.roll(mask, -off, axis=0)
        same = (nb_ring == ring) & nb_mask
        acc = acc + jnp.where(same[:, None], nb - xyz, 0.0)
        neigh_ok = neigh_ok & same
    curv = jnp.linalg.norm(acc, axis=-1) / (
        2.0 * half_window * jnp.maximum(rng_norm, 1e-6)
    )
    return mask & neigh_ok & (curv > curvature_threshold) & (rng_norm > min_range)


def range_stratified_mask(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    target: int,
) -> jnp.ndarray:
    """Scatter-free spatial thinning: per-point keep probability ~ r^2
    (equalizing the 1/r^2 area density of a spinning lidar), thresholded
    against a position-keyed hash so the decision is stable per surface
    patch across scans.  Purely elementwise + one reduction — the TPU-cheap
    stand-in for voxel-claim thinning when the scatter cost matters.
    """
    from superodom_tpu.ops.voxel import hash_coords, voxel_coords

    r_sq = jnp.sum(xyz * xyz, axis=-1)
    w = mask.astype(xyz.dtype)
    scale = target / jnp.maximum(jnp.sum(jnp.minimum(r_sq, 1e4) * w), 1.0)
    p = jnp.clip(jnp.minimum(r_sq, 1e4) * scale, 0.0, 1.0)
    # position-keyed uniform in [0,1): fine-voxel hash -> stable per patch
    h = hash_coords(voxel_coords(xyz, 0.1), 1).astype(jnp.uint32)
    u = h.astype(jnp.float32) * (1.0 / 4294967296.0)
    return mask & (u < p)


def thin_and_select(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    res,
    capacity: int,
    compact_width: int,
    *extras: jnp.ndarray,
    mode: str = "voxel",
    table_bits: int = 0,
):
    """Spatially thin masked lanes, then compact to ``capacity`` feature
    lanes (the role of the reference's downSizeFilterSurf,
    laserMapping.cpp:643-645).

    Modes (TPU cost ranking — scatters are ~15 ns per LANE even masked):

    * ``"voxel"``  — scatter-claim one point per ``res`` voxel; wide clouds
      are first top_k-compacted to ``compact_width`` lanes (lossless when
      compact_width >= the stride-selected count).
    * ``"centroid"`` — exact PCL VoxelGrid semantics (per-voxel centroid,
      extras averaged; reference LocalMap.h:562-567) via two full argsorts —
      the parity-exact mode, ~2x the thinning cost of ``"voxel"``.
    * ``"range"``  — scatter-free r^2-stratified hash thinning
      (:func:`range_stratified_mask`): equalizes radial density, relies on
      the even-rate final decimation for the rest.
    * ``"none"``   — even-rate decimation only (near-field biased).
    """
    if mode == "centroid":
        if xyz.shape[0] > compact_width:
            packed = select_features(xyz, mask, compact_width, *extras)
            xyz, mask, extras = packed[0], packed[1], tuple(packed[2:])
        from superodom_tpu.ops.voxel import voxel_downsample_centroid

        out = voxel_downsample_centroid(xyz, mask, res, *extras)
        return select_features(out[0], out[1], capacity, *out[2:])
    if mode == "range":
        keep = range_stratified_mask(xyz, mask, 3 * capacity)
        return select_features(xyz, keep, capacity, *extras)
    if mode == "none":
        return select_features(xyz, mask, capacity, *extras)
    if xyz.shape[0] > compact_width:
        packed = select_features(xyz, mask, compact_width, *extras)
        xyz, mask, extras = packed[0], packed[1], tuple(packed[2:])
    # callers that pre-slice lanes pass the pre-slice width's table_bits so
    # the claim table's collision statistics (hence the survivor set) match
    # the full-width path exactly
    keep = voxel_downsample_scatter(xyz, mask, res, table_bits=table_bits)
    return select_features(xyz, keep, capacity, *extras)


def select_features(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    capacity: int,
    *extras: jnp.ndarray,
):
    """Compact the masked feature points into a fixed-width array of
    ``capacity`` lanes.  When more features exist than fit, applies the
    reference's fractional-stride subsampling (LidarSlam.cpp:346-359):
    points are kept at an even rate rather than truncated.
    """
    n = xyz.shape[0]
    count = jnp.sum(mask.astype(jnp.int32))
    rate = jnp.minimum(
        capacity / jnp.maximum(count.astype(xyz.dtype), 1.0), 1.0
    )
    # rank of each valid lane among valid lanes (0-based)
    rank = (jnp.cumsum(mask.astype(jnp.int32)) - 1).astype(xyz.dtype)
    # keep a valid lane iff its scaled output index advances: standard even
    # decimation, same effect as the reference's fmod stride test
    sel = mask & (jnp.floor(rank * rate) > jnp.floor((rank - 1.0) * rate))

    # compact via top_k (measured faster than wide scatters on TPU): key
    # keeps selected lanes in input order
    lane = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(sel, n - lane, 0)
    _, idx = jax.lax.top_k(keys, capacity)
    out_mask = sel[idx]
    if extras:
        return (xyz[idx], out_mask) + tuple(e[idx] for e in extras)
    return xyz[idx], out_mask
