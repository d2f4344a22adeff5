"""Scan-to-map registration: correspondence extraction, robust batched
Gauss-Newton, the ICP loop, and degeneracy / alignment-risk outputs.

TPU-native rebuild of the reference's Ceres-based ICP core
(reference src/LidarProcess/LidarSlam.cpp, src/LaserMapping/lidarOptimization.cpp):

* ComputePlaneDistanceParameters / ComputeLineDistanceParameters
  (LidarSlam.cpp:402-572) become vmapped closed-form fits over fixed-K
  neighborhoods from the voxel-hash map, with the same rejection taxonomy
  (MatchingResult codes, LidarSlam.h:85-94).
* The Ceres problem (Tukey robust loss scaled by fit quality, <=4 inner
  iterations of DENSE_QR, LidarSlam.cpp:230-275) becomes a masked reduction
  to a 6x6 normal system solved on-chip, iterated with a fixed-shape loop.
* EstimateRegistrationError / FeatureObservabilityAnalysis / EstimateLidar-
  Uncertainty (LidarSlam.cpp:574-708, 854-986) become eigendecompositions of
  the same matrices with identical outputs.

The pose perturbation is the textbook left-SE(3) update
``pose' = exp([dt, dw]) * pose`` with consistent Jacobians
J = [I | -[w_world]x]; the reference mixes a left-multiplicative Plus with
right-perturbation Jacobians (lidarOptimization.cpp:34 vs :83-99), which
Ceres tolerates but is not worth reproducing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from superodom_tpu.config import MapConfig, RegistrationConfig, RuntimeParams
from superodom_tpu.geometry import (
    Pose,
    apply_se3_update,
    quat_conj,
    quat_mul,
    quat_rotate,
    skew,
)
from superodom_tpu.mapstate import (
    ReducedCandidates,
    VoxelHashMap,
    gather_candidates,
    reduce_candidates,
    select_knn,
    select_knn_reduced,
)
from superodom_tpu.ops.eigh3 import eigh3
from superodom_tpu.ops.smallsolve import inv6_spd, solve6_spd

# MatchingResult codes (reference LidarSlam.h:85-94)
MATCH_SUCCESS = 0
MATCH_NOT_ENOUGH_NEIGHBORS = 1
MATCH_NEIGHBORS_TOO_FAR = 2
MATCH_BAD_PCA_STRUCTURE = 3
MATCH_INVALID_NUMERICAL = 4
MATCH_MSE_TOO_LARGE = 5
MATCH_UNKNOWN = 6
N_REJECTION_CAUSES = 7

# Feature_observability bins (reference LidarSlam.h:96-107)
N_OBS_BINS = 9


class PlaneCorrs(NamedTuple):
    """Point-to-plane correspondences (fixed width = n surf features)."""

    p_body: jnp.ndarray  # f32[M,3] feature point in body frame (Xvalue)
    normal: jnp.ndarray  # f32[M,3] plane unit normal (NormDir)
    d: jnp.ndarray  # f32[M] plane offset (negative_OA_dot_norm)
    coeff: jnp.ndarray  # f32[M] fit-quality weight (residualCoefficient)
    valid: jnp.ndarray  # bool[M]
    code: jnp.ndarray  # i32[M] MatchingResult
    obs_bins: jnp.ndarray  # i32[M,3] observability histogram contributions


class EdgeCorrs(NamedTuple):
    """Point-to-line correspondences."""

    p_body: jnp.ndarray  # f32[M,3]
    a: jnp.ndarray  # f32[M,3] line endpoint A (world)
    b: jnp.ndarray  # f32[M,3] line endpoint B (world)
    coeff: jnp.ndarray  # f32[M]
    valid: jnp.ndarray  # bool[M]
    code: jnp.ndarray  # i32[M]


class PosePrior(NamedTuple):
    """Absolute pose constraint under degeneracy (reference
    SE3AbsolutatePoseFactor.cpp + LidarSlam.cpp:285-298)."""

    pose: Pose
    information: jnp.ndarray  # f32[6] diagonal information
    enabled: jnp.ndarray  # bool scalar


class RegistrationError(NamedTuple):
    """6-DoF alignment risk (reference LidarSlam.h:127-151, LidarSlam.cpp:854-889)."""

    covariance: jnp.ndarray  # f32[6,6] tangent-space covariance [t(3), r(3)]
    position_error: jnp.ndarray  # sqrt of max position eigenvalue
    position_error_dir: jnp.ndarray  # f32[3]
    pos_inverse_condition: jnp.ndarray
    orientation_error_deg: jnp.ndarray
    orientation_error_dir: jnp.ndarray  # f32[3]
    ori_inverse_condition: jnp.ndarray


class IcpStats(NamedTuple):
    """Per-scan optimization statistics (mirrors OptimizationStats.msg)."""

    iter_trans_norm: jnp.ndarray  # f32[max_iters]
    iter_rot_norm: jnp.ndarray  # f32[max_iters]
    iter_surf_num: jnp.ndarray  # i32[max_iters]
    iter_edge_num: jnp.ndarray  # i32[max_iters]
    n_iterations: jnp.ndarray  # i32
    plane_rejection_hist: jnp.ndarray  # i32[7]
    line_rejection_hist: jnp.ndarray  # i32[7]
    obs_histogram: jnp.ndarray  # i32[9]
    uncertainty: jnp.ndarray  # f32[6] x,y,z,roll,pitch,yaw in [0,1]
    error: "RegistrationError"
    degenerate: jnp.ndarray  # bool


# ---------------------------------------------------------------------------
# correspondence extraction
# ---------------------------------------------------------------------------


def _select(cand, cvalid, w_pt, k, reg: RegistrationConfig):
    """KNN selection from gathered candidates.

    This is deliberately the plain XLA path.  A hand-written Pallas kernel
    (fused distance + masked k-min in VMEM) measured 1.7x faster in
    ISOLATION on v5e but ~8% slower inside the pipeline: XLA fuses the
    distance computation into the candidate gather, and the kernel's
    coordinate-major layout forced a real transpose copy.  Random per-query
    row gathers themselves cannot beat XLA from Pallas on TPU — they would
    need one scalar-indexed DMA per row.  (Removed kernel: git history,
    ops/pallas_knn.py.)"""
    return select_knn(cand, cvalid, w_pt, k)


def _weighted_pca(pts: jnp.ndarray, w: jnp.ndarray):
    """Mean + unnormalized scatter-matrix eigendecomposition over masked
    neighbors, matching utils::ComputePCA (superodom_utils.h:143-151) which
    eigendecomposes ``centered^T centered`` without normalization."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)
    mean = jnp.sum(pts * w[..., None], axis=-2) / wsum
    centered = (pts - mean[..., None, :]) * w[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered)
    vals, vecs = eigh3(cov)
    return mean, vals, vecs


def compute_plane_correspondences(
    surf_map: VoxelHashMap,
    map_cfg: MapConfig,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    plane_res,
) -> PlaneCorrs:
    """Vmapped equivalent of ComputePlaneDistanceParameters
    (reference LidarSlam.cpp:514-572) over all surf features at once."""
    cand, cvalid = gather_candidates(surf_map, map_cfg, pose.apply(p_body))
    return plane_correspondences_from_candidates(
        cand, cvalid, reg, pose, p_body, mask, plane_res
    )


def plane_correspondences_from_candidates(
    cand: jnp.ndarray,
    cvalid: jnp.ndarray,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    plane_res,
) -> PlaneCorrs:
    """Plane correspondence fitting against pre-gathered candidate sets.

    Candidate gathering (hash lookups + HBM row gathers) is the hot op; the
    ICP loop gathers once at the predicted pose and re-selects per iteration
    — valid while per-iteration pose corrections stay within the octant
    support margin (cell_size/2 >> typical ICP corrections)."""
    w_pt = pose.apply(p_body)  # pFinal
    neigh, sq, nvalid = _select(cand, cvalid, w_pt, reg.plane_knn, reg)
    return _plane_fit(neigh, sq, nvalid, reg, pose, p_body, mask, plane_res,
                      w_pt)


def plane_correspondences_from_reduced(
    red: ReducedCandidates,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    plane_res,
) -> PlaneCorrs:
    """Plane correspondences selected from a once-materialized top-W
    candidate subset (the ICP refresh rounds; see
    RegistrationConfig.refresh_width)."""
    w_pt = pose.apply(p_body)
    neigh, sq, nvalid = select_knn_reduced(red, w_pt, reg.plane_knn)
    return _plane_fit(neigh, sq, nvalid, reg, pose, p_body, mask, plane_res,
                      w_pt)


def _plane_fit(
    neigh: jnp.ndarray,
    sq: jnp.ndarray,
    nvalid: jnp.ndarray,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    plane_res,
    w_pt: jnp.ndarray,
) -> PlaneCorrs:
    """PCA plane fit + gates over selected KNN neighborhoods (the fitting
    half of ComputePlaneDistanceParameters, LidarSlam.cpp:514-572)."""
    k = reg.plane_knn
    m = p_body.shape[0]
    n_found = jnp.sum(nvalid.astype(jnp.int32), axis=-1)
    enough = n_found >= k
    # reference compares the k-th squared distance against 3*planeRes
    # (LidarSlam.cpp:526,741 — note its units quirk is intentional parity)
    max_sq = 3.0 * plane_res
    near = jnp.where(enough, sq[:, -1] <= max_sq, False)

    wk = nvalid.astype(p_body.dtype)
    mean, evals, evecs = _weighted_pca(neigh, wk)
    pca_ok = (evals[:, 0] >= 1e-6) & (
        evals[:, 1] / jnp.maximum(evals[:, 2], 1e-12) >= 0.1
    )  # LidarSlam.cpp:772

    # plane fit: the reference solves A n = -1 by QR in f64
    # (LidarSlam.cpp:797-816); in f32 the normal-equation route squares the
    # conditioning, so use the total-least-squares plane from the PCA we
    # already have: unit normal = smallest eigenvector, offset d = -n.mean,
    # sign chosen so d > 0 to match the reference's d = 1/|n_raw| > 0.
    normal = evecs[:, :, 0]
    d = -jnp.einsum("mi,mi->m", normal, mean)
    flip_d = d < 0
    normal = jnp.where(flip_d[:, None], -normal, normal)
    d = jnp.abs(d)
    numeric_ok = jnp.all(jnp.isfinite(normal), axis=-1) & jnp.isfinite(d)

    # residual gate: every neighbor within planeRes/2 of the plane
    pt_dist = jnp.abs(jnp.einsum("mki,mi->mk", neigh, normal) + d[:, None])
    mse_ok = jnp.all(jnp.where(nvalid, pt_dist <= plane_res / 2.0, True), axis=-1)
    mean_dist = jnp.sum(jnp.where(nvalid, pt_dist, 0.0), axis=-1) / jnp.maximum(
        n_found.astype(p_body.dtype), 1.0
    )
    coeff = 1.0 - jnp.sqrt(jnp.clip(mean_dist / max_sq, 0.0, 1.0))

    valid = mask & enough & near & pca_ok & numeric_ok & mse_ok

    # rejection code: first failing gate, in the reference's order
    code = jnp.full((m,), MATCH_SUCCESS, dtype=jnp.int32)
    code = jnp.where(~mse_ok, MATCH_MSE_TOO_LARGE, code)
    code = jnp.where(~numeric_ok, MATCH_INVALID_NUMERICAL, code)
    code = jnp.where(~pca_ok, MATCH_BAD_PCA_STRUCTURE, code)
    code = jnp.where(~near, MATCH_NEIGHBORS_TOO_FAR, code)
    code = jnp.where(~enough, MATCH_NOT_ENOUGH_NEIGHBORS, code)
    code = jnp.where(mask, code, MATCH_UNKNOWN)

    obs_bins = _observability_bins(pose, w_pt, evals, evecs)
    return PlaneCorrs(
        p_body=p_body,
        normal=normal,
        d=d,
        coeff=jnp.where(valid, coeff, 0.0),
        valid=valid,
        code=code,
        obs_bins=jnp.where(valid[:, None], obs_bins, -1),
    )


def _observability_bins(pose: Pose, w_pt, evals, evecs):
    """FeatureObservabilityAnalysis (reference LidarSlam.cpp:574-693):
    per-feature contribution bins for the 9-way observability histogram —
    top-2 rotation axes and top-1 translation axis."""
    # eigenvalues ascending; lamada1 >= lamada2 >= lamada3 are their sqrts
    lam1 = jnp.sqrt(jnp.maximum(evals[:, 2], 0.0))
    lam2 = jnp.sqrt(jnp.maximum(evals[:, 1], 0.0))
    lam3 = jnp.sqrt(jnp.maximum(evals[:, 0], 0.0))
    planar2 = (lam2 - lam3) / jnp.maximum(lam1, 1e-12)

    normal = evecs[:, :, 0]  # smallest eigenvector = plane normal
    # orient toward the viewpoint direction (LidarSlam.cpp:554-561)
    flip = jnp.sum(w_pt * normal, axis=-1) < 0
    normal = jnp.where(flip[:, None], -normal, normal)

    axes = quat_rotate(pose.q[None, :], jnp.eye(3, dtype=w_pt.dtype))  # [3,3] rows
    cross = jnp.cross(w_pt, normal)  # [M,3]
    rx = cross @ axes[0]
    ry = cross @ axes[1]
    rz = cross @ axes[2]
    rot_quality = jnp.stack([rx, -rx, ry, -ry, rz, -rz], axis=-1)  # bins 0..5

    p2 = planar2 * planar2
    tx = p2 * jnp.abs(normal @ axes[0])
    ty = p2 * jnp.abs(normal @ axes[1])
    tz = p2 * jnp.abs(normal @ axes[2])
    trans_quality = jnp.stack([tx, ty, tz], axis=-1)  # bins 6..8

    top1 = jnp.argmax(rot_quality, axis=-1)
    masked = rot_quality.at[jnp.arange(rot_quality.shape[0]), top1].set(-jnp.inf)
    top2 = jnp.argmax(masked, axis=-1)
    t_top = jnp.argmax(trans_quality, axis=-1) + 6
    return jnp.stack([top1, top2, t_top], axis=-1).astype(jnp.int32)


def compute_edge_correspondences(
    edge_map: VoxelHashMap,
    map_cfg: MapConfig,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    line_res,
) -> EdgeCorrs:
    """Vmapped equivalent of ComputeLineDistanceParameters + the line-inlier
    selection of nearestKSearchSpecificEdgePoint (reference
    LidarSlam.cpp:402-493, LocalMap.h:377-474)."""
    cand, cvalid = gather_candidates(edge_map, map_cfg, pose.apply(p_body))
    return edge_correspondences_from_candidates(
        cand, cvalid, reg, pose, p_body, mask, line_res
    )


def edge_correspondences_from_candidates(
    cand: jnp.ndarray,
    cvalid: jnp.ndarray,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    line_res,
) -> EdgeCorrs:
    w_pt = pose.apply(p_body)
    neigh, sq, nvalid = _select(cand, cvalid, w_pt, reg.edge_knn, reg)
    return _edge_fit(neigh, sq, nvalid, reg, pose, p_body, mask, line_res,
                     w_pt)


def edge_correspondences_from_reduced(
    red: ReducedCandidates,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    line_res,
) -> EdgeCorrs:
    """Edge correspondences selected from a once-materialized top-W
    candidate subset (ICP refresh rounds)."""
    w_pt = pose.apply(p_body)
    neigh, sq, nvalid = select_knn_reduced(red, w_pt, reg.edge_knn)
    return _edge_fit(neigh, sq, nvalid, reg, pose, p_body, mask, line_res,
                     w_pt)


def _edge_fit(
    neigh: jnp.ndarray,
    sq: jnp.ndarray,
    nvalid: jnp.ndarray,
    reg: RegistrationConfig,
    pose: Pose,
    p_body: jnp.ndarray,
    mask: jnp.ndarray,
    line_res,
    w_pt: jnp.ndarray,
) -> EdgeCorrs:
    """Line-inlier consensus + PCA line fit + gates over selected KNN
    neighborhoods (the fitting half of ComputeLineDistanceParameters +
    nearestKSearchSpecificEdgePoint, LidarSlam.cpp:402-493,
    LocalMap.h:377-474)."""
    k = reg.edge_knn
    m = p_body.shape[0]

    # --- line-inlier consensus: best line through the closest point -------
    p1 = neigh[:, 0, :]  # closest neighbor
    rest = neigh[:, 1:, :]  # [M,k-1,3]
    rest_valid = nvalid[:, 1:]
    dirs = rest - p1[:, None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    # inlier test of candidate c against line through p1 along dirs[j]
    rel = rest[:, None, :, :] - p1[:, None, None, :]  # [M,1,k-1,3]
    cross = jnp.cross(rel, dirs[:, :, None, :])  # [M,k-1(j),k-1(c),3]
    dist_sq = jnp.sum(cross * cross, axis=-1)
    thresh = reg.edge_max_dist_inlier**2
    eye = jnp.eye(k - 1, dtype=bool)[None]
    is_inlier = (dist_sq < thresh) | eye
    is_inlier = is_inlier & rest_valid[:, None, :] & rest_valid[:, :, None]
    inlier_counts = jnp.sum(is_inlier.astype(jnp.int32), axis=-1)  # [M,k-1]
    best_j = jnp.argmax(inlier_counts, axis=-1)
    sel = jnp.take_along_axis(is_inlier, best_j[:, None, None], axis=1)[:, 0, :]
    # selected set = closest point + inliers of the winning line
    sel_full = jnp.concatenate([nvalid[:, :1], sel], axis=-1)  # [M,k]

    n_sel = jnp.sum(sel_full.astype(jnp.int32), axis=-1)
    enough = n_sel >= reg.min_edge_neighbors
    max_sq = 3.0 * line_res
    sel_sq = jnp.where(sel_full, sq, -jnp.inf)
    far_gate = jnp.max(sel_sq, axis=-1) <= max_sq  # farthest selected neighbor

    wk = sel_full.astype(p_body.dtype)
    mean, evals, evecs = _weighted_pca(neigh, wk)
    # line-likeness gate (LidarSlam.cpp:783): lambda_max >= min_neighbors * lambda_mid
    pca_ok = evals[:, 2] >= reg.min_edge_neighbors * evals[:, 1]

    line_dir = evecs[:, :, 2]
    # point-to-line residual gate via projection matrix (LidarSlam.cpp:451-473)
    relm = neigh - mean[:, None, :]
    along = jnp.einsum("mki,mi->mk", relm, line_dir)
    perp_sq = jnp.sum(relm * relm, axis=-1) - along * along
    mse_ok = jnp.all(jnp.where(sel_full, perp_sq <= max_sq, True), axis=-1)
    mean_sq = jnp.sum(jnp.where(sel_full, perp_sq, 0.0), axis=-1) / jnp.maximum(
        n_sel.astype(p_body.dtype), 1.0
    )
    coeff = 1.0 - jnp.sqrt(jnp.clip(mean_sq / max_sq, 0.0, 1.0))

    valid = mask & enough & far_gate & pca_ok & mse_ok

    seg_len = 0.1  # 10 cm virtual segment (LidarSlam.cpp:479)
    a = mean + seg_len * line_dir
    b = mean - seg_len * line_dir

    code = jnp.full((m,), MATCH_SUCCESS, dtype=jnp.int32)
    code = jnp.where(~mse_ok, MATCH_MSE_TOO_LARGE, code)
    code = jnp.where(~pca_ok, MATCH_BAD_PCA_STRUCTURE, code)
    code = jnp.where(~far_gate, MATCH_NEIGHBORS_TOO_FAR, code)
    code = jnp.where(~enough, MATCH_NOT_ENOUGH_NEIGHBORS, code)
    code = jnp.where(mask, code, MATCH_UNKNOWN)

    return EdgeCorrs(
        p_body=p_body,
        a=a,
        b=b,
        coeff=jnp.where(valid, coeff, 0.0),
        valid=valid,
        code=code,
    )


# ---------------------------------------------------------------------------
# robust Gauss-Newton on SE(3)
# ---------------------------------------------------------------------------


def _tukey_weight(sq_res, a_sq):
    """IRLS weight of Ceres TukeyLoss(a): rho'(s) = (1 - s/a^2)^2 for s<=a^2
    else 0 (reference uses TukeyLoss(sqrt(3*res)), LidarSlam.cpp:263,271)."""
    ratio = sq_res / jnp.maximum(a_sq, 1e-12)
    w = jnp.where(ratio < 1.0, (1.0 - ratio) ** 2, 0.0)
    return w


def _accumulate_normal_system(
    pose: Pose,
    planes: PlaneCorrs,
    edges: EdgeCorrs,
    rt: RuntimeParams,
    prior: Optional[PosePrior],
    use_edges: bool = True,
    a_mult=1.0,
):
    """Build H (6x6) and g (6,) from all correspondences at the current pose.

    Residual/Jacobian math mirrors SurfNormAnalyticCostFunction and
    EdgeAnalyticCostFunction (lidarOptimization.cpp:12-80) with consistent
    left-SE(3) perturbation; robust weights mirror Tukey(sqrt(3*res)) x
    ScaledLoss(fitQuality) (LidarSlam.cpp:260-275).  ``a_mult`` scales the
    Tukey squared-residual support (per-round annealing, see
    RegistrationConfig.tukey_anneal).
    """
    dtype = planes.p_body.dtype

    # ---- planes ----------------------------------------------------------
    wp = pose.apply(planes.p_body)  # [Mp,3]
    r_p = jnp.einsum("mi,mi->m", planes.normal, wp) + planes.d  # [Mp]
    J_p = jnp.concatenate([planes.normal, jnp.cross(wp, planes.normal)], axis=-1)
    w_tukey_p = _tukey_weight(r_p * r_p, 3.0 * rt.plane_res * a_mult)
    w_p = planes.valid.astype(dtype) * planes.coeff * w_tukey_p
    H = jnp.einsum("m,mi,mj->ij", w_p, J_p, J_p)
    g = jnp.einsum("m,mi,m->i", w_p, J_p, r_p)
    cost = jnp.sum(w_p * r_p * r_p)

    # ---- edges (statically removed when unused) ---------------------------
    if not use_edges:
        edges = None
    if use_edges:
        we = pose.apply(edges.p_body)  # [Me,3]
        d_ab = edges.a - edges.b
        d_norm = jnp.maximum(jnp.linalg.norm(d_ab, axis=-1, keepdims=True), 1e-9)
        r_e = jnp.cross(we - edges.a, we - edges.b) / d_norm  # [Me,3]
        L = skew(-d_ab / d_norm)  # dr/dw = [b-a]x / |a-b|
        Jw = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(3, dtype=dtype), L.shape),
                -skew(we),
            ],
            axis=-1,
        )  # [Me,3,6] : dw/d[dt,dw]
        J_e = jnp.einsum("mij,mjk->mik", L, Jw)  # [Me,3,6]
        sq_e = jnp.sum(r_e * r_e, axis=-1)
        w_tukey_e = _tukey_weight(sq_e, 3.0 * rt.line_res * a_mult)
        w_e = edges.valid.astype(dtype) * edges.coeff * w_tukey_e
        H = H + jnp.einsum("m,mri,mrj->ij", w_e, J_e, J_e)
        g = g + jnp.einsum("m,mri,mr->i", w_e, J_e, r_e)
        cost = cost + jnp.sum(w_e * sq_e)

    # ---- absolute pose prior (degeneracy aid) ----------------------------
    if prior is not None:
        r_t = pose.t - prior.pose.t
        dq = quat_mul(quat_conj(prior.pose.q), pose.q)
        r_r = 2.0 * dq[1:4]
        r6 = jnp.concatenate([r_t, r_r])
        lam = prior.information * prior.enabled.astype(dtype)
        H = H + jnp.diag(lam)
        g = g + lam * r6

    return H, g, cost


def gauss_newton_solve(
    pose: Pose,
    planes: PlaneCorrs,
    edges: EdgeCorrs,
    rt: RuntimeParams,
    n_iters: int,
    prior: Optional[PosePrior] = None,
    damping: float = 1e-4,
    use_edges: bool = True,
    a_mult=1.0,
    axis_hold_min: int = 0,
    axis_hold_frac: float = 0.005,
    hold_enabled=None,
):
    """Fixed-count damped Gauss-Newton on SE(3) with IRLS robust weights —
    the stand-in for ceres::Solve (DENSE_QR, max 4 iterations,
    LidarSlam.cpp:230-240).  Returns (pose, converged_in_one).

    ``axis_hold_min`` > 0 enables the per-axis MATCH-COUNT hold: a body
    translation axis whose dominant-normal correspondence count (the
    observability histogram's own votes, _observability_bins) falls below
    the threshold has the GN translation update along it zeroed, so the
    pose HOLDS the prediction there instead of sliding on tilted fits.
    Measured necessity: against a warming-up map with ZERO x-normal
    correspondences the first accepted GN solve walked 0.43 m along x AT
    REST and the map engraved the offset for the whole run
    (aggressive_6dof at 16k density, ATE 0.45).  This is deliberately NOT
    Zhang eigenvalue remapping — that was tried and rejected (see the
    NOTE at RegistrationConfig.pos_degeneracy_threshold: the conditioning
    metric cannot separate a truly unobservable corridor from an
    elongated-but-observable room).  A literal absence of supporting
    correspondences is a discrete, data-driven criterion immune to both
    failure modes; with an external absolute-pose prior enabled the hold
    is released (the prior legitimately moves held axes)."""

    hold = None
    if axis_hold_min > 0:
        dtype0 = pose.t.dtype
        votes = planes.obs_bins[:, 2] - 6  # top translation axis per corr
        cnt = jnp.sum(
            (votes[:, None] == jnp.arange(3, dtype=votes.dtype)[None, :])
            & planes.valid[:, None],
            axis=0,
        ).astype(dtype0)
        n_valid = jnp.sum(planes.valid).astype(dtype0)
        if use_edges:
            # Edge votes (round-4 regression fix, VERDICT r4 #2: plane-only
            # votes froze edge-dominated solves — the hold zeroed axes that
            # edges fully constrain).  A point-to-line correspondence
            # constrains translation in the plane PERPENDICULAR to its line
            # direction, so each valid edge votes for every body axis at
            # more than 45 deg to the line (sin^2 > 0.5; a vertical pole
            # votes x and y, never z).  Axes are the same rotated body axes
            # the plane votes use (_observability_bins).
            dvec = edges.a - edges.b
            dvec = dvec / jnp.maximum(
                jnp.linalg.norm(dvec, axis=-1, keepdims=True), 1e-12)
            baxes = quat_rotate(pose.q[None, :], jnp.eye(3, dtype=dtype0))
            sin2 = 1.0 - (dvec @ baxes.T) ** 2  # [M,3]
            cnt = cnt + jnp.sum(
                (sin2 > 0.5) & edges.valid[:, None], axis=0
            ).astype(dtype0)
            n_valid = n_valid + jnp.sum(edges.valid).astype(dtype0)
        # The threshold scales DOWN with the accepted-match budget: the
        # absolute count was tuned at 16k-point full density and over-holds
        # at CI density (VERDICT r4 #2: stop_and_go ATE 0.15 -> 4.49 at
        # 4096 pts).  min(axis_hold_min, max(1, frac * accepted)) keeps the
        # full-density behavior, shrinks with sparse scans, and preserves
        # the zero-vote warm-up criterion the hold exists for.
        thresh = jnp.minimum(
            jnp.asarray(float(axis_hold_min), dtype0),
            jnp.maximum(1.0, axis_hold_frac * n_valid),
        )
        hold = cnt < thresh  # bool[3] — body axes
        if hold_enabled is not None:
            # The hold is scoped to the warm-up window (and post-rollback
            # re-warming) where its pathology was measured: the first
            # accepted frames of a YOUNG map self-confirm tilted fits
            # (0.43 m x-walk at rest with exactly zero x-votes).  A mature
            # map's sparse votes are real signal — holding them froze the
            # travel axis in sparse far-field scenes (round-4 regression:
            # far_field CI ATE 0.29 -> 3.94 with an unscoped hold).
            hold = hold & hold_enabled
        if prior is not None:
            hold = hold & ~prior.enabled

    # NOTE: a while_loop with an early-exit condition was measured ~13%
    # SLOWER end-to-end here — nesting it inside the outer ICP while_loop
    # defeats XLA's loop pipelining.  The fixed-length scan wins.
    def body(carry, _):
        p, first_step_small = carry
        H, g, _ = _accumulate_normal_system(p, planes, edges, rt, prior,
                                            use_edges, a_mult)
        Hd = H + damping * jnp.eye(6, dtype=g.dtype) * (1.0 + jnp.diag(H))
        # unrolled 6x6 Cholesky fuses into the GN chain (a cho_factor custom
        # call per iteration serializes 12-16 tiny ops per scan)
        delta = -solve6_spd(Hd, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        if hold is not None:
            # remove the translation component along held BODY axes (the
            # delta lives in the world frame; bins measure constraint
            # along rotated body axes)
            axes = quat_rotate(p.q[None, :], jnp.eye(3, dtype=delta.dtype))
            dt = delta[:3] - axes.T @ (
                hold.astype(delta.dtype) * (axes @ delta[:3])
            )
            delta = jnp.concatenate([dt, delta[3:]])
        p_new = apply_se3_update(p, delta)
        step_small = jnp.linalg.norm(delta) < 1e-6
        return (p_new, first_step_small), step_small

    # static unroll (n_iters <= 4): lets XLA fuse the residual/H assembly
    # chains across iterations instead of carrying them through a loop
    carry = (pose, jnp.array(False))
    first_small = None
    for _ in range(n_iters):
        carry, step_small = body(carry, None)
        if first_small is None:
            first_small = step_small
    pose_out, _ = carry
    return pose_out, first_small


# ---------------------------------------------------------------------------
# degeneracy / uncertainty outputs
# ---------------------------------------------------------------------------


def estimate_registration_error(H: jnp.ndarray) -> RegistrationError:
    """Tangent-space covariance analysis (reference LidarSlam.cpp:854-889):
    cov = H^-1, then eigenanalysis of the position and orientation blocks."""
    dtype = H.dtype
    Hd = H + 1e-6 * jnp.eye(6, dtype=dtype)
    cov = inv6_spd(Hd)
    evals_p, evecs_p = eigh3(cov[:3, :3])
    evals_r, evecs_r = eigh3(cov[3:, 3:])
    sqrt = lambda x: jnp.sqrt(jnp.maximum(x, 0.0))
    return RegistrationError(
        covariance=cov,
        position_error=sqrt(evals_p[2]),
        position_error_dir=evecs_p[:, 2],
        pos_inverse_condition=sqrt(evals_p[0]) / jnp.maximum(sqrt(evals_p[2]), 1e-12),
        orientation_error_deg=jnp.rad2deg(sqrt(evals_r[2])),
        orientation_error_dir=evecs_r[:, 2],
        ori_inverse_condition=sqrt(evals_r[0]) / jnp.maximum(sqrt(evals_r[2]), 1e-12),
    )


def lidar_uncertainty_from_histogram(hist: jnp.ndarray) -> jnp.ndarray:
    """EstimateLidarUncertainty (reference LidarSlam.cpp:915-986): map the
    9-bin observability histogram to 6 normalized per-axis observability
    scores (x, y, z, roll, pitch, yaw).  Convention (reference's, kept for
    parity despite the name): the value is the axis's share of constraining
    features x3, capped at 1 — so 1 = well observed, LOW = degenerate."""
    h = hist.astype(jnp.float32)
    trans_total = h[6] + h[7] + h[8]
    rot_total = h[0] + h[1] + h[2] + h[3] + h[4] + h[5]
    safe_t = jnp.maximum(trans_total, 1.0)
    safe_r = jnp.maximum(rot_total, 1.0)
    u = jnp.stack(
        [
            jnp.minimum(h[6] / safe_t * 3.0, 1.0),
            jnp.minimum(h[7] / safe_t * 3.0, 1.0),
            jnp.minimum(h[8] / safe_t * 3.0, 1.0),
            jnp.minimum((h[0] + h[1]) / safe_r * 3.0, 1.0),
            jnp.minimum((h[2] + h[3]) / safe_r * 3.0, 1.0),
            jnp.minimum((h[4] + h[5]) / safe_r * 3.0, 1.0),
        ]
    )
    return jnp.where((trans_total == 0) | (rot_total == 0), 0.0, u)


def _histogram(codes: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    # compare+reduce instead of a scatter-add: at <=9 bins the [N, n_bins]
    # equality table reduces in one VPU pass, while the scatter costs one
    # serialized update per lane (~0.05 ms per histogram on v5e).  Negative
    # codes mean "no contribution" and match no bin.
    eq = codes[:, None] == jnp.arange(n_bins, dtype=codes.dtype)[None, :]
    return jnp.sum(eq.astype(jnp.int32), axis=0)


# ---------------------------------------------------------------------------
# the ICP loop
# ---------------------------------------------------------------------------


def anneal_mult(reg: RegistrationConfig, it, dtype=jnp.float32):
    """Tukey support multiplier for outer round ``it`` (0-based count of
    completed live rounds): ``max(tukey_anneal**it, tukey_anneal_floor)``
    applied to the SQUARED support 3*res.  1.0 (anneal off) keeps the
    reference's verbatim Tukey(sqrt(3*res)) scale every round
    (LidarSlam.cpp:263); < 1.0 shrinks the support geometrically once the
    pose has converged toward the true alignment, rejecting
    self-consistent moving geometry that the wide first-round capture
    support must accept (see RegistrationConfig.tukey_anneal;
    PARITY.md row 26)."""
    if reg.tukey_anneal >= 1.0:
        return 1.0
    return jnp.maximum(
        jnp.asarray(reg.tukey_anneal, dtype) ** jnp.asarray(it).astype(dtype),
        jnp.asarray(reg.tukey_anneal_floor, dtype),
    )


def icp_register(
    edge_map: VoxelHashMap,
    surf_map: VoxelHashMap,
    map_cfg: MapConfig,
    reg: RegistrationConfig,
    pose0: Pose,
    edge_pts: jnp.ndarray,
    edge_mask: jnp.ndarray,
    surf_pts: jnp.ndarray,
    surf_mask: jnp.ndarray,
    rt: RuntimeParams,
    prior: Optional[PosePrior] = None,
    use_edges: bool = True,
    hold_enabled=None,
) -> Tuple[Pose, IcpStats]:
    """Scan-to-map ICP (reference performLocalizationAndMapping,
    LidarSlam.cpp:107-152): fixed outer iterations of correspondence
    extraction + robust GN, with a convergence mask freezing finished
    instances (static shapes keep this vmappable over robot instances).

    Candidate point sets are gathered from the hash map ONCE at the
    predicted pose and re-selected each iteration — the gather (hash
    lookups + HBM row gathers) dominates the reference-style per-iteration
    re-search, and the octant support margin (cell_size/2, ~1 m) far
    exceeds per-iteration ICP corrections.  ``use_edges=False`` statically
    removes the edge path (the slim reference ships empty edge clouds)."""
    max_it = reg.max_icp_iters
    if max_it < 1:
        # with 0 iterations the placeholder (all-invalid) correspondences
        # would reach the final H/stats and yield a degenerate normal system
        raise ValueError("max_icp_iters must be >= 1")
    dtype = surf_pts.dtype

    surf_cand, surf_cvalid = gather_candidates(
        surf_map, map_cfg, pose0.apply(surf_pts)
    )
    if use_edges:
        edge_cand, edge_cvalid = gather_candidates(
            edge_map, map_cfg, pose0.apply(edge_pts)
        )

    def _anneal(it):
        return anneal_mult(reg, it, dtype)

    def _dummy_lines():
        ne = edge_pts.shape[0]
        return EdgeCorrs(
            p_body=edge_pts,
            a=jnp.zeros((ne, 3), dtype),
            b=jnp.ones((ne, 3), dtype),
            coeff=jnp.zeros((ne,), dtype),
            valid=jnp.zeros((ne,), bool),
            code=jnp.full((ne,), MATCH_UNKNOWN, jnp.int32),
        )

    def correspondences(pose):
        planes = plane_correspondences_from_candidates(
            surf_cand, surf_cvalid, reg, pose, surf_pts, surf_mask, rt.plane_res
        )
        if use_edges:
            lines = edge_correspondences_from_candidates(
                edge_cand, edge_cvalid, reg, pose, edge_pts, edge_mask,
                rt.line_res,
            )
        else:
            lines = _dummy_lines()
        return planes, lines

    def make_outer(corr_fn):
        def outer(carry):
            return _icp_round(corr_fn, carry)

        return outer

    def _icp_round(corr_fn, carry):
        # extract-at-body-start: one extraction per iteration, and the LAST
        # extraction (carried out) is what the final H / stats evaluate on —
        # matching the reference, whose covariance comes from the final Ceres
        # problem, i.e. correspondences fixed at the last iteration's start
        # and evaluated at the solved pose (LidarSlam.cpp:230-240, 854-889)
        pose, converged, it, _prev, stats_arr = carry
        t_norms, r_norms, surf_ns, edge_ns = stats_arr
        planes, lines = corr_fn(pose)
        new_pose, one_step = gauss_newton_solve(
            pose, planes, lines, rt, reg.max_gn_iters, prior,
            use_edges=use_edges, a_mult=_anneal(it),
            axis_hold_min=reg.axis_hold_min_matches,
            axis_hold_frac=reg.axis_hold_frac,
            hold_enabled=hold_enabled,
        )
        # freeze once converged (mirrors the num_successful_steps==1 break);
        # needed for batched (vmapped) execution where the while loop keeps
        # running until every instance converges
        new_pose = jax.tree_util.tree_map(
            lambda n, o: jnp.where(converged, o, n), new_pose, pose
        )
        rel_t = jnp.linalg.norm(new_pose.t - pose.t)
        dq = quat_mul(quat_conj(pose.q), new_pose.q)
        rel_r = 2.0 * jnp.arctan2(jnp.linalg.norm(dq[1:4]), jnp.abs(dq[0]))
        live = jnp.logical_not(converged)
        idx = jnp.minimum(it, max_it - 1)
        stats_arr = (
            t_norms.at[idx].set(jnp.where(live, rel_t, t_norms[idx])),
            r_norms.at[idx].set(jnp.where(live, rel_r, r_norms[idx])),
            surf_ns.at[idx].set(
                jnp.where(live, jnp.sum(planes.valid.astype(jnp.int32)),
                          surf_ns[idx])
            ),
            edge_ns.at[idx].set(
                jnp.where(live, jnp.sum(lines.valid.astype(jnp.int32)),
                          edge_ns[idx])
            ),
        )
        now_converged = converged | one_step | (
            (rel_t < reg.trans_converge_tol) & (rel_r < reg.rot_converge_tol)
        )
        return (new_pose, now_converged, it + live.astype(jnp.int32),
                (planes, lines), stats_arr)

    def cond(carry):
        _pose, converged, it, _corrs, _stats = carry
        return jnp.logical_not(converged) & (it < max_it)

    # placeholder correspondences: the body always runs at least once
    # (converged starts False), so these never reach the final H
    ms = surf_pts.shape[0]
    ne0 = edge_pts.shape[0]
    init_planes = PlaneCorrs(
        p_body=surf_pts, normal=jnp.zeros((ms, 3), dtype),
        d=jnp.zeros((ms,), dtype), coeff=jnp.zeros((ms,), dtype),
        valid=jnp.zeros((ms,), bool),
        code=jnp.full((ms,), MATCH_UNKNOWN, jnp.int32),
        obs_bins=jnp.full((ms, 3), -1, jnp.int32),
    )
    init_lines = EdgeCorrs(
        p_body=edge_pts, a=jnp.zeros((ne0, 3), dtype),
        b=jnp.ones((ne0, 3), dtype), coeff=jnp.zeros((ne0,), dtype),
        valid=jnp.zeros((ne0,), bool),
        code=jnp.full((ne0,), MATCH_UNKNOWN, jnp.int32),
    )
    stats0 = (
        jnp.zeros((max_it,), dtype),
        jnp.zeros((max_it,), dtype),
        jnp.zeros((max_it,), jnp.int32),
        jnp.zeros((max_it,), jnp.int32),
    )
    carry0 = (
        pose0, jnp.array(False), jnp.zeros((), jnp.int32),
        (init_planes, init_lines), stats0,
    )

    # ROUND 1 is peeled out of the loop and always runs the FULL-width
    # extraction (the body runs at least once: converged starts False).
    # Peeling drops the lax.while wrapper's loop-carried layout constraints
    # for the single-iteration tuned configs, and gives the refresh path a
    # once-corrected anchor pose for its candidate reduction.
    carry1 = _icp_round(correspondences, carry0)
    if max_it == 1:
        pose, _, n_it, (planes, lines), (t_norms, r_norms, surf_ns, edge_ns) = (
            carry1
        )
    else:
        if reg.refresh_width > 0:
            # Cheaper refresh for rounds 2..max_it (the reference re-searches
            # the octree every outer iteration, LidarSlam.cpp:119-148; here
            # the per-round re-select is the dominant repeated cost): the
            # top-W candidates at the ONCE-CORRECTED round-1 pose are
            # materialized once, and later rounds select their K neighbors
            # from those W lanes at ~W/(8*C) of the full re-select cost.
            # After one GN round the residual pose error is typically
            # millimetric, so the W-lane window covers the later top-K; the
            # battery (tools/stress_matrix.py) qualifies the approximation.
            pose1 = carry1[0]
            conv1 = carry1[1]
            ew = max(reg.refresh_width, 2 * reg.edge_knn)

            def _zeros_red(q, w):
                return ReducedCandidates(
                    x=jnp.zeros((q, w), dtype), y=jnp.zeros((q, w), dtype),
                    z=jnp.zeros((q, w), dtype),
                    valid=jnp.zeros((q, w), bool),
                )

            def _compute_reds(_):
                rs = reduce_candidates(
                    surf_cand, surf_cvalid, pose1.apply(surf_pts),
                    reg.refresh_width,
                )
                re_ = (reduce_candidates(
                    edge_cand, edge_cvalid, pose1.apply(edge_pts), ew)
                    if use_edges else _zeros_red(1, 1))
                return rs, re_

            def _skip_reds(_):
                return (_zeros_red(surf_pts.shape[0], reg.refresh_width),
                        _zeros_red(edge_pts.shape[0], ew)
                        if use_edges else _zeros_red(1, 1))

            if reg.icp_early_exit:
                # frames converged after the peeled round never enter the
                # while_loop, so their reduction is dead work (ADVICE r4):
                # skip the top-W + one-hot MXU pass on those frames
                red_surf, red_edge = jax.lax.cond(
                    conv1, _skip_reds, _compute_reds, operand=None)
            else:
                red_surf, red_edge = _compute_reds(None)

            def corr_refresh(pose):
                planes = plane_correspondences_from_reduced(
                    red_surf, reg, pose, surf_pts, surf_mask, rt.plane_res
                )
                lines = (
                    edge_correspondences_from_reduced(
                        red_edge, reg, pose, edge_pts, edge_mask, rt.line_res
                    )
                    if use_edges
                    else _dummy_lines()
                )
                return planes, lines

            outer = make_outer(corr_refresh)
        else:
            outer = make_outer(correspondences)
        if reg.icp_early_exit:
            # early-exit ICP: the reference breaks when Ceres converges in
            # one step (LidarSlam.cpp:141-147); a while_loop realizes the
            # same saving instead of masked full-length iteration
            carry = jax.lax.while_loop(cond, outer, carry1)
        else:
            # fixed-length scan: every instance runs max_it iterations with
            # the convergence mask freezing finished ones (better XLA
            # pipelining; exact same masked-update semantics)
            carry, _ = jax.lax.scan(
                lambda c, _: (outer(c), None), carry1, None, length=max_it - 1
            )
        pose, _, n_it, (planes, lines), (t_norms, r_norms, surf_ns, edge_ns) = carry
    active = jnp.arange(max_it) < n_it
    # one H evaluation at the final pose (the reference computes covariance
    # once, from the final problem, LidarSlam.cpp:141-147), at the LAST
    # executed round's annealed Tukey support
    H, _, _ = _accumulate_normal_system(
        pose, planes, lines, rt, prior, use_edges,
        _anneal(jnp.maximum(n_it - 1, 0)),
    )

    # alignment risk must measure the LIDAR data alone: remove the absolute-
    # pose prior's (diagonal) information before the covariance analysis,
    # otherwise aiding masks the degeneracy it is meant to compensate and the
    # flag oscillates frame to frame.
    H_data = H
    if prior is not None:
        H_data = H - jnp.diag(
            prior.information * prior.enabled.astype(H.dtype)
        )
    err = estimate_registration_error(H_data)
    obs_flat = jnp.where(
        planes.valid[:, None], planes.obs_bins, -jnp.ones_like(planes.obs_bins)
    ).reshape(-1)
    obs_hist = _histogram(obs_flat, N_OBS_BINS)
    stats = IcpStats(
        iter_trans_norm=t_norms,
        iter_rot_norm=r_norms,
        iter_surf_num=surf_ns,
        iter_edge_num=edge_ns,
        n_iterations=jnp.sum(active.astype(jnp.int32)),
        plane_rejection_hist=_histogram(planes.code, N_REJECTION_CAUSES),
        line_rejection_hist=_histogram(lines.code, N_REJECTION_CAUSES),
        obs_histogram=obs_hist,
        uncertainty=lidar_uncertainty_from_histogram(obs_hist),
        error=err,
        # 6-DoF alignment risk: EITHER block degenerate flags the frame
        # (reference EstimateRegistrationError covers both blocks,
        # LidarSlam.cpp:854-889 / LidarSlam.h:127-151)
        degenerate=(err.pos_inverse_condition < reg.pos_degeneracy_threshold)
        | (err.ori_inverse_condition < reg.ori_degeneracy_threshold),
    )
    return pose.normalize(), stats
