"""Typed configuration tree for superodom_tpu.

The reference spreads configuration over ROS YAML files, OpenCV-YAML
calibration files and launch arguments (reference: super_odometry/config/*.yaml,
src/parameter/parameter.cpp:118-341).  Here the whole system is configured by
one frozen (hence jit-static, hashable) dataclass tree plus a small dynamic
pytree of runtime-tunable scalars (resolutions adapt per scene scale, see
reference laserMapping.cpp:600-651 adjustVoxelSize).

Shapes (max point counts, feature caps, map capacities, iteration counts) are
static fields: under ``jax.jit`` they select the compiled program.  Scalars
that the reference tunes at runtime (line/plane resolution) live in
``RuntimeParams`` and are traced values.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import numpy as np


class RuntimeParams(NamedTuple):
    """Dynamic (traced) per-step parameters.

    The reference adapts voxel resolutions to scene scale at runtime
    (laserMapping.cpp:600-651): near scenes use 0.1/0.2 m line/plane
    resolution, far scenes 0.4/0.8 m.  These are data-dependent scalars, so
    they are part of the traced inputs rather than the static config.
    """

    line_res: np.ndarray | float  # edge feature voxel resolution [m]
    plane_res: np.ndarray | float  # planar feature voxel resolution [m]


@dataclasses.dataclass(frozen=True)
class SensorProfile:
    """Per-sensor static parameters.

    Mirrors the per-sensor YAML profiles (config/vlp_16.yaml,
    config/os1_128.yaml, config/livox_mid360.yaml) plus the fixed-size array
    bounds the TPU design needs.
    """

    name: str
    n_scan_lines: int  # scan_line in reference configs
    max_points: int  # static input cloud capacity (points per scan)
    min_range: float  # blind-zone radius [m] (config *.yaml min_range)
    max_range: float  # maximum usable range [m]
    filter_point_size: int  # uniform downsample stride (featureExtraction.cpp:504)
    max_surface_features: int  # cap on planar features per scan (config *.yaml)
    max_edge_features: int  # cap on edge features per scan
    scan_period: float  # nominal seconds per sweep
    default_line_res: float  # mapping_line_resolution
    default_plane_res: float  # mapping_plane_resolution
    # lanes the feature stream is compacted to before voxel thinning (TPU
    # scatter cost ~ lane count; top_k compaction is ~5x cheaper per lane)
    compact_width: int = 32768
    skip_frame: int = 1  # process every k-th scan (featureExtraction.cpp:713)
    # scan-stack spatial thinning: "voxel" (scatter-claim, one point per
    # voxel), "centroid" (exact PCL VoxelGrid per-voxel centroids — parity
    # mode, two argsorts), "range" (scatter-free r^2-stratified hash),
    # "none" (even decimation)
    scan_thin_mode: str = "voxel"


# Sensor presets mirroring reference config/*.yaml
VLP_16 = SensorProfile(
    name="velodyne",
    n_scan_lines=16,
    max_points=32768,
    min_range=0.2,
    max_range=130.0,
    filter_point_size=3,
    max_surface_features=2048,
    max_edge_features=512,
    scan_period=0.1,
    default_line_res=0.1,
    default_plane_res=0.2,
)

OS1_128 = SensorProfile(
    name="ouster",
    n_scan_lines=128,
    max_points=131072,
    min_range=0.2,
    max_range=130.0,
    filter_point_size=3,
    max_surface_features=2048,
    max_edge_features=512,
    scan_period=0.1,
    default_line_res=0.1,
    default_plane_res=0.2,
    # >= max_points/filter_point_size: compaction stays LOSSLESS (pure lane
    # narrowing; decimating here measurably hurt transient tracking)
    compact_width=49152,
)

LIVOX_MID360 = SensorProfile(
    name="livox",
    n_scan_lines=4,
    max_points=24576,
    min_range=0.2,
    max_range=70.0,
    filter_point_size=3,
    max_surface_features=4096,
    max_edge_features=512,
    scan_period=0.1,
    default_line_res=0.1,
    default_plane_res=0.1,
)


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Voxel-hash local map parameters.

    TPU-native replacement for the reference 21x21x11 grid of 50 m blocks
    with per-block octrees (LocalMap.h:131-138).  Cells are small (~1 m) so a
    27-cell neighborhood gather bounds every KNN query; capacity-bounded
    open-addressing keeps all shapes static.
    """

    cell_size: float = 2.0  # hash cell edge [m]; KNN support = cell_size/2
    table_size: int = 1 << 16  # total slots (power of two, = buckets*bucket_size)
    # slots per hash bucket (one row gather per lookup).  128 makes a bucket
    # row exactly one (8,128) tile row — a B=8 row pads 16x on TPU — and
    # lowers bucket-overflow variance at equal load factor.
    bucket_size: int = 128
    cell_capacity: int = 32  # stored points per cell (A/B on v5e: 32 is ~12% faster than 64 at identical ATE)
    # max point WRITES per insert call (update width drives TPU scatter cost;
    # steady-state survivors are few — see mapstate.insert)
    insert_width: int = 1024
    # insert every k-th frame (consecutive 10 Hz scans overlap ~95%; the
    # scatter into the big point table is the costliest op in the step)
    insert_cadence: int = 1
    # full-table eviction pass every k-th frame.  Default 1 (every frame):
    # the pass is one [slots]-wide masked write (~16 us for the default
    # table on v5e), while gating it behind a lax.cond costs a full-table
    # buffer copy on every SKIPPED frame (the identity branch re-materializes
    # the carried map) plus a layout flip at the join — 3x the work it saves.
    evict_cadence: int = 1
    evict_radius: float = 250.0  # drop cells farther than this from the pose
    # The reference keeps 21x21x11 blocks x 50 m => ~500 m extent
    # (LocalMap.h:131-138); 250 m radius matches its usable neighborhood and
    # stays far inside the packed-coordinate wrap period (1024 cells).


@dataclasses.dataclass(frozen=True)
class RegistrationConfig:
    """Scan-to-map ICP parameters (reference LidarSlam.h:273-281 + configs)."""

    max_icp_iters: int = 4  # LocalizationICPMaxIter (config max_iterations)
    max_gn_iters: int = 4  # inner solver iterations (Ceres max_num_iterations=4)
    plane_knn: int = 5  # LocalizationPlaneDistanceNbrNeighbors
    edge_knn: int = 10  # LocalizationLineDistanceNbrNeighbors
    min_edge_neighbors: int = 4  # LocalizationMinmumLineNeighborRejection
    edge_max_dist_inlier: float = 0.2  # LocalizationLineMaxDistInlier
    min_map_surf_features: int = 50  # hasEnoughFeatures gate (LidarSlam.cpp:380)
    # minimum ACCEPTED correspondences for the solved pose to replace the
    # prediction.  The reference's gate counts map points (above); with this
    # design's capacity-bounded map a young/sparse map can pass the census
    # yet yield a handful of matches, and an under-constrained GN solve then
    # jumps meters on a static platform.  Holding the prediction until the
    # match count is meaningful is the same skip-optimization semantics
    # applied to the quantity that actually conditions the solve.
    min_plane_matches: int = 50
    velocity_failure_threshold: float = 30.0  # m/s motion gate
    yaw_ratio: float = 0.0  # manual yaw correction deg per meter (calibration yaml)
    trans_converge_tol: float = 1e-3  # declares ICP converged (m)
    rot_converge_tol: float = 1e-3  # declares ICP converged (rad)
    icp_early_exit: bool = True  # while_loop break vs fixed masked scan
    # ICP candidate-refresh width (0 = off).  When W > 0, ICP round 1 runs
    # the full-width KNN re-select over all gathered candidates (8 *
    # cell_capacity lanes per feature) as usual, then the top-W candidates
    # at the once-corrected round-1 pose are materialized ONCE and rounds
    # 2..max_icp_iters re-select their K neighbors from those W lanes —
    # ~W/(8*C) of the per-round selection cost.  Sound while the pose moves
    # less between rounds than the W-th candidate radius margin (after one
    # GN round corrections are typically sub-centimeter); the stress
    # battery qualifies the approximation (see PARITY.md).
    refresh_width: int = 0
    # Per-round Tukey support annealing (1.0 = off, the reference's fixed
    # Tukey(sqrt(3*res)) scale every round, LidarSlam.cpp:263).  With
    # anneal a < 1, outer round k (0-based) weights residuals with squared
    # support 3*res * max(a^k, tukey_anneal_floor): round 1 keeps the wide
    # reference support (capture range for a poor prediction), later
    # rounds shrink toward the floor so only near-surface residuals vote.
    # Motivation (measured, full-density battery): the fixed wide support
    # leaves a 0.2 m moving-cluster residual at ~0.87 weight, and a
    # 5-round ICP then locks onto the self-consistent moving geometry —
    # outliers_clusters ATE 1.10 at 5 iters vs 0.05 at 2, ship OR parity,
    # independent of every other knob.  Annealing is the standard
    # adaptive-threshold ICP remedy; floor 0.02 keeps ~3 sigma of scan
    # noise inside the support at nominal resolutions.
    tukey_anneal: float = 1.0
    tukey_anneal_floor: float = 0.02
    # Degenerate-environment handling (SuperLoc alignment risk): EITHER
    # block's inverse condition number under its threshold flags the frame
    # (reference EstimateRegistrationError covers both blocks,
    # LidarSlam.cpp:854-889).  The orientation threshold is higher: fitted
    # chord planes on curved surfaces carry a systematic tangential normal
    # tilt (~neighborhood/2R) that floors the rotation block's smallest
    # eigenvalue, so a rotation-unobservable scene reads ~0.05-0.13 rather
    # than ~0 (well-conditioned rooms read 0.6+ on both blocks).
    pos_degeneracy_threshold: float = 0.1
    ori_degeneracy_threshold: float = 0.15
    # NOTE — Zhang-style solution remapping (zeroing GN step components
    # along under-threshold eigendirections, "On Degeneracy of
    # Optimization-based State Estimation") was implemented and REJECTED
    # after stress-battery qualification; the reference likewise never
    # remaps — its degenerate flag only arms the VIO absolute-pose prior
    # (LidarSlam.cpp:281-298), which this pipeline reproduces.  Measured
    # reasons: (a) the inverse-condition metric is floored by
    # noise-manufactured information, not observability — a truly
    # x-unobservable 80 m corridor reads 0.11-0.17 (above the 0.1
    # threshold, so remapping never pins the axis that actually walks
    # ~1 m) while an elongated-but-observable room reads ~0.06 (so
    # remapping freezes an axis that carries real signal); (b) gating the
    # hold on low ESTIMATED motion is self-confirming — once an axis
    # freezes, estimated motion stays under any gate and the estimate
    # diverges at platform speed (0.19 m/frame, outliers_clusters case).
    #
    # What IS shipped instead (round 4): the per-axis MATCH-COUNT hold
    # below — a body translation axis with fewer than
    # ``axis_hold_min_matches`` dominant-normal correspondences (the
    # observability histogram's own votes) has its GN update zeroed for
    # the round.  Unlike the conditioning metric, a literal absence of
    # supporting correspondences separates cleanly: the warming-up map
    # that walked 0.43 m along x AT REST had EXACTLY ZERO x-votes for its
    # first 5 accepted frames (aggressive_6dof at 16k density) while
    # every observable-room case keeps hundreds; and the hold is
    # data-driven, not estimated-motion-driven, so it cannot
    # self-confirm.  Released when the VIO absolute-pose prior is active
    # (the prior legitimately moves weakly-observed axes).  The pipeline
    # arms the hold ONLY during the warm-up window (startup frames + the
    # 5-frame re-warm after a velocity-gate rollback) — the scope where
    # the pathology was measured.  Round-4 shipped it unscoped and it
    # became a regression: a mature map's sparse votes are real signal,
    # and holding them froze edge-dominated solves (edge registration xy
    # error 0.18 m) and the travel axis of sparse far-field scenes
    # (far_field CI ATE 0.29 -> 3.94).  0 disables entirely.
    axis_hold_min_matches: int = 10
    # The hold threshold is min(axis_hold_min_matches, max(1,
    # axis_hold_frac * accepted_matches)): the absolute count was tuned at
    # 16k full density and over-held at CI density (round-4 regression:
    # stop_and_go ATE 0.15 -> 4.49 at 4096 pts), so it scales down with
    # the accepted plane+edge match budget.  Edge correspondences vote for
    # the body axes perpendicular to their line direction (round-4
    # regression: plane-only votes froze edge-dominated solves).
    axis_hold_frac: float = 0.005
    visual_confidence_factor: float = 1.0

    def __post_init__(self):
        # with 0 outer iterations the placeholder (all-invalid)
        # correspondences would reach the final normal system (ADVICE r2)
        if self.max_icp_iters < 1:
            raise ValueError(
                f"max_icp_iters must be >= 1, got {self.max_icp_iters}")
        if self.refresh_width != 0 and self.refresh_width < self.plane_knn:
            raise ValueError(
                f"refresh_width ({self.refresh_width}) must be 0 or >= "
                f"plane_knn ({self.plane_knn})")


@dataclasses.dataclass(frozen=True)
class ImuConfig:
    """Inertial fusion parameters (reference config *.yaml imu_preintegration_node)."""

    acc_noise: float = 3.9939570888238808e-03  # acc_n
    gyr_noise: float = 1.5636343949698187e-03  # gyr_n
    acc_bias_noise: float = 6.4356659353532566e-05  # acc_w
    gyr_bias_noise: float = 3.5640318696367613e-05  # gyr_w
    gravity: float = 9.80511  # g_norm
    lidar_correction_noise: float = 0.01
    imu_rate: float = 200.0
    max_imu_per_scan: int = 64  # static window: samples between two scans
    window_size: int = 6  # sliding smoother window (states); the
    # sigma=0.01 per-key pose priors make states beyond ~6 keys inert, and
    # the dense jacfwd solve scales with (15*W)^2
    smoother_gn_iters: int = 3
    # Initial-prior sigmas on the first window state (the role of GTSAM's
    # priorVelNoise/priorBiasNoise, imuPreintegration.cpp:162-177); pose is
    # free (the lidar measures it).  Once the window fills, states falling
    # off the lag are marginalized into a carried Gaussian prior, so bias
    # information ACCUMULATES exactly as in the reference's ISAM2 graph —
    # these only set the starting point.
    init_vel_sigma: float = 2.0  # m/s
    init_acc_bias_sigma: float = 0.5  # m/s^2
    init_gyr_bias_sigma: float = 0.1  # rad/s
    # geometric decay of the carried marginal prior per key: bounds the
    # weight of stale-linearization info (see _marginalize_oldest) and
    # tracks slowly drifting biases; 1.0 = exact marginalization
    prior_forgetting: float = 0.95
    # failure gates (imuPreintegration.cpp:398-417)
    max_velocity: float = 30.0
    max_acc_bias: float = 2.0
    max_gyr_bias: float = 1.0
    # NOTE: the reference's graph reset at key>100 (imuPreintegration.cpp:372)
    # has no knob here — the fixed-lag window IS the reset horizon (states
    # fall off the window after `window_size` keys; see PARITY.md row 6).
    init_window_sec: float = 1.0  # IMU static init duration (imu_data.h:71-160)
    # IMU-rate odometry publication: every k-th ~200 Hz integration step
    # (~50 Hz, reference imuPreintegration.cpp:629,648-650)
    high_rate_decimation: int = 4


@dataclasses.dataclass(frozen=True)
class Extrinsics:
    """IMU<->LiDAR calibration (reference config/*/..._calibration.yaml).

    Stored as tuples so the dataclass stays hashable / jit-static.
    ``R_imu_laser`` rotates laser-frame vectors into the IMU frame,
    ``t_imu_laser`` is the laser origin in the IMU frame.  When loaded via
    :func:`load_calibration` the RPY rotation offset from the calibration
    file is already composed into ``R_imu_laser`` (the reference applies it
    at load time too, parameter.cpp:198-214).
    """

    R_imu_laser: Tuple[Tuple[float, ...], ...] = (
        (1.0, 0.0, 0.0),
        (0.0, 1.0, 0.0),
        (0.0, 0.0, 1.0),
    )
    t_imu_laser: Tuple[float, ...] = (0.0, 0.0, 0.0)

    def R(self) -> np.ndarray:
        return np.asarray(self.R_imu_laser, dtype=np.float32)

    def t(self) -> np.ndarray:
        return np.asarray(self.t_imu_laser, dtype=np.float32)

    @staticmethod
    def from_arrays(R: np.ndarray, t: np.ndarray) -> "Extrinsics":
        return Extrinsics(
            R_imu_laser=tuple(tuple(float(v) for v in row) for row in R),
            t_imu_laser=tuple(float(v) for v in np.asarray(t).reshape(3)),
        )


@dataclasses.dataclass(frozen=True)
class LocalizationConfig:
    """Dual-mode operation: SLAM mapping vs localization against a prior map
    (reference laserMapping.cpp:129-177, 281-315)."""

    enabled: bool = False
    update_map: bool = False  # whether to keep inserting scans in localization mode
    init_pose_xyz: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    init_pose_rpy: Tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Root configuration."""

    sensor: SensorProfile = VLP_16
    map: MapConfig = MapConfig()
    registration: RegistrationConfig = RegistrationConfig()
    imu: ImuConfig = ImuConfig()
    extrinsics: Extrinsics = Extrinsics()
    localization: LocalizationConfig = LocalizationConfig()
    auto_voxel_size: bool = True
    use_imu_roll_pitch: bool = False
    startup_frames: int = 10  # IMU-orientation-only startup (laserMapping.cpp:317)
    # Curvature edge features: the slim reference ships empty edge clouds
    # (featureExtraction.cpp:429-436) but registers them fully; enabling this
    # completes the edge+planar capability (LOAM lineage).
    use_edge_features: bool = False
    edge_curvature_threshold: float = 0.2
    # LIO prediction source: propagate the smoother state through the
    # preintegrated previous interval as the ICP initial guess (latent in
    # the slim reference — statuses hardwired false, laserMapping.cpp:680;
    # realized here because it predicts through acceleration transients)
    enable_lio_prediction: bool = False
    # Minimum per-axis translation observability share above which the LIO
    # prediction stays trusted even when the degenerate flag is set
    # (0.0 = never trust under degeneracy, the reference's
    # determinePredictionSource order, laserMapping.cpp:384-402).  The
    # share is the carried `uncertainty[:3]` (observability fractions,
    # LOW = poorly observed, see lidar_uncertainty_from_histogram).
    # Measured full-density separation (round 4): the 1100 m baffled
    # avenue flags degenerate by condition number yet keeps a real x
    # feature share — position-holding prediction there outruns the
    # correspondence gates at 10 m/s and stalls the estimator permanently
    # (ATE 613 m vs 0.8 m with LIO kept); the featureless corridor's x
    # share reads ~0, and keeping LIO there lets smoother-velocity
    # feedback corrupt even the observable axes (y/z ATE 1.02 m vs 0.05 m
    # with the veto).  The observability gate separates the two regimes:
    # measured per-frame x shares are 0.059+ (p10) on the avenue vs
    # 0.007-0.038 (p10-p50) in the corridor's degenerate phase — 0.05
    # splits them, and corridor frames that DO exceed it are the
    # transition where x is genuinely becoming observable.
    lio_min_observability: float = 0.05
    # 6-DoF VIO-path undistortion: when an external odometry path covers the
    # sweep, undistort features against the interpolated pose path (rotation
    # AND translation) instead of rotation-only IMU — the reference's
    # removePointDistortion<Odometry> branch (featureExtraction.cpp:236-249,
    # 462-468).  Static flag: compiles the posed-undistortion path in; at
    # runtime each scan falls back to the IMU path when no VIO coverage.
    use_vio_undistortion: bool = False
    # VioWindow capacity (pose samples per scan window) when enabled
    max_vio_per_scan: int = 16
    # Constant-velocity motion compensation for scans with NO IMU coverage
    # (dropout windows, no-IMU deployments): extrapolate the previous
    # inter-scan twist across the sweep and de-skew against it (KISS-ICP
    # style).  BEYOND the reference, which ships raw distorted points
    # without IMU (featureExtraction.cpp:483-496).  Measured on the no-IMU
    # distorted circle (test_pipeline): ATE 0.048 with vs 0.111 without.
    # Guarded by motion-sanity bounds and inactive until the startup
    # window has passed (the pre-init inter-frame twist is garbage) or
    # whenever IMU/VIO covers the sweep.  Set False when feeding clouds a
    # driver already de-skewed — double compensation adds error.
    use_cv_undistortion: bool = True
    # Translation de-skew for IMU-COVERED sweeps: the IMU path removes
    # rotation only — as does the reference (removePointDistortion<Imu>,
    # featureExtraction.cpp:292-313) — which leaves the v * scan_period
    # translation smear in the scan (~0.4 m at 4 m/s).  The smear makes
    # ICP track the MID-sweep pose (measured: whole-trajectory along-track
    # error saturates at exactly v*T/2), and a deeply-converged ICP
    # engraves it into the young map: at full density, aggressive_6dof
    # ATE 0.42 and closed_loop return-to-origin 0.22 m at 5 ICP iters
    # without this, vs the reference benchmark's 10 cm gate.  Rotation
    # comes from the IMU slerp; translation from the SMOOTHER's velocity
    # in its own body frame (frame-consistent, IMU-filtered).  The
    # previous-pose-difference twist is deliberately NOT used: it feeds
    # the last solve's error back into the next scan's de-skew — a
    # 2-cycle positive feedback that measurably grows an alternating
    # oscillation near rest (closed_loop endpoint error 0.38 m).
    use_translation_deskew: bool = True

    def default_runtime(self) -> RuntimeParams:
        return RuntimeParams(
            line_res=np.float32(self.sensor.default_line_res),
            plane_res=np.float32(self.sensor.default_plane_res),
        )


def profile_by_name(name: str) -> SensorProfile:
    table = {
        "velodyne": VLP_16,
        "vlp_16": VLP_16,
        "ouster": OS1_128,
        "os1_128": OS1_128,
        "livox": LIVOX_MID360,
        "livox_mid360": LIVOX_MID360,
    }
    return table[name.lower()]


def _rpy_deg_to_matrix(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """RPY (degrees) -> rotation matrix, Rz(yaw) @ Ry(pitch) @ Rx(roll)
    (tf2 setRPY convention used by the reference's offset composition)."""
    r, p, y = np.deg2rad([roll, pitch, yaw])
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), \
        np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _load_opencv_yaml(path: str) -> dict:
    """Parse an OpenCV FileStorage YAML (the reference's calibration format):
    strips the '%YAML:1.0' directive and resolves '!!opencv-matrix' nodes to
    numpy arrays."""
    import yaml

    with open(path) as f:
        text = f.read()
    lines = text.splitlines()
    if lines and lines[0].lstrip().startswith("%YAML"):
        lines = lines[1:]
        if lines and lines[0].strip() == "---":
            lines = lines[1:]
    text = "\n".join(lines)

    class _CvLoader(yaml.SafeLoader):
        pass

    def _mat(loader, node):
        d = loader.construct_mapping(node, deep=True)
        return np.asarray(d["data"], dtype=np.float64).reshape(
            int(d["rows"]), int(d["cols"])
        )

    _CvLoader.add_constructor("tag:yaml.org,2002:opencv-matrix", _mat)
    _CvLoader.add_constructor("!opencv-matrix", _mat)
    return yaml.load(text, Loader=_CvLoader) or {}


def load_calibration(
    path: str, provide_imu_laser_extrinsic: bool = True
) -> Tuple[Extrinsics, float]:
    """Load a reference-style calibration YAML into (Extrinsics, yaw_ratio).

    Mirrors readCalibration (reference parameter.cpp:118-280):

    * direct path: ``extrinsicRotation_imu_laser`` / ``Translation`` with the
      ``imu_laser_rotation_offset`` RPY (degrees) composed on the LEFT of the
      rotation (parameter.cpp:198-214);
    * camera path (``provide_imu_laser_extrinsic=False``): T_imu_laser =
      T_imu_camera o T_camera_laser (parameter.cpp:237-260);
    * ``yaw_ratio`` (degrees of yaw per meter traveled, parameter.cpp:150).
    """
    raw = _load_opencv_yaml(path)
    yaw_ratio = float(raw.get("yaw_ratio", 0.0) or 0.0)
    if provide_imu_laser_extrinsic:
        R = np.asarray(raw["extrinsicRotation_imu_laser"], np.float64)
        t = np.asarray(raw["extrinsicTranslation_imu_laser"],
                       np.float64).reshape(3)
        off = raw.get("imu_laser_rotation_offset")
        if off is not None:
            off = np.asarray(off, np.float64).reshape(-1)
            R = _rpy_deg_to_matrix(off[0], off[1], off[2]) @ R
    else:
        R_cl = np.asarray(raw["extrinsicRotation_camera_laser"], np.float64)
        t_cl = np.asarray(raw["extrinsicTranslation_camera_laser"],
                          np.float64).reshape(3)
        R_ic = np.asarray(raw["extrinsicRotation_imu_camera"], np.float64)
        t_ic = np.asarray(raw["extrinsicTranslation_imu_camera"],
                          np.float64).reshape(3)
        # renormalize the camera rotation through a quaternion as the
        # reference does (parameter.cpp:252-254)
        u, _, vt = np.linalg.svd(R_ic)
        R_ic = u @ vt
        R = R_ic @ R_cl
        t = R_ic @ t_cl + t_ic
    return Extrinsics.from_arrays(R, t), yaw_ratio


def load_yaml_config(path: str) -> PipelineConfig:
    """Load a reference-style YAML profile into a PipelineConfig.

    Accepts the reference's config schema (config/vlp_16.yaml layout) so users
    of the reference can bring their configs directly.
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    params = raw.get("/**", raw).get("ros__parameters", raw)
    sensor = profile_by_name(params.get("sensor", "velodyne"))
    fe = params.get("feature_extraction_node", {})
    lm = params.get("laser_mapping_node", {})
    imu = params.get("imu_preintegration_node", {})

    sensor = dataclasses.replace(
        sensor,
        n_scan_lines=int(fe.get("scan_line", sensor.n_scan_lines)),
        min_range=float(fe.get("min_range", sensor.min_range)),
        filter_point_size=int(fe.get("filter_point_size", sensor.filter_point_size)),
        max_surface_features=int(
            lm.get("max_surface_features", sensor.max_surface_features)
        ),
        default_line_res=float(
            lm.get("mapping_line_resolution", sensor.default_line_res)
        ),
        default_plane_res=float(
            lm.get("mapping_plane_resolution", sensor.default_plane_res)
        ),
    )
    # calibration file: reference launch files pass it as a node parameter
    # (launch/vlp_16.launch.py); accept a path relative to the config file
    extr = Extrinsics()
    yaw_ratio = 0.0
    calib = params.get("calibration_file") or raw.get("calibration_file")
    if calib:
        import os

        if not os.path.isabs(calib):
            calib = os.path.join(os.path.dirname(os.path.abspath(path)), calib)
        extr, yaw_ratio = load_calibration(
            calib,
            provide_imu_laser_extrinsic=bool(
                params.get("provide_imu_laser_extrinsic", True)
            ),
        )
    reg = RegistrationConfig(
        max_icp_iters=int(lm.get("max_iterations", 4)),
        velocity_failure_threshold=float(lm.get("velocity_failure_threshold", 30.0)),
        yaw_ratio=yaw_ratio,
    )
    imu_cfg = ImuConfig(
        acc_noise=float(imu.get("acc_n", ImuConfig.acc_noise)),
        gyr_noise=float(imu.get("gyr_n", ImuConfig.gyr_noise)),
        acc_bias_noise=float(imu.get("acc_w", ImuConfig.acc_bias_noise)),
        gyr_bias_noise=float(imu.get("gyr_w", ImuConfig.gyr_bias_noise)),
        gravity=float(imu.get("g_norm", ImuConfig.gravity)),
        lidar_correction_noise=float(imu.get("lidar_correction_noise", 0.01)),
    )
    loc = LocalizationConfig(
        enabled=bool(lm.get("localization_mode", False)),
        init_pose_xyz=(
            float(lm.get("init_x", 0.0)),
            float(lm.get("init_y", 0.0)),
            float(lm.get("init_z", 0.0)),
        ),
        init_pose_rpy=(
            float(lm.get("init_roll", 0.0)),
            float(lm.get("init_pitch", 0.0)),
            float(lm.get("init_yaw", 0.0)),
        ),
    )
    return PipelineConfig(
        sensor=sensor, registration=reg, imu=imu_cfg, localization=loc,
        extrinsics=extr,
        use_imu_roll_pitch=bool(
            lm.get("use_imu_roll_pitch",
                   fe.get("use_imu_roll_pitch", False))
        ),
    )
