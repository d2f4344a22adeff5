"""Falsifiable unit tests for the round-4 accuracy mechanisms (VERDICT r4
#6: each knob changes default behavior for every user; each needs a test
that fails if its logic is inverted):

  (a) translation de-skew for IMU-covered sweeps
      (PipelineConfig.use_translation_deskew; reference leaves the smear,
      removePointDistortion<Imu> is rotation-only,
      featureExtraction.cpp:292-313)
  (b) the LIO observability trust gate
      (PipelineConfig.lio_min_observability + the obs_ema recurrence;
      reference trusts on !isDegenerate alone, laserMapping.cpp:384-412)
  (c) Tukey support annealing (RegistrationConfig.tukey_anneal; reference
      keeps a fixed Tukey(sqrt(3*res)) every round, LidarSlam.cpp:263)
  (d) the per-axis match-count hold's round-5 scoping: edge votes, the
      budget-scaled threshold, and the warm-up-only arming
      (RegistrationConfig.axis_hold_min_matches)
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from superodom_tpu.config import (
    ImuConfig,
    MapConfig,
    PipelineConfig,
    RegistrationConfig,
    RuntimeParams,
    SensorProfile,
)
from superodom_tpu import geometry as geo
from superodom_tpu import pipeline as pl
from superodom_tpu import registration as reg
from superodom_tpu.io import scenarios as sc
from superodom_tpu.io.datasets import ate_rmse
from superodom_tpu.runner import OdometryRunner

RT = RuntimeParams(line_res=jnp.float32(0.1), plane_res=jnp.float32(0.2))


def _small_cfg(**kw):
    sensor = SensorProfile(
        name="velodyne", n_scan_lines=16, max_points=4096, min_range=0.2,
        max_range=130.0, filter_point_size=1, max_surface_features=1024,
        max_edge_features=128, scan_period=0.1, default_line_res=0.1,
        default_plane_res=0.2,
    )
    return PipelineConfig(
        sensor=sensor,
        map=MapConfig(table_size=1 << 13, cell_capacity=16),
        registration=RegistrationConfig(max_icp_iters=2, max_gn_iters=2),
        imu=ImuConfig(window_size=4, smoother_gn_iters=2),
        auto_voxel_size=False,
        **kw,
    )


# ---------------------------------------------------------------------------
# (a) translation de-skew
# ---------------------------------------------------------------------------


def test_translation_deskew_fixes_fast_translation_ate(rng):
    """At 6 m/s with rotation-only IMU undistortion the v*T mid-sweep smear
    biases the whole trajectory (the estimator tracks ~the mid-sweep pose,
    along-track error ~v*T/2 = 0.3 m); the smoother-velocity translation
    de-skew removes most of it.  Inverting the de-skew sign (or disabling
    it) fails this test."""
    traj = sc.straight_traj(duration=5.0, speed=6.0, static_sec=1.5)
    world = sc.box_world((25.0, 10.0, 4.0), center=(12.0, 0.0, 0.0))
    ds = sc.make_scenario(rng, traj, world, n_scans=45,
                          points_per_scan=4096)

    ates = {}
    for on in (False, True):
        cfg = _small_cfg(use_translation_deskew=on)
        runner = OdometryRunner(cfg)
        res = runner.run_dataset(ds, use_imu=True)
        assert np.all(np.isfinite(res.poses_t))
        ates[on] = ate_rmse(res.poses_t, np.asarray(ds.gt_poses_t))

    # the smear's bias is real at this speed...
    assert ates[False] > 0.05, ates
    # ...and the de-skew removes most of it
    assert ates[True] < ates[False] * 0.6, ates


# ---------------------------------------------------------------------------
# (b) LIO observability trust gate
# ---------------------------------------------------------------------------

THR = 0.05


def _run_ema(shares_seq, ema0=None):
    ema = jnp.zeros((3,), jnp.float32) if ema0 is None else ema0
    out = []
    for s in shares_seq:
        ema = pl.update_obs_ema(ema, jnp.asarray(s, jnp.float32),
                                jnp.asarray(True))
        out.append(ema)
    return out


def test_obs_gate_trusts_stationary_avenue_shares(rng):
    """A baffled avenue: condition-number degenerate every frame, but all
    three axes keep a real (stationary ~0.3) feature share — the EMA warms
    past the threshold and LIO stays trusted."""
    emas = _run_ema([[0.3, 0.3, 0.3]] * 20)
    trusted = [bool(pl.lio_obs_trusted(jnp.asarray(True), e, THR))
               for e in emas]
    # earns trust within a few frames and keeps it
    assert all(trusted[3:]), trusted


def test_obs_gate_vetoes_corridor_and_single_frame_excursions(rng):
    """A featureless corridor (x share ~0.01) stays vetoed, and a
    single-frame excursion to 0.2 — which PER-FRAME gating would trust
    (0.2 > 0.05; the measured leak corrupted y/z by 1.8 m) — must NOT
    re-arm the EMA-gated veto."""
    shares = [[0.01, 0.3, 0.3]] * 10
    shares[6] = [0.2, 0.3, 0.3]  # one-frame excursion above the threshold
    emas = _run_ema(shares)
    trusted = [bool(pl.lio_obs_trusted(jnp.asarray(True), e, THR))
               for e in emas]
    assert not any(trusted), trusted
    # sanity: the instantaneous share WOULD have leaked at the excursion
    assert shares[6][0] > THR


def test_obs_gate_cold_start_is_vetoed(rng):
    """A cold start inside a degenerate scene must not be trusted: the EMA
    initializes at zero and must EARN trust from measured shares (ADVICE
    r4: a ones-init re-armed LIO for ~15 frames after an
    observable->degenerate transition)."""
    ema0 = pl.init_state(_small_cfg()).obs_ema
    assert not bool(pl.lio_obs_trusted(jnp.asarray(True), ema0, THR))
    # and an observable->degenerate transition drops trust the SAME frame
    # the instantaneous share drops (the dual EMA+instantaneous gate; the
    # EMA alone would have held trust ~11 more frames — the ADVICE r4
    # re-arm window)
    shares = [[0.4, 0.4, 0.4]] * 10 + [[0.01, 0.4, 0.4]] * 10
    emas = _run_ema(shares)
    trusted = [
        bool(pl.lio_obs_trusted(jnp.asarray(True), e, THR,
                                obs_inst=jnp.asarray(s, jnp.float32)))
        for e, s in zip(emas, shares)
    ]
    assert all(trusted[3:10])
    assert not any(trusted[10:]), trusted


def test_obs_gate_disabled_defers_to_degeneracy_flag():
    ema = jnp.zeros((3,), jnp.float32)
    assert bool(pl.lio_obs_trusted(jnp.asarray(False), ema, 0.0))
    assert not bool(pl.lio_obs_trusted(jnp.asarray(True), ema, 0.0))


# ---------------------------------------------------------------------------
# (c) Tukey support annealing
# ---------------------------------------------------------------------------


def test_anneal_schedule_formula():
    """Round-k squared-support multiplier is max(a^k, floor); 1.0 = off
    (the reference's fixed support every round, LidarSlam.cpp:263)."""
    r = RegistrationConfig(tukey_anneal=0.25, tukey_anneal_floor=0.02)
    assert float(reg.anneal_mult(r, 0)) == 1.0
    assert abs(float(reg.anneal_mult(r, 1)) - 0.25) < 1e-7
    assert abs(float(reg.anneal_mult(r, 2)) - 0.0625) < 1e-7
    assert abs(float(reg.anneal_mult(r, 4)) - 0.02) < 1e-7  # floor
    off = RegistrationConfig(tukey_anneal=1.0)
    assert reg.anneal_mult(off, 3) == 1.0


def test_annealed_support_rejects_offset_cluster(rng):
    """A self-consistent 0.35 m-offset cluster (a moving object the wide
    first-round support must accept) pulls the wide-support solve off the
    majority surface; the annealed support rejects it.  Run a single GN
    solve at each support on identical correspondences — the annealed pose
    must land on the majority plane."""
    n_good, n_bad = 200, 56
    # majority: floor plane z=0 observed with a 0.05 z offset to correct
    pts_g = np.stack([rng.uniform(-5, 5, n_good),
                      rng.uniform(-5, 5, n_good),
                      np.full(n_good, -0.05)], axis=-1).astype(np.float32)
    # cluster: same normal, residual offset 0.35 (self-consistent mover)
    pts_b = np.stack([rng.uniform(1, 2, n_bad),
                      rng.uniform(1, 2, n_bad),
                      np.full(n_bad, -0.40)], axis=-1).astype(np.float32)
    pts = np.concatenate([pts_g, pts_b])
    n = n_good + n_bad
    nrm = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    d = np.zeros(n, np.float32)  # plane z = 0
    # x/y walls pin the other axes exactly (residual 0)
    extra = []
    for ax, sign in ((0, 1.0), (0, -1.0), (1, 1.0), (1, -1.0)):
        p = rng.uniform(-5, 5, size=(24, 3)).astype(np.float32)
        p[:, ax] = sign * 5.0
        nv = np.zeros((24, 3), np.float32)
        nv[:, ax] = sign
        extra.append((p, nv, np.full(24, -5.0, np.float32)))
    pts = np.concatenate([pts] + [e[0] for e in extra])
    nrm = np.concatenate([nrm] + [e[1] for e in extra])
    d = np.concatenate([d] + [e[2] for e in extra])
    m = len(pts)
    obs = np.zeros((m, 3), np.int32)
    obs[:, 2] = 8
    planes = reg.PlaneCorrs(
        p_body=jnp.asarray(pts), normal=jnp.asarray(nrm), d=jnp.asarray(d),
        coeff=jnp.ones(m), valid=jnp.ones(m, bool),
        code=jnp.zeros(m, jnp.int32), obs_bins=jnp.asarray(obs))
    edges = reg.EdgeCorrs(
        p_body=jnp.zeros((8, 3)), a=jnp.zeros((8, 3)), b=jnp.ones((8, 3)),
        coeff=jnp.zeros(8), valid=jnp.zeros(8, bool),
        code=jnp.zeros(8, jnp.int32))
    start = geo.Pose(geo.quat_identity(), jnp.zeros(3, jnp.float32))

    wide, _ = reg.gauss_newton_solve(start, planes, edges, RT, 8,
                                     a_mult=1.0)
    tight, _ = reg.gauss_newton_solve(start, planes, edges, RT, 8,
                                      a_mult=0.02)
    # true correction: +0.05 in z.  The cluster pulls the wide solve up.
    err_wide = abs(float(wide.t[2]) - 0.05)
    err_tight = abs(float(tight.t[2]) - 0.05)
    assert err_wide > 0.02, (wide.t, tight.t)
    assert err_tight < err_wide * 0.5, (wide.t, tight.t)


# ---------------------------------------------------------------------------
# (d) axis-hold scoping (round-5 regression fixes)
# ---------------------------------------------------------------------------


def _yz_planes_with_x_leak(rng, n=256):
    """The existing hold test's geometry: y/z planes whose tilted normals
    leak an x gradient; zero x-dominant votes."""
    half = 6.0
    pts_y = np.stack([rng.uniform(-half, half, n // 2),
                      np.full(n // 2, half),
                      rng.uniform(-2, 2, n // 2)], axis=-1)
    pts_z = np.stack([rng.uniform(-half, half, n // 2),
                      rng.uniform(-half, half, n // 2),
                      np.full(n // 2, 2.0)], axis=-1)
    pts = np.concatenate([pts_y, pts_z]).astype(np.float32)
    nrm = np.concatenate([
        np.tile(np.array([[0.15, 0.99, 0.0]], np.float32), (n // 2, 1)),
        np.tile(np.array([[0.15, 0.0, 0.99]], np.float32), (n // 2, 1)),
    ])
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    d = -np.einsum("ij,ij->i", nrm, pts).astype(np.float32)
    obs = np.zeros((n, 3), np.int32)
    obs[:, 2] = np.concatenate([np.full(n // 2, 7), np.full(n // 2, 8)])
    return reg.PlaneCorrs(
        p_body=jnp.asarray(pts), normal=jnp.asarray(nrm), d=jnp.asarray(d),
        coeff=jnp.ones(n), valid=jnp.ones(n, bool),
        code=jnp.zeros(n, jnp.int32), obs_bins=jnp.asarray(obs))


def _no_edges(n=8):
    return reg.EdgeCorrs(
        p_body=jnp.zeros((n, 3)), a=jnp.zeros((n, 3)), b=jnp.ones((n, 3)),
        coeff=jnp.zeros(n), valid=jnp.zeros(n, bool),
        code=jnp.zeros(n, jnp.int32))


START = geo.Pose(geo.quat_identity(),
                 jnp.asarray([0.0, 0.3, -0.2], jnp.float32))


def test_axis_hold_released_by_edge_votes(rng):
    """Edge correspondences constrain the axes perpendicular to their line
    direction and must count as votes (round-4 regression: plane-only
    votes froze edge-dominated solves, xy error 0.18 m in the
    edge-registration test).  Vertical lines here fully constrain x — with
    them present the hold must NOT pin x."""
    planes = _yz_planes_with_x_leak(rng)
    # 16 vertical lines at x=0.25: body points observed at x=0.1 need the
    # pose to move +0.15 in x to land on the lines
    ne = 16
    xy = np.stack([np.full(ne, 0.1), rng.uniform(-4, 4, ne),
                   rng.uniform(-1, 1, ne)], axis=-1).astype(np.float32)
    a = xy + np.array([0.15, 0.0, -3.0], np.float32)
    b = xy + np.array([0.15, 0.0, 3.0], np.float32)
    edges = reg.EdgeCorrs(
        p_body=jnp.asarray(xy), a=jnp.asarray(a), b=jnp.asarray(b),
        coeff=jnp.ones(ne), valid=jnp.ones(ne, bool),
        code=jnp.zeros(ne, jnp.int32))

    solved, _ = reg.gauss_newton_solve(START, planes, edges, RT, 8,
                                       axis_hold_min=10)
    # x released by the edge votes and pulled to the lines
    assert float(solved.t[0]) > 0.05, solved.t
    # plane-only control: x stays pinned
    held, _ = reg.gauss_newton_solve(START, planes, _no_edges(), RT, 8,
                                     axis_hold_min=10)
    assert abs(float(held.t[0])) < 1e-4, held.t


def test_axis_hold_threshold_scales_with_match_budget(rng):
    """At a sparse accepted-match budget the absolute count-10 threshold
    over-holds (round-4 regression: stop_and_go CI ATE 0.15 -> 4.49): a
    genuinely observed axis with a FEW dominant votes must not be pinned.
    30 valid planes, 4 of them x-dominant -> threshold
    min(10, max(1, 0.005*30)) = 1 <= 4 votes -> released."""
    n = 30
    pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    nrm = np.zeros((n, 3), np.float32)
    nrm[:4, 0] = 1.0   # 4 x-walls
    nrm[4:17, 1] = 1.0
    nrm[17:, 2] = 1.0
    d = -np.einsum("ij,ij->i", nrm, pts).astype(np.float32)
    # push x residuals: observed 0.2 before the true x wall
    d[:4] += 0.2
    obs = np.zeros((n, 3), np.int32)
    obs[:4, 2] = 6
    obs[4:17, 2] = 7
    obs[17:, 2] = 8
    planes = reg.PlaneCorrs(
        p_body=jnp.asarray(pts), normal=jnp.asarray(nrm), d=jnp.asarray(d),
        coeff=jnp.ones(n), valid=jnp.ones(n, bool),
        code=jnp.zeros(n, jnp.int32), obs_bins=jnp.asarray(obs))
    solved, _ = reg.gauss_newton_solve(
        geo.Pose.identity(), planes, _no_edges(), RT, 8, axis_hold_min=10)
    # x moves toward the 0.2 correction despite only 4 votes
    assert abs(float(solved.t[0])) > 0.1, solved.t


def test_axis_hold_scoped_to_warmup(rng):
    """hold_enabled=False (a mature map past the warm-up window) disables
    the hold entirely — the round-4 regression was shipping it unscoped
    (far_field CI ATE 0.29 -> 3.94)."""
    planes = _yz_planes_with_x_leak(rng)
    armed, _ = reg.gauss_newton_solve(
        START, planes, _no_edges(), RT, 8, axis_hold_min=10,
        hold_enabled=jnp.asarray(True))
    released, _ = reg.gauss_newton_solve(
        START, planes, _no_edges(), RT, 8, axis_hold_min=10,
        hold_enabled=jnp.asarray(False))
    assert abs(float(armed.t[0])) < 1e-4, armed.t
    assert abs(float(released.t[0])) > 0.05, released.t


def test_pipeline_arms_hold_only_during_warmup():
    """The pipeline's arming predicate: armed during the startup window and
    the post-rollback re-warm, disarmed on a mature map."""
    cfg = _small_cfg()
    st = pl.init_state(cfg)
    armed = (st.startup_count > 0) | (st.frame_count <= cfg.startup_frames)
    assert bool(armed)
    mature = st._replace(startup_count=jnp.asarray(0, jnp.int32),
                         frame_count=jnp.asarray(100, jnp.int32))
    armed = (mature.startup_count > 0) | (
        mature.frame_count <= cfg.startup_frames)
    assert not bool(armed)
    rollback = mature._replace(startup_count=jnp.asarray(5, jnp.int32))
    armed = (rollback.startup_count > 0) | (
        rollback.frame_count <= cfg.startup_frames)
    assert bool(armed)
