import numpy as np
import jax.numpy as jnp

from superodom_tpu.config import MapConfig, RegistrationConfig, RuntimeParams
from superodom_tpu import mapstate as ms
from superodom_tpu import geometry as geo
from superodom_tpu import registration as reg


MAP_CFG = MapConfig(cell_size=1.0, table_size=1 << 13, cell_capacity=32)
REG_CFG = RegistrationConfig()
RT = RuntimeParams(line_res=jnp.float32(0.1), plane_res=jnp.float32(0.2))


def make_room_cloud(rng, n_per_wall=800, half=8.0, noise=0.005):
    """Points on the walls/floor/ceiling of a box room: six planes with
    distinct normals — fully constrains all 6 DoF."""
    clouds = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            uv = rng.uniform(-half, half, size=(n_per_wall, 2)).astype(np.float32)
            pts = np.zeros((n_per_wall, 3), dtype=np.float32)
            other = [a for a in range(3) if a != axis]
            pts[:, other[0]] = uv[:, 0]
            pts[:, other[1]] = uv[:, 1]
            pts[:, axis] = sign * half
            clouds.append(pts)
    cloud = np.concatenate(clouds)
    cloud += rng.normal(scale=noise, size=cloud.shape).astype(np.float32)
    return cloud


def build_surf_map(rng, world_pts):
    m = ms.empty_map(MAP_CFG)
    # insert in two passes for density (thinning keeps spacing ~ plane_res/2)
    for chunk in np.array_split(world_pts, 2):
        # bulk load: lift the per-frame streaming write cap
        m = ms.insert(m, MAP_CFG, jnp.asarray(chunk),
                      jnp.ones(len(chunk), bool), 0.05,
                      max_writes=len(chunk))
    return m


def test_plane_correspondences_on_synthetic_room(rng):
    world = make_room_cloud(rng, n_per_wall=2500)
    m = build_surf_map(rng, world)
    # scan points = subset of wall points viewed from identity pose
    scan = world[rng.choice(len(world), 256, replace=False)]
    pose = geo.Pose.identity()
    corrs = reg.compute_plane_correspondences(
        m, MAP_CFG, REG_CFG, pose, jnp.asarray(scan),
        jnp.ones(len(scan), bool), RT.plane_res)
    valid = np.asarray(corrs.valid)
    assert valid.mean() > 0.6
    # residuals of valid correspondences must be tiny at the true pose
    r = np.einsum("mi,mi->m", np.asarray(corrs.normal), scan) + np.asarray(corrs.d)
    assert np.abs(r[valid]).max() < 0.06
    # normals must match wall axes (corner points near two walls may pass
    # the gates with blended normals; require the overwhelming majority)
    n = np.abs(np.asarray(corrs.normal)[valid])
    assert (n.max(axis=1) > 0.95).mean() > 0.95


def test_plane_rejection_codes(rng):
    world = make_room_cloud(rng)
    m = build_surf_map(rng, world)
    # query far from any wall -> NOT_ENOUGH_NEIGHBORS
    scan = np.zeros((4, 3), np.float32)
    corrs = reg.compute_plane_correspondences(
        m, MAP_CFG, REG_CFG, geo.Pose.identity(), jnp.asarray(scan),
        jnp.ones(4, bool), RT.plane_res)
    assert not bool(np.asarray(corrs.valid).any())
    assert np.all(np.asarray(corrs.code) == reg.MATCH_NOT_ENOUGH_NEIGHBORS)
    # masked-out points report UNKNOWN
    corrs2 = reg.compute_plane_correspondences(
        m, MAP_CFG, REG_CFG, geo.Pose.identity(), jnp.asarray(scan),
        jnp.zeros(4, bool), RT.plane_res)
    assert np.all(np.asarray(corrs2.code) == reg.MATCH_UNKNOWN)


def _empty_edges(n=8):
    z = jnp.zeros((n, 3), jnp.float32)
    return z, jnp.zeros((n,), bool)


def test_icp_recovers_known_offset(rng):
    world = make_room_cloud(rng, n_per_wall=1500)
    m = build_surf_map(rng, world)
    edge_m = ms.empty_map(MAP_CFG)

    # true pose: modest rotation + translation; scan = walls seen from there
    true_pose = geo.Pose(
        geo.quat_from_rpy(jnp.float32(0.02), jnp.float32(-0.03), jnp.float32(0.08)),
        jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
    )
    scan_world = world[rng.choice(len(world), 1200, replace=False)]
    scan_body = np.asarray(true_pose.inverse().apply(jnp.asarray(scan_world)))

    # start from identity (0.3+ m / ~5 deg away)
    e_pts, e_mask = _empty_edges()
    est, stats = reg.icp_register(
        edge_m, m, MAP_CFG, REG_CFG, geo.Pose.identity(),
        e_pts, e_mask, jnp.asarray(scan_body), jnp.ones(len(scan_body), bool), RT)

    t_err = np.linalg.norm(np.asarray(est.t) - np.asarray(true_pose.t))
    dq = geo.quat_mul(geo.quat_conj(true_pose.q), est.q)
    r_err = 2 * np.arctan2(np.linalg.norm(np.asarray(dq)[1:]), abs(float(dq[0])))
    assert t_err < 0.02, f"translation error {t_err}"
    assert r_err < 0.01, f"rotation error {r_err}"
    assert int(stats.iter_surf_num[0]) > 300
    assert not bool(stats.degenerate)


def test_reduced_select_matches_full(rng):
    """select_knn from a reduce_candidates(top-W) subset must equal the
    full-width selection at the same query pose whenever W >= k (top-k of
    top-W == top-k of all)."""
    world = make_room_cloud(rng, n_per_wall=1500)
    m = build_surf_map(rng, world)
    q = jnp.asarray(world[rng.choice(len(world), 128, replace=False)])
    cand, cvalid = ms.gather_candidates(m, MAP_CFG, q)
    pts_f, sq_f, val_f = ms.select_knn(cand, cvalid, q, 5)
    red = ms.reduce_candidates(cand, cvalid, q, 16)
    pts_r, sq_r, val_r = ms.select_knn_reduced(red, q, 5)
    np.testing.assert_allclose(np.asarray(sq_r), np.asarray(sq_f), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(val_r), np.asarray(val_f))
    # same neighbor SETS (order can differ on exact ties): compare sorted
    f = np.sort(np.asarray(pts_f).reshape(128, -1), axis=1)
    r = np.sort(np.asarray(pts_r).reshape(128, -1), axis=1)
    np.testing.assert_allclose(r, f, atol=1e-5)


def test_icp_refresh_recovers_known_offset(rng):
    """ICP with refresh rounds (refresh_width > 0) must recover the same
    known offset as the full re-select path."""
    world = make_room_cloud(rng, n_per_wall=1500)
    m = build_surf_map(rng, world)
    edge_m = ms.empty_map(MAP_CFG)
    true_pose = geo.Pose(
        geo.quat_from_rpy(jnp.float32(0.02), jnp.float32(-0.03), jnp.float32(0.08)),
        jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
    )
    scan_world = world[rng.choice(len(world), 1200, replace=False)]
    scan_body = np.asarray(true_pose.inverse().apply(jnp.asarray(scan_world)))
    e_pts, e_mask = _empty_edges()
    cfg = RegistrationConfig(max_icp_iters=5, refresh_width=16)
    est, stats = reg.icp_register(
        edge_m, m, MAP_CFG, cfg, geo.Pose.identity(),
        e_pts, e_mask, jnp.asarray(scan_body), jnp.ones(len(scan_body), bool),
        RT)
    t_err = np.linalg.norm(np.asarray(est.t) - np.asarray(true_pose.t))
    dq = geo.quat_mul(geo.quat_conj(true_pose.q), est.q)
    r_err = 2 * np.arctan2(np.linalg.norm(np.asarray(dq)[1:]), abs(float(dq[0])))
    assert t_err < 0.02, f"translation error {t_err}"
    assert r_err < 0.01, f"rotation error {r_err}"


def test_icp_degenerate_corridor(rng):
    """Two parallel walls only: translation along the corridor (x) is
    unobservable -> uncertainty_x high, degeneracy flagged via condition
    number."""
    n = 4000
    uv = rng.uniform(-8, 8, size=(n, 2)).astype(np.float32)
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = uv[:, 0]
    pts[:, 2] = uv[:, 1]
    pts[: n // 2, 1] = -2.0
    pts[n // 2 :, 1] = 2.0
    pts += rng.normal(scale=0.005, size=pts.shape).astype(np.float32)
    m = build_surf_map(rng, pts)
    edge_m = ms.empty_map(MAP_CFG)

    scan = pts[rng.choice(n, 800, replace=False)]
    e_pts, e_mask = _empty_edges()
    est, stats = reg.icp_register(
        edge_m, m, MAP_CFG, REG_CFG, geo.Pose.identity(),
        e_pts, e_mask, jnp.asarray(scan), jnp.ones(len(scan), bool), RT)
    unc = np.asarray(stats.uncertainty)
    # reference semantics (EstimateLidarUncertainty, LidarSlam.cpp:915-986):
    # each value is min(3 * fraction of features whose best axis is this one, 1)
    # — an observability fraction.  Corridor walls face +-y: every feature
    # votes y, none vote x or z.
    assert unc[1] > 0.9  # y dominates the translation histogram
    assert unc[0] < 0.1 and unc[2] < 0.1  # x/z unobserved
    # alignment-risk output: x is the unconstrained direction
    assert float(stats.error.pos_inverse_condition) < 0.2
    # both x (along corridor) and z (no floor/ceiling) are free; the
    # max-error direction must lie in the unconstrained x-z plane
    dir_ = np.abs(np.asarray(stats.error.position_error_dir))
    assert dir_[1] < 0.15


def test_edge_correspondences_and_registration(rng):
    """Vertical pole lattice: edges constrain x/y; check line fits and that
    edge-only ICP recovers a small planar offset."""
    poles = []
    for cx in range(-6, 7, 3):
        for cy in range(-6, 7, 3):
            z = rng.uniform(-3, 3, size=(160, 1)).astype(np.float32)
            xy = np.tile(np.array([[cx, cy]], np.float32), (160, 1))
            poles.append(np.concatenate([xy, z], axis=1))
    world = np.concatenate(poles)
    world += rng.normal(scale=0.004, size=world.shape).astype(np.float32)

    edge_m = ms.empty_map(MAP_CFG)
    for chunk in np.array_split(world, 2):
        edge_m = ms.insert(edge_m, MAP_CFG, jnp.asarray(chunk),
                           jnp.ones(len(chunk), bool), 0.03)
    surf_m = ms.empty_map(MAP_CFG)

    corrs = reg.compute_edge_correspondences(
        edge_m, MAP_CFG, REG_CFG, geo.Pose.identity(),
        jnp.asarray(world[:256]), jnp.ones(256, bool), RT.line_res)
    valid = np.asarray(corrs.valid)
    assert valid.mean() > 0.5
    # line direction must be vertical: a-b along z
    ab = np.asarray(corrs.a - corrs.b)[valid]
    ab /= np.linalg.norm(ab, axis=1, keepdims=True)
    assert np.abs(ab[:, 2]).min() > 0.95

    true_pose = geo.Pose(
        geo.quat_from_rpy(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.04)),
        jnp.asarray([0.15, -0.1, 0.0], jnp.float32),
    )
    scan_world = world[rng.choice(len(world), 600, replace=False)]
    scan_body = np.asarray(true_pose.inverse().apply(jnp.asarray(scan_world)))
    s_pts = jnp.zeros((8, 3), jnp.float32)
    est, _ = reg.icp_register(
        edge_m, surf_m, MAP_CFG, REG_CFG, geo.Pose.identity(),
        jnp.asarray(scan_body), jnp.ones(len(scan_body), bool),
        s_pts, jnp.zeros(8, bool), RT)
    # x/y/yaw recovered (z unobservable for vertical lines)
    t_err = np.linalg.norm(np.asarray(est.t)[:2] - np.asarray(true_pose.t)[:2])
    assert t_err < 0.03, f"xy error {t_err}"


def test_tukey_weight():
    w = np.asarray(reg._tukey_weight(jnp.asarray([0.0, 0.15, 0.29, 0.3, 1.0]),
                                     jnp.float32(0.3)))
    np.testing.assert_allclose(w[0], 1.0)
    assert 0 < w[1] < 1 and 0 < w[2] < 0.01
    np.testing.assert_allclose(w[3:], 0.0)


def test_uncertainty_histogram_mapping():
    # all features constrain x translation only -> x uncertain (bin 6 dominant)
    hist = jnp.asarray([10, 10, 10, 10, 10, 10, 60, 0, 0], jnp.int32)
    u = np.asarray(reg.lidar_uncertainty_from_histogram(hist))
    assert u[0] == 1.0 and u[1] == 0.0 and u[2] == 0.0
    # empty histogram -> zeros (reference LidarSlam.cpp:956-964)
    u0 = np.asarray(reg.lidar_uncertainty_from_histogram(jnp.zeros(9, jnp.int32)))
    np.testing.assert_allclose(u0, 0.0)


def test_pose_prior_pulls_solution(rng):
    """With a strong absolute-pose prior and no correspondences, GN must move
    the pose to the prior (SE3AbsolutatePoseFactor behavior)."""
    target = geo.Pose(
        geo.quat_from_rpy(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.3)),
        jnp.asarray([1.0, 2.0, 3.0], jnp.float32),
    )
    prior = reg.PosePrior(
        pose=target,
        information=jnp.full((6,), 1e4, jnp.float32),
        enabled=jnp.array(True),
    )
    n = 8
    planes = reg.PlaneCorrs(
        p_body=jnp.zeros((n, 3)), normal=jnp.zeros((n, 3)), d=jnp.zeros(n),
        coeff=jnp.zeros(n), valid=jnp.zeros(n, bool),
        code=jnp.zeros(n, jnp.int32), obs_bins=jnp.zeros((n, 3), jnp.int32))
    edges = reg.EdgeCorrs(
        p_body=jnp.zeros((n, 3)), a=jnp.zeros((n, 3)), b=jnp.ones((n, 3)),
        coeff=jnp.zeros(n), valid=jnp.zeros(n, bool), code=jnp.zeros(n, jnp.int32))
    pose, _ = reg.gauss_newton_solve(
        geo.Pose.identity(), planes, edges, RT, 8, prior)
    np.testing.assert_allclose(np.asarray(pose.t), [1, 2, 3], atol=1e-2)
    dq = geo.quat_mul(geo.quat_conj(target.q), pose.q)
    assert abs(float(dq[0])) > 0.9999


def test_axis_hold_blocks_unsupported_axis(rng):
    """Per-axis match-count hold (RegistrationConfig.axis_hold_min_matches):
    with zero x-dominant correspondences, the GN update must NOT move x
    (the measured warming-up-map failure: tilted fits walked the pose
    0.43 m along x at rest) while y/z still converge; with the hold
    disabled the same problem slides in x.  With an enabled absolute-pose
    prior the hold is released."""
    n = 256
    half = 6.0
    # planes normal to y and z only (floor/ceiling + y-walls); residuals
    # are manufactured from a y/z offset plus a tilt that leaks an x
    # gradient (each normal gets a small x component, like a tilted fit)
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
    # obs votes: dominant axis is y for the first half, z for the second
    obs = np.zeros((n, 3), np.int32)
    obs[:, 2] = np.concatenate([np.full(n // 2, 7), np.full(n // 2, 8)])
    planes = reg.PlaneCorrs(
        p_body=jnp.asarray(pts), normal=jnp.asarray(nrm), d=jnp.asarray(d),
        coeff=jnp.ones(n), valid=jnp.ones(n, bool),
        code=jnp.zeros(n, jnp.int32), obs_bins=jnp.asarray(obs))
    edges = reg.EdgeCorrs(
        p_body=jnp.zeros((8, 3)), a=jnp.zeros((8, 3)), b=jnp.ones((8, 3)),
        coeff=jnp.zeros(8), valid=jnp.zeros(8, bool),
        code=jnp.zeros(8, jnp.int32))
    start = geo.Pose(geo.quat_identity(),
                     jnp.asarray([0.0, 0.3, -0.2], jnp.float32))

    held, _ = reg.gauss_newton_solve(start, planes, edges, RT, 8,
                                     axis_hold_min=10)
    free, _ = reg.gauss_newton_solve(start, planes, edges, RT, 8)
    # held: x pinned at the prediction, y/z converge to the surfaces
    assert abs(float(held.t[0]) - 0.0) < 1e-4, held.t
    assert abs(float(held.t[1])) < 0.02 and abs(float(held.t[2])) < 0.02
    # unheld: the leaked x gradient moves x away from the prediction
    assert abs(float(free.t[0])) > 0.05, free.t

    prior = reg.PosePrior(
        pose=geo.Pose(geo.quat_identity(),
                      jnp.asarray([0.4, 0.0, 0.0], jnp.float32)),
        information=jnp.full((6,), 1e4, jnp.float32),
        enabled=jnp.array(True),
    )
    aided, _ = reg.gauss_newton_solve(start, planes, edges, RT, 8, prior,
                                      axis_hold_min=10)
    # prior releases the hold: x moves to the prior's x
    assert abs(float(aided.t[0]) - 0.4) < 0.05, aided.t
