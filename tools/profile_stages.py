"""Per-stage device timing of the odometry step on the attached TPU.

Each stage is wrapped in a jitted lax.scan of R repetitions (one dispatch,
carry-threaded so XLA cannot dead-code it) and reported as ms/rep.  Run:

    python tools/profile_stages.py [reps]
"""

import sys
import time

import numpy as np


def _timeit(fn, *args, reps=1):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    return wall / reps * 1000.0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import jax
    import jax.numpy as jnp

    from superodom_tpu.config import OS1_128, MapConfig, PipelineConfig
    from superodom_tpu.frontend import (
        select_features,
        undistort_points,
        uniform_feature_extraction,
    )
    from superodom_tpu.geometry import Pose
    from superodom_tpu.mapstate import (
        census_box,
        evict_far,
        gather_candidates,
        insert,
        select_knn,
    )
    from superodom_tpu.ops.voxel import voxel_downsample_scatter
    from superodom_tpu.pipeline import init_state, make_chunked_step_fn
    from superodom_tpu.registration import (
        gauss_newton_solve,
        icp_register,
        plane_correspondences_from_candidates,
        PosePrior,
    )
    from superodom_tpu.inertial import smoother_update
    from superodom_tpu.runner import OdometryRunner
    import bench

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cfg = bench._config("os1")
    ds = bench._dataset(cfg, 40)
    runner = OdometryRunner(cfg)

    # warm a realistic state: run 30 scans to populate the map
    res = runner.run_dataset_chunked(ds, use_imu=True, chunk=40)
    state = runner.state
    print(f"warm run: {res.scans_per_sec:.1f} scans/s", flush=True)

    s = ds.scans[5]
    scan = runner.make_scan(s.t_start, s.xyz_body, s.t_rel)
    win, ok = runner._imu_window(s.t_start, s.t_start + float(s.t_rel[-1]))
    rt = state.rt
    pose = state.pose
    sensor = cfg.sensor
    reg = cfg.registration
    R_il = jnp.eye(3)
    t_il = jnp.zeros(3)

    def rep(fn, init):
        """jit(lax.scan(fn)) with carry threading, reps iterations."""

        def wrapped(x):
            def body(c, _):
                return fn(c), None

            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c

        return jax.jit(wrapped), init

    results = {}

    # ---------------- full step ------------------------------------------
    chunk_fn = make_chunked_step_fn(cfg)
    scans = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (reps,) + a.shape), scan)
    wins = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (reps,) + a.shape), win)
    avails = jnp.ones((reps,), bool)
    f = jax.jit(lambda st: chunk_fn(st, scans, wins, avails)[0])
    results["full_step"] = _timeit(f, state, reps=reps)

    # ---------------- frontend -------------------------------------------
    def frontend(xyz):
        fm = uniform_feature_extraction(
            xyz, scan.mask, sensor.filter_point_size, sensor.min_range,
            sensor.max_range)
        ds_keep = voxel_downsample_scatter(xyz, fm, rt.plane_res)
        surf_raw, surf_mask, surf_trel = select_features(
            xyz, ds_keep, sensor.max_surface_features, scan.t_rel)
        su, q, _ = undistort_points(
            surf_raw, surf_trel, surf_mask, scan.t_start, win, R_il, t_il)
        return su + q[1:4][None] * 0.0  # thread dep

    def fe_step(x):
        out = frontend(x)
        return x + out[0, 0] * 1e-20

    f, init = rep(fe_step, scan.xyz)
    results["frontend"] = _timeit(f, init, reps=reps)

    # frontend pieces
    def fe_a(x):
        fm = uniform_feature_extraction(
            x, scan.mask, sensor.filter_point_size, sensor.min_range,
            sensor.max_range)
        return x + fm[0] * 1e-20

    f, init = rep(fe_a, scan.xyz)
    results["frontend/uniform_mask"] = _timeit(f, init, reps=reps)

    def fe_b(x):
        keep = voxel_downsample_scatter(x, scan.mask, rt.plane_res)
        return x + keep[0] * 1e-20

    f, init = rep(fe_b, scan.xyz)
    results["frontend/voxel_downsample"] = _timeit(f, init, reps=reps)

    def fe_c(x):
        sr, sm, st_ = select_features(x, scan.mask, sensor.max_surface_features,
                                      scan.t_rel)
        return x + sr[0, 0] * 1e-20

    f, init = rep(fe_c, scan.xyz)
    results["frontend/select_features"] = _timeit(f, init, reps=reps)

    # ---------------- features for registration stages --------------------
    fm = uniform_feature_extraction(
        scan.xyz, scan.mask, sensor.filter_point_size, sensor.min_range,
        sensor.max_range)
    keep = voxel_downsample_scatter(scan.xyz, fm, rt.plane_res)
    surf_pts, surf_mask, _tr = select_features(
        scan.xyz, keep, sensor.max_surface_features, scan.t_rel)
    surf_pts = jax.device_put(surf_pts)

    def g_gather(p):
        cand, cval = gather_candidates(state.surf_map, cfg.map, p)
        return p + cand[0, 0] * 1e-20

    f, init = rep(g_gather, pose.apply(surf_pts))
    results["icp/gather_candidates"] = _timeit(f, init, reps=reps)

    cand, cval = gather_candidates(state.surf_map, cfg.map, pose.apply(surf_pts))

    def g_select(p):
        pts, sq, v = select_knn(cand, cval, p, reg.plane_knn)
        return p + pts[0, 0] * 1e-20

    f, init = rep(g_select, pose.apply(surf_pts))
    results["icp/select_knn"] = _timeit(f, init, reps=reps)

    def g_plane(p):
        pc = plane_correspondences_from_candidates(
            cand, cval, reg, Pose(pose.q, p[0] * 1e-20 + pose.t), surf_pts,
            surf_mask, rt.plane_res)
        return p + pc.normal[0] * 1e-20

    f, init = rep(g_plane, pose.apply(surf_pts))
    results["icp/plane_corrs(incl select)"] = _timeit(f, init, reps=reps)

    planes = plane_correspondences_from_candidates(
        cand, cval, reg, pose, surf_pts, surf_mask, rt.plane_res)
    from superodom_tpu.registration import EdgeCorrs, MATCH_UNKNOWN
    ne = cfg.sensor.max_edge_features
    lines = EdgeCorrs(
        p_body=jnp.zeros((ne, 3)), a=jnp.zeros((ne, 3)), b=jnp.ones((ne, 3)),
        coeff=jnp.zeros((ne,)), valid=jnp.zeros((ne,), bool),
        code=jnp.full((ne,), MATCH_UNKNOWN, jnp.int32))

    def g_gn(p):
        po, _ = gauss_newton_solve(
            Pose(pose.q, p), planes, lines, rt, reg.max_gn_iters,
            use_edges=False)
        return po.t

    f, init = rep(g_gn, pose.t)
    results["icp/gauss_newton(4it)"] = _timeit(f, init, reps=reps)

    prior = PosePrior(pose=pose, information=jnp.zeros(6),
                      enabled=jnp.asarray(False))

    def g_icp(p):
        po, stats = icp_register(
            state.edge_map, state.surf_map, cfg.map, reg, Pose(pose.q, p),
            jnp.zeros((ne, 3)), jnp.zeros((ne,), bool), surf_pts, surf_mask,
            rt, prior, use_edges=False)
        return po.t

    f, init = rep(g_icp, pose.t)
    results["icp/full_register"] = _timeit(f, init, reps=reps)

    # ---------------- map update ------------------------------------------
    world = pose.apply(surf_pts)

    def g_insert(mp):
        return insert(mp, cfg.map, world, surf_mask, rt.plane_res)

    f, init = rep(g_insert, state.surf_map)
    results["map/insert"] = _timeit(f, init, reps=reps)

    def g_evict(mp):
        return evict_far(mp, cfg.map, pose.t)

    f, init = rep(g_evict, state.surf_map)
    results["map/evict"] = _timeit(f, init, reps=reps)

    def g_census(p):
        n = census_box(state.surf_map, cfg.map, p,
                       jnp.asarray([125.0, 125.0, 75.0]))
        return p + n * 1e-20

    f, init = rep(g_census, pose.t)
    results["map/census"] = _timeit(f, init, reps=reps)

    # ---------------- smoother --------------------------------------------
    def g_smoother(sm):
        sm2, _ = smoother_update(sm, cfg.imu, pose, scan.t_start, win)
        return sm2

    f, init = rep(g_smoother, state.smoother)
    results["smoother/update"] = _timeit(f, init, reps=reps)

    print()
    total = results.pop("full_step")
    print(f"{'full_step':38s} {total:8.3f} ms")
    for k, v in results.items():
        print(f"{k:38s} {v:8.3f} ms")
    accounted = sum(v for k, v in results.items()
                    if "/" in k and "incl" not in k and k not in (
                        "frontend/uniform_mask", "frontend/voxel_downsample",
                        "frontend/select_features", "icp/select_knn",
                        "icp/gauss_newton(4it)", "icp/gather_candidates",
                        "icp/plane_corrs(incl select)"))
    print(f"\n(sum of coarse stages: frontend+icp/full+insert+evict+census+smoother = "
          f"{results['frontend'] + results['icp/full_register'] + results['map/insert'] + results['map/evict'] + results['map/census'] + results['smoother/update']:.3f} ms)")


if __name__ == "__main__":
    main()
