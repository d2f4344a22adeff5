"""The profiler driver: config A/B comparison and per-stage device timing.

Consolidates the round-1/2 one-shot experiment scripts (profile_final*,
profile_sweep*, profile_stages, ...; learnings recorded in README/PARITY)
into one parameterized tool with two entry points:

  # interleaved-repeat A/B of config variants (throughput + ATE medians):
  python tools/profile.py ab base A:registration.max_icp_iters=2 \
      B:sensor.scan_thin_mode=none,map.cell_capacity=32 --n 120 --reps 3

  # per-stage device timing of the odometry step:
  python tools/profile.py stages --reps 30

Variants are NAME:dotted.key=value,... ("base" = the bench ship config;
"parity" = the reference-envelope config).  Values parse as python literals.
Run-to-run drift on the remote-attached chip is ~+-15%, hence interleaved
repeats with medians.
"""

import argparse
import ast
import dataclasses
import json
import os
import sys
import time

import numpy as np

# make `python tools/profile.py` work from any cwd without an install: the
# repo root (which holds both bench.py and superodom_tpu/) goes first on the
# path BEFORE the bench/superodom_tpu imports inside the run functions
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _timeit(fn, *args, reps=1):
    import jax

    from superodom_tpu.runner import device_sync

    out = fn(*args)  # compile
    device_sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    device_sync(out)
    wall = time.perf_counter() - t0
    return wall / reps * 1000.0


def apply_overrides(cfg, overrides: dict):
    """Apply {'registration.max_icp_iters': 2, ...} to a frozen config tree."""
    for key, val in overrides.items():
        parts = key.split(".")
        objs = [cfg]
        for p in parts[:-1]:
            objs.append(getattr(objs[-1], p))
        node = dataclasses.replace(objs[-1], **{parts[-1]: val})
        for obj, p in zip(reversed(objs[:-1]), reversed(parts[:-1])):
            node = dataclasses.replace(obj, **{p: node})
        cfg = node
    return cfg


def parse_variant(spec: str):
    import bench

    if ":" in spec:
        name, kvs = spec.split(":", 1)
    else:
        name, kvs = spec, ""
    # any name starting with "parity" uses the reference-envelope base (so
    # several parity-derived variants can be A/B'd in one run)
    cfg = bench._config("os1", tuned=not name.startswith("parity"),
                        parity=name.startswith("parity"))
    ov = {}
    for kv in filter(None, kvs.split(",")):
        k, v = kv.split("=", 1)
        try:
            ov[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            ov[k] = v  # bare string (e.g. scan_thin_mode=none)
    return name, apply_overrides(cfg, ov)


def run_ab(args):
    import jax

    import bench
    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    print("platform:", jax.devices()[0].platform, flush=True)
    variants = dict(parse_variant(s) for s in args.variants)
    ds = bench._dataset(next(iter(variants.values())), args.n)

    results = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, c in variants.items():
            r = OdometryRunner(c)
            rr = r.run_dataset_chunked(ds, use_imu=True, chunk=args.n)
            ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
            results[name].append((rr.scans_per_sec, ate))
            print(f"  rep{rep} {name:28s} {rr.scans_per_sec:7.1f} scans/s "
                  f"ATE {ate:.3f} m", flush=True)
    print()
    for name, rows in results.items():
        sps = np.median([r[0] for r in rows])
        ate = np.median([r[1] for r in rows])
        print(f"{name:30s} median {sps:7.1f} scans/s  ATE {ate:.3f} m")
    return results


def run_stages(args):
    import jax
    import jax.numpy as jnp

    import bench
    from superodom_tpu.frontend import (
        select_features,
        undistort_points,
        uniform_feature_extraction,
    )
    from superodom_tpu.geometry import Pose
    from superodom_tpu.inertial import smoother_update
    from superodom_tpu.mapstate import (
        census_box,
        evict_far,
        gather_candidates,
        insert,
        select_knn,
    )
    from superodom_tpu.ops.voxel import voxel_downsample_scatter
    from superodom_tpu.pipeline import make_chunked_step_fn
    from superodom_tpu.registration import (
        EdgeCorrs,
        MATCH_UNKNOWN,
        PosePrior,
        gauss_newton_solve,
        icp_register,
        plane_correspondences_from_candidates,
    )
    from superodom_tpu.runner import OdometryRunner

    reps = args.reps
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    name, cfg = parse_variant(args.config)
    ds = bench._dataset(cfg, 40)
    runner = OdometryRunner(cfg)

    # warm a realistic state: run 40 scans to populate the map
    res = runner.run_dataset_chunked(ds, use_imu=True, chunk=40)
    state = runner.state
    print(f"warm run ({name}): {res.scans_per_sec:.1f} scans/s", flush=True)

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
    chunk_fn = make_chunked_step_fn(runner.step_cfg)
    bcast = lambda a: jnp.broadcast_to(a[None], (reps,) + a.shape)
    scans = jax.tree_util.tree_map(bcast, scan)
    wins = jax.tree_util.tree_map(bcast, win)
    avails = jnp.ones((reps,), bool)
    f = jax.jit(lambda st: chunk_fn(st, scans, wins, avails)[0])
    results["full_step"] = _timeit(f, state, reps=reps)

    # ---------------- frontend pieces -------------------------------------
    full_width = scan.xyz.shape[0] == sensor.max_points

    if full_width:
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

    def fe_d(x):
        sr, sm, st_ = select_features(x, scan.mask, sensor.max_surface_features,
                                      scan.t_rel)
        su, q, _ = undistort_points(sr, st_, sm, scan.t_start, win, R_il, t_il)
        return x + su[0, 0] * 1e-20

    f, init = rep(fe_d, scan.xyz)
    results["frontend/select+undistort"] = _timeit(f, init, reps=reps)

    # ---------------- registration stages ----------------------------------
    fm = scan.mask
    keep = voxel_downsample_scatter(scan.xyz, fm, rt.plane_res)
    surf_pts, surf_mask, _tr = select_features(
        scan.xyz, keep, sensor.max_surface_features, scan.t_rel)
    surf_pts = jax.device_put(surf_pts)

    def g_gather(p):
        cand, cval = gather_candidates(state.surf_map, cfg.map, p)
        return p + cand[0, 0, 0] * 1e-20

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
    results[f"icp/gauss_newton({reg.max_gn_iters}it)"] = _timeit(
        f, init, reps=reps)

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
    for k, v in results.items():
        print(f"{k:38s} {v:8.3f} ms")
    coarse = (
        results["icp/full_register"] + results["map/insert"]
        + results["map/evict"] + results["map/census"]
        + results["smoother/update"] + results["frontend/select+undistort"]
        + results["frontend/voxel_downsample"]
    )
    print(f"\n(sum of coarse stages = {coarse:.3f} ms "
          f"vs full_step {results['full_step']:.3f} ms)")
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    ab = sub.add_parser("ab", help="config A/B throughput+ATE comparison")
    ab.add_argument("variants", nargs="+",
                    help="NAME[:dotted.key=value,...]; 'base' = ship config, "
                         "'parity' = reference-envelope config")
    ab.add_argument("--n", type=int, default=120, help="scans per run")
    ab.add_argument("--reps", type=int, default=3)
    st = sub.add_parser("stages", help="per-stage device timing")
    st.add_argument("--reps", type=int, default=30)
    st.add_argument("--config", default="base",
                    help="variant spec for the profiled config")
    args = ap.parse_args()
    if args.cmd == "ab":
        run_ab(args)
    else:
        run_stages(args)


if __name__ == "__main__":
    main()
