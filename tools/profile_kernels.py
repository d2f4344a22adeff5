"""Microbenchmarks deciding kernel-level design choices on the real TPU.

Calibrates fixed per-dispatch and per-scan-iteration overhead with no-op
programs, then times design variants of the hot ops found by
profile_stages.py.  Run:  python tools/profile_kernels.py
"""

import sys
import time

import numpy as np


def _timeit(fn, *args, n_calls=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(n_calls):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from superodom_tpu.config import RegistrationConfig
    from superodom_tpu.mapstate import (
        gather_candidates, insert, select_knn,
    )
    from superodom_tpu.ops.voxel import voxel_downsample_scatter
    from superodom_tpu.pipeline import init_state
    from superodom_tpu.registration import (
        plane_correspondences_from_candidates,
    )
    import bench

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    cfg = bench._config("os1")
    ds = bench._dataset(cfg, 25)
    from superodom_tpu.runner import OdometryRunner

    runner = OdometryRunner(cfg)
    res = runner.run_dataset_chunked(ds, use_imu=True, chunk=25)
    print(f"warm: {res.scans_per_sec:.1f} scans/s", flush=True)
    state = runner.state
    rt = state.rt
    pose = state.pose
    reg = cfg.registration

    s = ds.scans[5]
    scan = runner.make_scan(s.t_start, s.xyz_body, s.t_rel)
    R = {}

    def rep(name, fn, init, reps):
        def wrapped(x):
            def body(c, _):
                return fn(c), None
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c
        ms = _timeit(jax.jit(wrapped), init) / reps
        R[name] = ms
        print(f"{name:44s} {ms:8.4f} ms", flush=True)

    # ---- calibration ------------------------------------------------------
    rep("noop_r30", lambda x: x + 1e-20, jnp.zeros(3), 30)
    rep("noop_r300", lambda x: x + 1e-20, jnp.zeros(3), 300)

    # nested while_loop cost: trivial body, 4 iterations
    def with_while(x):
        def cond(c):
            return c[1] < 4
        def body(c):
            return (c[0] + 1e-20, c[1] + 1)
        y, _ = jax.lax.while_loop(cond, body, (x, jnp.zeros((), jnp.int32)))
        return y
    rep("nested_while4_trivial_r100", with_while, jnp.zeros(3), 100)

    def with_scan4(x):
        def body(c, _):
            return c + 1e-20, None
        y, _ = jax.lax.scan(body, x, None, length=4)
        return y
    rep("nested_scan4_trivial_r100", with_scan4, jnp.zeros(3), 100)

    # ---- voxel downsample variants ---------------------------------------
    xyz = scan.xyz
    mask = scan.mask

    def vd_cur(x):
        k = voxel_downsample_scatter(x, mask, rt.plane_res)
        return x + k[0] * 1e-20
    rep("voxel_downsample_131k_4x_table", vd_cur, xyz, 100)

    def vd_small(x):
        k = voxel_downsample_scatter(x, mask, rt.plane_res, table_bits=17)
        return x + k[0] * 1e-20
    rep("voxel_downsample_131k_1x_table", vd_small, xyz, 100)

    # compact to 32k via top_k first, then thin at 32k lanes
    def vd_compact(x):
        lane = jnp.arange(x.shape[0], dtype=jnp.int32)
        keys = jnp.where(mask, x.shape[0] - lane, 0)
        _, idx = jax.lax.top_k(keys, 32768)
        xs = x[idx]
        ms_ = mask[idx]
        k = voxel_downsample_scatter(xs, ms_, rt.plane_res, table_bits=17)
        return x + (k[0].astype(x.dtype) + xs[0, 0]) * 1e-20
    rep("voxel_downsample_compact32k", vd_compact, xyz, 100)

    # unique-index scatter compaction 131k -> 32k
    def vd_scatter_compact(x):
        dest = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dest = jnp.where(mask & (dest < 32768), dest, 32768)
        xs = jnp.zeros((32768, 3), x.dtype).at[dest].set(
            x, mode="drop", unique_indices=True)
        return x + xs[0, 0] * 1e-20
    rep("scatter_compact_131k_to_32k", vd_scatter_compact, xyz, 100)

    def topk_compact(x):
        lane = jnp.arange(x.shape[0], dtype=jnp.int32)
        keys = jnp.where(mask, x.shape[0] - lane, 0)
        _, idx = jax.lax.top_k(keys, 2048)
        return x + x[idx][0, 0] * 1e-20
    rep("topk_compact_131k_to_2048", topk_compact, xyz, 100)

    # ---- KNN select variants ---------------------------------------------
    fm = scan.mask
    from superodom_tpu.frontend import (
        select_features, uniform_feature_extraction,
    )
    fmask = uniform_feature_extraction(xyz, mask, 3, 0.2, 130.0)
    keep = voxel_downsample_scatter(xyz, fmask, rt.plane_res)
    surf_pts, surf_mask, _ = select_features(xyz, keep, 2048, scan.t_rel)
    w_pt = pose.apply(surf_pts)
    cand, cval = gather_candidates(state.surf_map, cfg.map, w_pt)
    cand = jax.device_put(cand)

    def sel_topk(p):
        pts, sq, v = select_knn(cand, cval, p, 5)
        return p + pts[0, 0] * 1e-20
    rep("select_topk_2048x256_k5", sel_topk, w_pt, 100)

    def sel_approx(p):
        d2 = jnp.sum((cand - p[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cval, d2, 1e30)
        neg, idx = jax.lax.approx_max_k(-d2, 5)
        pts = jnp.take_along_axis(cand, idx[..., None], axis=1)
        return p + (pts[0, 0] - neg[0, 0]) * 1e-20
    rep("select_approx_2048x256_k5", sel_approx, w_pt, 100)

    def sel_iter(p):
        d2 = jnp.sum((cand - p[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cval, d2, 1e30)
        acc = p[0, 0] * 1e-20
        d = d2
        for _ in range(5):
            i = jnp.argmin(d, axis=-1)
            acc = acc + jnp.take_along_axis(
                cand, i[:, None, None], axis=1)[0, 0, 0] * 1e-20
            d = d.at[jnp.arange(d.shape[0]), i].set(1e30)
        return p + acc
    rep("select_iter5_2048x256", sel_iter, w_pt, 100)

    def plane_full(p):
        pc = plane_correspondences_from_candidates(
            cand, cval, reg, type(pose)(pose.q, p[0] * 1e-20 + pose.t),
            surf_pts, surf_mask, rt.plane_res)
        return p + pc.normal[0] * 1e-20
    rep("plane_corrs_full", plane_full, w_pt, 100)

    # ---- insert variants ---------------------------------------------------
    world = pose.apply(surf_pts)

    def ins_cur(mp):
        return insert(mp, cfg.map, world, surf_mask, rt.plane_res)
    rep("insert_current", ins_cur, state.surf_map, 60)

    # ---- icp loop: while vs fixed scan -------------------------------------
    from superodom_tpu.registration import icp_register, PosePrior
    ne = cfg.sensor.max_edge_features
    prior = PosePrior(pose=pose, information=jnp.zeros(6),
                      enabled=jnp.asarray(False))
    ezero = jnp.zeros((ne, 3))
    emask = jnp.zeros((ne,), bool)

    def icp_cur(p):
        po, _ = icp_register(
            state.edge_map, state.surf_map, cfg.map, reg,
            type(pose)(pose.q, p), ezero, emask, surf_pts, surf_mask,
            rt, prior, use_edges=False)
        return po.t
    rep("icp_register_while4", icp_cur, pose.t, 30)

    import dataclasses
    reg2 = dataclasses.replace(reg, max_icp_iters=2)

    def icp_2(p):
        po, _ = icp_register(
            state.edge_map, state.surf_map, cfg.map, reg2,
            type(pose)(pose.q, p), ezero, emask, surf_pts, surf_mask,
            rt, prior, use_edges=False)
        return po.t
    rep("icp_register_while2", icp_2, pose.t, 30)

    # ---- smoother ----------------------------------------------------------
    from superodom_tpu.inertial import smoother_update
    win, ok = runner._imu_window(s.t_start, s.t_start + float(s.t_rel[-1]))

    def smo(sm):
        sm2, _ = smoother_update(sm, cfg.imu, pose, scan.t_start, win)
        return sm2
    rep("smoother_update_w6_gn3", smo, state.smoother, 60)

    imu2 = dataclasses.replace(cfg.imu, smoother_gn_iters=2)

    def smo2(sm):
        sm2, _ = smoother_update(sm, imu2, pose, scan.t_start, win)
        return sm2
    rep("smoother_update_w6_gn2", smo2, state.smoother, 60)

    print("\ncalibration: subtract noop_r300 from fine measurements")


if __name__ == "__main__":
    main()
