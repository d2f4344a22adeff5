"""Dissect map insert + ICP iteration cost on the TPU, then sweep full-step
variants (frontend compaction, ICP budget, smoother iters) measuring
scans/s AND tracking error.  Run: python tools/profile_insert.py
"""

import dataclasses
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


DISPATCH_MS = 30.0  # measured fixed per-call overhead through the relay


def main():
    import jax
    import jax.numpy as jnp

    from superodom_tpu.mapstate import (
        _bucket_of, _composite_sort_order, insert, lookup_packed, pack_cells,
    )
    from superodom_tpu.ops.voxel import hash_coords, voxel_coords
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

    s = ds.scans[5]
    scan = runner.make_scan(s.t_start, s.xyz_body, s.t_rel)
    from superodom_tpu.frontend import (
        select_features, uniform_feature_extraction,
    )
    from superodom_tpu.ops.voxel import voxel_downsample_scatter

    fmask = uniform_feature_extraction(scan.xyz, scan.mask, 3, 0.2, 130.0)
    keep = voxel_downsample_scatter(scan.xyz, fmask, rt.plane_res)
    surf_pts, surf_mask, _ = select_features(scan.xyz, keep, 2048, scan.t_rel)
    world = pose.apply(surf_pts)
    m = state.surf_map
    nb, B = m.keys.shape
    C = m.cell_capacity
    mcfg = cfg.map

    R = {}

    def rep(name, fn, init, reps=100):
        def wrapped(x):
            def body(c, _):
                return fn(c), None
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c
        ms = _timeit(jax.jit(wrapped), init) / reps - DISPATCH_MS / reps
        R[name] = ms
        print(f"{name:46s} {ms:8.4f} ms", flush=True)

    # ---- insert sub-stages -------------------------------------------------
    def sort_stage(x):
        fine = voxel_coords(x, jnp.maximum(rt.plane_res, 1e-6))
        fine_h = hash_coords(fine, 0)
        packed = pack_cells(voxel_coords(x, mcfg.cell_size))
        sk_cell = jnp.where(surf_mask, packed, jnp.int32(2147483647))
        sk_fine = jnp.where(surf_mask, fine_h, jnp.int32(2147483647))
        order = _composite_sort_order(sk_cell, sk_fine)
        return x + x[order][0] * 1e-20
    rep("insert/sort2048", sort_stage, world)

    def lookup_stage(x):
        packed = pack_cells(voxel_coords(x, mcfg.cell_size))
        slot = lookup_packed(m, packed)
        return x + slot[0] * 1e-20
    rep("insert/lookup2048", lookup_stage, world)

    def claims_stage(x):
        packed = pack_cells(voxel_coords(x, mcfg.cell_size))
        bucket = _bucket_of(packed, nb)
        lane_ids = jnp.arange(x.shape[0], dtype=jnp.int32)
        cand = bucket * B
        claims = jnp.full((nb * B,), jnp.int32(2147483647)).at[cand].min(
            lane_ids, mode="drop")
        return x + claims[0] * 1e-20
    rep("insert/one_claims_scatter", claims_stage, world)

    def gate_stage(x):
        packed = pack_cells(voxel_coords(x, mcfg.cell_size))
        slot = jnp.maximum(lookup_packed(m, packed), 0)
        cell_pts = m.pts[slot]  # [N, 3C]
        d2 = ((cell_pts[:, 0:C] - x[:, 0:1]) ** 2
              + (cell_pts[:, C:2 * C] - x[:, 1:2]) ** 2
              + (cell_pts[:, 2 * C:] - x[:, 2:3]) ** 2)
        return x + jnp.min(d2) * 1e-20
    rep("insert/distance_gate", gate_stage, world)

    def pts_scatter_stage(mp):
        rows = jnp.arange(2048, dtype=jnp.int32) * 7 % (nb * B)
        pts = mp.pts.at[rows, rows % (3 * C)].set(world[:, 0], mode="drop")
        return mp._replace(pts=pts)
    rep("insert/pts_scatter_2048rows", pts_scatter_stage, m, 60)

    def full_insert(mp):
        return insert(mp, mcfg, world, surf_mask, rt.plane_res)
    rep("insert/full", full_insert, m, 60)

    # ---- full-step variant sweep -------------------------------------------
    from superodom_tpu.io.datasets import ate_rmse

    def run_variant(name, cfg_v):
        r = OdometryRunner(cfg_v)
        t0 = time.perf_counter()
        rr = r.run_dataset_chunked(ds, use_imu=True, chunk=25)
        ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
        print(f"variant {name:28s} {rr.scans_per_sec:7.1f} scans/s   "
              f"ate {ate:.3f} m", flush=True)

    reg = cfg.registration
    run_variant("baseline(icp4,gn4,sm3)", cfg)
    run_variant("icp2", dataclasses.replace(
        cfg, registration=dataclasses.replace(reg, max_icp_iters=2)))
    run_variant("icp3_tol5mm", dataclasses.replace(
        cfg, registration=dataclasses.replace(
            reg, max_icp_iters=3, trans_converge_tol=5e-3,
            rot_converge_tol=2e-3)))
    run_variant("gn3", dataclasses.replace(
        cfg, registration=dataclasses.replace(reg, max_gn_iters=3)))
    run_variant("sm_gn2", dataclasses.replace(
        cfg, imu=dataclasses.replace(cfg.imu, smoother_gn_iters=2)))


if __name__ == "__main__":
    main()
