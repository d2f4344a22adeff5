"""In-context stage costs: ablate one stage at a time inside the REAL
chunked replay and A/B against the full pipeline in one process.  The
deltas are the true in-pipeline stage costs (standalone microbenches of the
same ops measured 5-10x off).  Run: python tools/profile_ablate.py
"""

import dataclasses

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench
    import superodom_tpu.pipeline as pl
    import superodom_tpu.registration as reg_mod
    from superodom_tpu.geometry import Pose
    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = bench._config("os1")
    ds = bench._dataset(cfg, 60)

    def run(name, cfg_v=None):
        r = OdometryRunner(cfg_v or cfg)
        rr = r.run_dataset_chunked(ds, use_imu=True, chunk=60)
        ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
        ms = 1000.0 / rr.scans_per_sec
        print(f"{name:34s} {rr.scans_per_sec:7.1f} scans/s  {ms:6.2f} ms/scan"
              f"  ate {ate:.3f}", flush=True)
        return ms

    base = run("full")

    # --- no insert ---------------------------------------------------------
    real_insert = pl.insert
    pl.insert = lambda m, c, xyz, mask, res, **kw: m
    d = base - run("no_insert")
    pl.insert = real_insert
    print(f"    -> insert cost ~ {d:.2f} ms", flush=True)

    # --- no smoother --------------------------------------------------------
    real_sm = pl.smoother_update
    pl.smoother_update = lambda st, c, pose, t, imu: (st, pose)
    d = base - run("no_smoother")
    pl.smoother_update = real_sm
    print(f"    -> smoother cost ~ {d:.2f} ms", flush=True)

    # --- no census ----------------------------------------------------------
    real_census = pl.census_box
    pl.census_box = lambda *a, **k: jnp.asarray(100000, jnp.int32)
    d = base - run("no_census")
    pl.census_box = real_census
    print(f"    -> census cost ~ {d:.2f} ms", flush=True)

    # --- frontend bypass (slice instead of thin+select) ---------------------
    real_ts = pl.thin_and_select
    def fake_ts(xyz, mask, res, cap, cw, *extras):
        return (xyz[:cap], mask[:cap]) + tuple(e[:cap] for e in extras)
    pl.thin_and_select = fake_ts
    d = base - run("no_frontend_thin")
    pl.thin_and_select = real_ts
    print(f"    -> frontend thin+select cost ~ {d:.2f} ms", flush=True)

    # --- no undistortion -----------------------------------------------------
    real_ud = pl.undistort_points
    pl.undistort_points = lambda xyz, tr, m, t0, imu, R, t: (
        xyz, jnp.asarray([1.0, 0, 0, 0], xyz.dtype), jnp.zeros(3, xyz.dtype))
    d = base - run("no_undistort")
    pl.undistort_points = real_ud
    print(f"    -> undistortion cost ~ {d:.2f} ms", flush=True)

    # --- ICP iteration scaling ----------------------------------------------
    for it in (1, 2, 3):
        ms = run(f"icp{it}", dataclasses.replace(
            cfg, registration=dataclasses.replace(
                cfg.registration, max_icp_iters=it)))
    print(f"    (base has max_icp_iters=4)", flush=True)

    # --- fixed-scan vs while ICP ---------------------------------------------
    run("icp4_fixed_scan", dataclasses.replace(
        cfg, registration=dataclasses.replace(
            cfg.registration, icp_early_exit=False)))
    run("icp2_gn8_fixed", dataclasses.replace(
        cfg, registration=dataclasses.replace(
            cfg.registration, max_icp_iters=2, max_gn_iters=8,
            icp_early_exit=False)))


if __name__ == "__main__":
    main()
