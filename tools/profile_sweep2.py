"""Sweep 2: scan-thin modes, insert cadence, cell capacity, ICP iters.
Run: python tools/profile_sweep2.py
"""

import dataclasses

import numpy as np


def main():
    import jax
    import bench
    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = bench._config("os1")
    ds = bench._dataset(cfg, 60)

    def run(name, cfg_v):
        r = OdometryRunner(cfg_v)
        rr = r.run_dataset_chunked(ds, use_imu=True, chunk=60)
        ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
        ms = 1000.0 / rr.scans_per_sec
        print(f"{name:34s} {rr.scans_per_sec:7.1f} scans/s  {ms:6.2f} ms"
              f"  ate {ate:.3f}", flush=True)

    def mod(sensor=None, map_=None, reg=None, imu=None, **pl):
        c = cfg
        if sensor:
            c = dataclasses.replace(c, sensor=dataclasses.replace(c.sensor,
                                                                  **sensor))
        if map_:
            c = dataclasses.replace(c, map=dataclasses.replace(c.map, **map_))
        if reg:
            c = dataclasses.replace(
                c, registration=dataclasses.replace(c.registration, **reg))
        if imu:
            c = dataclasses.replace(c, imu=dataclasses.replace(c.imu, **imu))
        if pl:
            c = dataclasses.replace(c, **pl)
        return c

    run("base(voxel,cad1,icp4)", cfg)
    run("icp1", mod(reg=dict(max_icp_iters=1)))
    run("icp2", mod(reg=dict(max_icp_iters=2)))
    run("thin_range", mod(sensor=dict(scan_thin_mode="range")))
    run("thin_none", mod(sensor=dict(scan_thin_mode="none")))
    run("cadence2", mod(map_=dict(insert_cadence=2)))
    run("cap16", mod(map_=dict(cell_capacity=16)))
    run("combo(range,cad2,icp2)", mod(sensor=dict(scan_thin_mode="range"),
                                      map_=dict(insert_cadence=2),
                                      reg=dict(max_icp_iters=2)))
    run("combo+cap16+smgn2", mod(sensor=dict(scan_thin_mode="range"),
                                 map_=dict(insert_cadence=2,
                                           cell_capacity=16),
                                 reg=dict(max_icp_iters=2),
                                 imu=dict(smoother_gn_iters=2)))
    run("base_repeat", cfg)


if __name__ == "__main__":
    main()
