"""Final config selection: candidate configs x3 interleaved repeats
(run-to-run drift is ~±15%, so take medians).  Run:
python tools/profile_final.py
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

    cands = {
        "base": cfg,
        "A_icp1_vox_cap16_smgn2": mod(reg=dict(max_icp_iters=1),
                                      map_=dict(cell_capacity=16),
                                      imu=dict(smoother_gn_iters=2)),
        "B_icp1_none_cap16_smgn2": mod(sensor=dict(scan_thin_mode="none"),
                                       reg=dict(max_icp_iters=1),
                                       map_=dict(cell_capacity=16),
                                       imu=dict(smoother_gn_iters=2)),
        "C_icp2_none_cap16_smgn2": mod(sensor=dict(scan_thin_mode="none"),
                                       reg=dict(max_icp_iters=2),
                                       map_=dict(cell_capacity=16),
                                       imu=dict(smoother_gn_iters=2)),
        "D_A_plus_lio": mod(reg=dict(max_icp_iters=1),
                            map_=dict(cell_capacity=16),
                            imu=dict(smoother_gn_iters=2),
                            enable_lio_prediction=True),
    }

    results = {k: [] for k in cands}
    for rep in range(3):
        for name, c in cands.items():
            r = OdometryRunner(c)
            rr = r.run_dataset_chunked(ds, use_imu=True, chunk=60)
            ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
            results[name].append((rr.scans_per_sec, ate))
            print(f"rep{rep} {name:26s} {rr.scans_per_sec:7.1f} scans/s "
                  f"ate {ate:.3f}", flush=True)

    print("\nmedians:", flush=True)
    for name, rs in results.items():
        sp = sorted(x[0] for x in rs)[len(rs) // 2]
        at = sorted(x[1] for x in rs)[len(rs) // 2]
        print(f"{name:26s} {sp:7.1f} scans/s  ate {at:.3f}", flush=True)


if __name__ == "__main__":
    main()
