"""Accuracy at n=120 (10.5 s, 1.5 m/s): does voxel thinning fix the drift
that thin=none shows on longer runs?"""
import dataclasses
import numpy as np


def main():
    import jax
    import bench
    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    print("platform:", jax.devices()[0].platform, flush=True)

    def run(name, cfg_v, n_scans=120, reps=2):
        ds = bench._dataset(cfg_v, n_scans)
        for _ in range(reps):
            r = OdometryRunner(cfg_v)
            rr = r.run_dataset_chunked(ds, use_imu=True, chunk=n_scans)
            ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
            print(f"{name:30s} n={n_scans:3d} {rr.scans_per_sec:7.1f} scans/s"
                  f"  ate {ate:.3f}", flush=True)

    C = bench._config("os1")  # tuned: thin=none, icp2, cap16, smgn2
    A1 = dataclasses.replace(
        C,
        sensor=dataclasses.replace(C.sensor, scan_thin_mode="voxel"),
        registration=dataclasses.replace(C.registration, max_icp_iters=1))
    A2 = dataclasses.replace(
        C, sensor=dataclasses.replace(C.sensor, scan_thin_mode="voxel"))
    run("A1_icp1_voxel", A1)
    run("A2_icp2_voxel", A2)
    run("C_icp2_none", C)


if __name__ == "__main__":
    main()
