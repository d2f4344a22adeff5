"""Round-2 throughput push A/B: thin mode, evict cadence, GN iters —
n=120 with ATE guard, x2 repeats.  PYTHONPATH=/root/.axon_site:/root/repo."""
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
            print(f"{name:28s} n={n_scans:3d} {rr.scans_per_sec:7.1f} scans/s"
                  f"  ate {ate:.3f}", flush=True)

    C = bench._config("os1")  # ship: voxel thin, icp1, cap16, smgn2, evict8
    run("C_ship", C)
    run("C_range", dataclasses.replace(
        C, sensor=dataclasses.replace(C.sensor, scan_thin_mode="range")))
    run("C_evict1", dataclasses.replace(
        C, map=dataclasses.replace(C.map, evict_cadence=1)))
    run("C_gn3", dataclasses.replace(
        C, registration=dataclasses.replace(C.registration, max_gn_iters=3)))
    run("C_range_evict1_gn3", dataclasses.replace(
        C,
        sensor=dataclasses.replace(C.sensor, scan_thin_mode="range"),
        map=dataclasses.replace(C.map, evict_cadence=1),
        registration=dataclasses.replace(C.registration, max_gn_iters=3)))


if __name__ == "__main__":
    main()
