"""Push past 173: longer replays (amortize the 30 ms relay dispatch),
insert-width proxy ablation, smoother iters. x2 repeats."""
import dataclasses
import json
import numpy as np


def main():
    import jax
    import bench
    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    print("platform:", jax.devices()[0].platform, flush=True)

    def run(name, cfg_v, n_scans, reps=2):
        ds = bench._dataset(cfg_v, n_scans)
        for _ in range(reps):
            r = OdometryRunner(cfg_v)
            rr = r.run_dataset_chunked(ds, use_imu=True, chunk=n_scans)
            ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
            print(f"{name:30s} n={n_scans:3d} {rr.scans_per_sec:7.1f} scans/s"
                  f"  ate {ate:.3f}", flush=True)

    C = bench._config("os1")  # tuned
    run("C_n60", C, 60)
    run("C_n120", C, 120)
    run("C_iw128", dataclasses.replace(
        C, map=dataclasses.replace(C.map, insert_width=128)), 120)
    run("C_smgn1", dataclasses.replace(
        C, imu=dataclasses.replace(C.imu, smoother_gn_iters=1)), 120)
    run("C_gn3", dataclasses.replace(
        C, registration=dataclasses.replace(
            C.registration, max_gn_iters=3)), 120)


if __name__ == "__main__":
    main()
