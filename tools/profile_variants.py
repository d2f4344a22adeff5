"""Scatter-variant microbench + bench-config variant sweep (n=60 like
bench.py).  Run: python tools/profile_variants.py
"""

import dataclasses
import time

import numpy as np

DISPATCH_MS = 30.0


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
    import bench

    print(f"platform: {jax.devices()[0].platform}", flush=True)

    def rep(name, fn, init, reps=100):
        def wrapped(x):
            def body(c, _):
                return fn(c), None
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c
        ms = _timeit(jax.jit(wrapped), init) / reps - DISPATCH_MS / reps
        print(f"{name:46s} {ms:8.4f} ms", flush=True)

    # ---- scatter variants into the 25 MB pts table -------------------------
    big = jnp.zeros((2_097_152, 3), jnp.float32)
    upd = jnp.ones((2048, 3), jnp.float32)
    rows = (jnp.arange(2048, dtype=jnp.int32) * 997) % 2_000_000

    def sc_default(b):
        return b.at[rows].set(upd + b[0, 0] * 1e-20)
    rep("scatter2048_default", sc_default, big, 40)

    def sc_unique(b):
        return b.at[rows].set(upd + b[0, 0] * 1e-20, unique_indices=True)
    rep("scatter2048_unique", sc_unique, big, 40)

    rows_sorted = jnp.sort(rows)

    def sc_unique_sorted(b):
        return b.at[rows_sorted].set(upd + b[0, 0] * 1e-20,
                                     unique_indices=True,
                                     indices_are_sorted=True)
    rep("scatter2048_unique_sorted", sc_unique_sorted, big, 40)

    upd512 = jnp.ones((512, 3), jnp.float32)
    rows512 = (jnp.arange(512, dtype=jnp.int32) * 997) % 2_000_000

    def sc_512(b):
        return b.at[rows512].set(upd512 + b[0, 0] * 1e-20,
                                 unique_indices=True)
    rep("scatter512_unique", sc_512, big, 40)

    # same updates into a small (VMEM-size) operand for comparison
    small = jnp.zeros((65536, 3), jnp.float32)
    rows_s = (jnp.arange(2048, dtype=jnp.int32) * 997) % 65000

    def sc_small(b):
        return b.at[rows_s].set(upd + b[0, 0] * 1e-20, unique_indices=True)
    rep("scatter2048_into_65k_unique", sc_small, small, 40)

    # ---- bench-config variant sweep (matches bench.py: n=60, chunk=60) ----
    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    cfg = bench._config("os1")
    ds = bench._dataset(cfg, 60)

    def run_variant(name, cfg_v):
        r = OdometryRunner(cfg_v)
        rr = r.run_dataset_chunked(ds, use_imu=True, chunk=60)
        ate = ate_rmse(rr.poses_t, np.asarray(ds.gt_poses_t))
        rto = rr.return_to_origin_error()
        print(f"variant {name:28s} {rr.scans_per_sec:7.1f} scans/s   "
              f"ate {ate:.3f} m   rto {rto:.3f} m", flush=True)

    reg = cfg.registration
    run_variant("baseline(icp4,gn4,sm3)", cfg)
    run_variant("icp3_tol5mm", dataclasses.replace(
        cfg, registration=dataclasses.replace(
            reg, max_icp_iters=3, trans_converge_tol=5e-3,
            rot_converge_tol=2e-3)))
    run_variant("icp2", dataclasses.replace(
        cfg, registration=dataclasses.replace(reg, max_icp_iters=2)))
    run_variant("icp2_gn6", dataclasses.replace(
        cfg, registration=dataclasses.replace(reg, max_icp_iters=2,
                                              max_gn_iters=6)))
    run_variant("icp3_tol_smgn2", dataclasses.replace(
        cfg,
        registration=dataclasses.replace(
            reg, max_icp_iters=3, trans_converge_tol=5e-3,
            rot_converge_tol=2e-3),
        imu=dataclasses.replace(cfg.imu, smoother_gn_iters=2)))


if __name__ == "__main__":
    main()
