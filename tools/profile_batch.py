"""Batch-instance scaling on one chip: aggregate scans/s for 1/2/4/8
vmapped odometry instances.  Run: python tools/profile_batch.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from superodom_tpu.pipeline import init_state, step
    from superodom_tpu.runner import OdometryRunner

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = bench._config("os1")
    n_scans = 40
    ds = bench._dataset(cfg, n_scans)
    runner = OdometryRunner(cfg)
    for i in range(len(ds.imu.t)):
        runner.add_imu(ds.imu.t[i], ds.imu.acc[i], ds.imu.gyr[i])
    built = []
    for s in ds.scans:
        scan = runner.make_scan(s.t_start, s.xyz_body, s.t_rel)
        t_end = s.t_start + float(s.t_rel[-1])
        win, ok = runner._imu_window(s.t_start, t_end)
        built.append((scan, win, jnp.asarray(ok)))

    stack = lambda items: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *items)
    scans_all = stack([b[0] for b in built])
    wins_all = stack([b[1] for b in built])
    avails_all = jnp.stack([b[2] for b in built])

    single_ms = None
    for batch in (1, 2, 4, 8):
        bcast = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[:, None],
                                       (x.shape[0], batch) + x.shape[1:]),
            t)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape),
            init_state(cfg))
        vstep = jax.vmap(lambda st, sc, im, av: step(cfg, st, sc, im, av))

        @jax.jit
        def chunk_fn(state, scans, imus, avails):
            def body(st, inp):
                st, out = vstep(st, *inp)
                return st, out.pose.t

            return jax.lax.scan(body, state, (scans, imus, avails))

        inp = jax.device_put((bcast(scans_all), bcast(wins_all),
                              jnp.broadcast_to(avails_all[:, None],
                                               (n_scans, batch))))
        st, _ = chunk_fn(state, *inp)
        jax.block_until_ready(st)
        best = 1e30
        for _ in range(2):
            t0 = time.perf_counter()
            st, traj = chunk_fn(state, *inp)
            jax.block_until_ready(st)
            best = min(best, time.perf_counter() - t0)
        agg = batch * n_scans / best
        ms = best / n_scans * 1000
        if batch == 1:
            single_ms = ms
        eff = single_ms / (ms / batch) / batch if batch > 1 else 1.0
        print(f"batch {batch}:  {agg:7.1f} aggregate scans/s  "
              f"{ms:6.2f} ms/step  per-instance efficiency "
              f"{single_ms * batch / ms * 100 / batch:.0f}%", flush=True)


if __name__ == "__main__":
    main()
