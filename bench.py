"""Benchmark: registered scans/sec on the attached device.

Default (what the driver runs): OS1-128 density (131k raw points/scan),
single odometry stream — prints ONE JSON line
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the north-star target from BASELINE.md — 200 registered scans/sec
at OS1-128 density on one TPU v5e chip.  The reference CPU system runs at
~10-30 scans/sec (10 Hz real time, bags replayed at 2-3x, BASELINE.md).

Other BASELINE.json configs:
  python bench.py vlp16      # config 2: VLP-16 feature registration
  python bench.py livox      # config 1: Livox mid-360 density
  python bench.py batch4     # config 5 (scaled to one chip): 4 instances
"""

import json
import sys
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 200.0  # north-star target (BASELINE.md)

# Streaming-row chunk: scans uploaded + executed per device dispatch when
# host->device transfer sits INSIDE the timed loop.  The remote-attached
# relay charges a fixed ~30 ms per RPC and ~75 ms per execution
# (tools/relay_floor.py), so larger chunks amortize the environment floor;
# at 10 Hz live rates a chunk of C scans is C*100 ms of ingest buffering,
# still far below the reference's multi-second map-publish cadence.
STREAM_CHUNK = 10


def _enable_compile_cache():
    # persistent XLA compile cache (same dir as tools/stress_matrix and
    # tests/conftest): the chunked replay programs take minutes to compile
    # through the remote relay; repeat bench invocations should pay that
    # once per program shape, not once per run
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/superodom_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()


def _config(name, tuned=True, parity=False):
    import dataclasses

    from superodom_tpu.config import (
        ImuConfig,
        LIVOX_MID360,
        MapConfig,
        OS1_128,
        PipelineConfig,
        RegistrationConfig,
        VLP_16,
    )

    sensor = {"os1": OS1_128, "vlp16": VLP_16, "livox": LIVOX_MID360}[name]
    cfg = PipelineConfig(
        sensor=sensor,
        map=MapConfig(),
        registration=RegistrationConfig(),
        imu=ImuConfig(),
        auto_voxel_size=False,
    )
    if parity:
        # reference-envelope config: the reference's full ICP budget — 5
        # outer ICP iterations with early exit x <=4 inner GN
        # (config/os1_128.yaml:27 max_iterations, LidarSlam.cpp:230-240).
        # The ENVELOPE is the registration budget; the implementation
        # tuning underneath it (candidate refresh for rounds 2..5,
        # r^2-stratified scan thinning, cell_capacity 16, 2 smoother GN
        # iterations) is the same battery-qualified set the ship config
        # uses (round 4: 294 vs 221 scans/s at identical ATE 0.070,
        # tools/profile.py ab; stress-matrix qualified in STRESS_r04.json).
        return dataclasses.replace(
            cfg,
            sensor=dataclasses.replace(sensor, scan_thin_mode="range"),
            map=MapConfig(cell_capacity=16),
            registration=RegistrationConfig(max_icp_iters=5,
                                            refresh_width=16,
                                            tukey_anneal=0.25),
            imu=ImuConfig(smoother_gn_iters=2),
        )
    if tuned and name == "os1":  # only the OS1 replay was A/B-validated
        # TPU replay tuning, selected by repeated medians with the ATE guard
        # (tools/profile_final*.py, profile_n120.py, profile_r2a.py):
        # cell_capacity 16 halves the gather + point-table size at identical
        # ATE; r^2-stratified hash thinning ("range") beats the voxel-claim
        # scatter (267 vs 229 scans/s at n=120) at equal-or-better ATE —
        # spatial thinning IS load-bearing (even-rate-only decimation
        # drifted ~1 m over 12 s) but the scatter-free stratified form
        # suffices; 2 smoother GN iterations converge within the window's
        # tight lidar priors.  max_icp_iters=2 (round 3): the round-2
        # one-extraction config passed the easy BoxWorld but FAILED the
        # adversarial battery (stop_and_go ATE 4.3, far_field 3.9,
        # range_noise 0.48 — tools/stress_matrix.py); two extraction rounds
        # pass every case with margin, so the extra round is load-bearing
        # and the throughput cost is accepted (VERDICT r2: tuning that only
        # survives the easy world gets reverted).
        cfg = dataclasses.replace(
            cfg,
            sensor=dataclasses.replace(sensor, scan_thin_mode="range"),
            map=MapConfig(cell_capacity=16),
            # tukey_anneal: round-2 support shrink rejects self-consistent
            # moving geometry the wide first-round support must accept
            # (outliers_clusters, PARITY.md row 26); measured neutral-to-
            # positive on every static-world battery case
            registration=RegistrationConfig(max_icp_iters=2,
                                            tukey_anneal=0.25),
            imu=ImuConfig(smoother_gn_iters=2),
        )
    return cfg


def _dataset(cfg, n_scans, seed=7):
    from superodom_tpu.io.datasets import BoxWorld, make_dataset

    rng = np.random.default_rng(seed)
    # moving-platform dynamics (~1.3 m/s, ~0.26 rad/s: 0.5 laps per 12 s on
    # the r=5 circle) so the benchmark measures throughput of a TRACKING
    # estimator, not a diverged one.  laps scale with n so the per-scan
    # dynamics are IDENTICAL at any replay length.  Aggressive-dynamics
    # qualification lives in the stress battery (tests/test_stress.py +
    # tools/stress_matrix.py), not in the throughput bench.
    return make_dataset(
        rng,
        n_scans=n_scans,
        points_per_scan=cfg.sensor.max_points,
        world=BoxWorld(half_extent=np.array([40.0, 30.0, 8.0])),
        radius=5.0,
        laps=0.5 * n_scans / 120.0,
        distortion=True,
    )


def bench_single(sensor_name="os1", n_scans=240, preload=True, chunk=None,
                 parity=False, latency_chunk=16):
    import numpy as np

    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    cfg = _config(sensor_name, parity=parity)
    ds = _dataset(cfg, n_scans)
    runner = OdometryRunner(cfg)
    res = runner.run_dataset_chunked(ds, use_imu=True,
                                     chunk=chunk or n_scans, preload=preload)
    # tracking guard: a diverged estimator's throughput is meaningless
    ate = ate_rmse(res.poses_t, np.asarray(ds.gt_poses_t))
    metric = (f"registered_scans_per_sec_{cfg.sensor.name}"
              + ("_os1_128" if sensor_name == "os1" else "")
              + ("_parity" if parity else "")
              + ("" if preload else "_streaming"))
    out = {
        "metric": metric,
        "value": round(res.scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(res.scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
        "ate_m": round(ate, 3),
        "tracking": bool(ate < 0.5),
    }
    if parity:
        # honest labeling (ADVICE r4): the row matches the reference's
        # ITERATION ENVELOPE (5 outer ICP x <=4 GN) but the robust
        # objective is envelope-TUNED (per-round Tukey annealing +
        # candidate refresh), not the reference's fixed support —
        # see PARITY.md rows 25-26
        out["objective"] = "envelope-tuned"
    # real per-scan latency percentiles: a separate small-chunk pass with a
    # device sync per chunk (OptimizationStats.msg:9-10 semantics — the
    # reference stamps each frame; chunk-of-16 granularity here)
    lat_runner = OdometryRunner(cfg)
    lat = lat_runner.run_dataset_chunked(
        ds, use_imu=True, chunk=latency_chunk, preload=preload,
        time_chunks=True)
    times = np.asarray([s["time_elapsed_ms"] for s in lat.stats])
    out["p50_step_ms"] = round(float(np.percentile(times, 50)), 3)
    out["p90_step_ms"] = round(float(np.percentile(times, 90)), 3)
    out["max_step_ms"] = round(float(np.max(times)), 3)
    return out


def bench_batch(batch=4, n_scans=40):
    """Aggregate multi-instance replay throughput on one chip (the batched
    config of BASELINE.json scaled to a single device)."""
    import jax
    import jax.numpy as jnp

    from superodom_tpu.pipeline import init_state, step
    from superodom_tpu.runner import OdometryRunner

    cfg = _config("os1")
    ds = _dataset(cfg, n_scans)
    runner = OdometryRunner(cfg)
    for i in range(len(ds.imu.t)):
        runner.add_imu(ds.imu.t[i], ds.imu.acc[i], ds.imu.gyr[i])

    built = []
    for s in ds.scans:
        scan = runner.make_scan(s.t_start, s.xyz_body, s.t_rel)
        t_end = s.t_start + float(s.t_rel[-1])
        win, ok = runner._imu_window(s.t_start, t_end)
        built.append((scan, win, jnp.asarray(ok)))

    bcast = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), t
    )
    state = bcast(init_state(cfg))
    vstep = jax.vmap(lambda st, sc, im, av: step(cfg, st, sc, im, av))

    @jax.jit
    def chunk_fn(state, scans, imus, avails):
        def body(st, inp):
            st, out = vstep(st, *inp)
            return st, out.pose.t

        return jax.lax.scan(body, state, (scans, imus, avails))

    chunk = 10
    n_chunks = n_scans // chunk
    # device-resident, chunked, batch-broadcast inputs (see
    # run_dataset_chunked for why transfers stay out of the timed loop)
    stack = lambda items: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *items)
    dev_inputs = []
    for c in range(n_chunks):
        b = built[c * chunk:(c + 1) * chunk]
        dev_inputs.append(jax.device_put((
            bcast(stack([x[0] for x in b])),
            bcast(stack([x[1] for x in b])),
            bcast(jnp.stack([x[2] for x in b])),
        )))
    # NOTE: bcast puts batch first; scan wants chunk first — swap axes
    dev_inputs = [
        jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 0, 1), t)
        for t in dev_inputs
    ]

    from superodom_tpu.runner import device_sync

    state_w, _ = chunk_fn(state, *dev_inputs[0])
    device_sync(state_w)

    t0 = time.perf_counter()
    for inp in dev_inputs:
        state, _ = chunk_fn(state, *inp)
    device_sync(state)
    wall = time.perf_counter() - t0
    value = batch * n_chunks * chunk / wall
    return {
        "metric": f"aggregate_scans_per_sec_os1_128_x{batch}",
        "value": round(value, 2),
        "unit": "scans/s",
        "vs_baseline": round(value / BASELINE_SCANS_PER_SEC, 3),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "os1"
    if which.startswith("batch"):
        out = bench_batch(batch=int(which[5:] or 4))
    elif which == "stream":
        # host->device streaming INSIDE the timed loop (live-feed number)
        out = bench_single("os1", preload=False, chunk=STREAM_CHUNK)
    elif which == "parity":
        out = bench_single("os1", parity=True)
    else:
        out = bench_single(which)
        if which == "os1":
            # the reference-envelope row (5 outer ICP x 4 GN with candidate
            # refresh) published beside the tuned number — both
            # driver-visible in the single JSON line
            p = bench_single("os1", parity=True)
            out["parity"] = {k: p[k] for k in
                             ("value", "ate_m", "tracking", "p50_step_ms",
                              "p90_step_ms", "vs_baseline")}
            # live-feed row: host->device streaming INSIDE the timed loop
            # (VERDICT r3 item 8 — the capability number beside the
            # device-resident replay number)
            s = bench_single("os1", preload=False, chunk=STREAM_CHUNK)
            out["streaming"] = {k: s[k] for k in
                                ("value", "ate_m", "tracking", "p50_step_ms",
                                 "p90_step_ms", "vs_baseline")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
