"""Stress-matrix qualification: the full adversarial battery (io.scenarios)
run against BOTH the tuned ship config and the reference-envelope (parity)
config at realistic density (VERDICT round-2 item 1: any tuning choice that
only survives the easy world gets reverted or gated; the README accuracy
table is sourced from the WORST case here, not the best).

  python tools/stress_matrix.py                 # full battery, both configs
  python tools/stress_matrix.py --cases aggressive_6dof far_field
  python tools/stress_matrix.py --long-run      # adds the 2000-scan case
  python tools/stress_matrix.py --points 16384 --json /tmp/matrix.json

Runs on whatever jax backend is attached (the real chip under axon; CPU
otherwise).  Prints one row per (case, config) with ATE over settled frames
and the case bound, then a worst-case summary.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

# make `python tools/stress_matrix.py` work from any cwd without an install:
# the repo root (which holds both bench.py and superodom_tpu/) goes first on
# the path BEFORE any superodom_tpu import below (VERDICT r3 weak #2)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _configs(points: int):
    """(name, PipelineConfig) pairs: tuned ship config + reference envelope,
    both at the bench's OS1 profile but with max_points sized to the
    battery's density."""
    from bench import _config

    out = []
    for name, kw in (("ship", {}), ("parity", {"parity": True})):
        cfg = _config("os1", **kw)
        # feature capacity must fit the post-decimation lane count at this
        # density (OS1 stride 3); keep a 128-multiple for TPU tiling
        surf_cap = min(cfg.sensor.max_surface_features,
                       points // 3 // 128 * 128)
        cfg = dataclasses.replace(
            cfg, sensor=dataclasses.replace(
                cfg.sensor, max_points=points,
                max_surface_features=surf_cap)
        )
        out.append((name, cfg))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=16384,
                    help="points per scan (battery density)")
    ap.add_argument("--cases", nargs="*", help="subset of case names")
    ap.add_argument("--long-run", action="store_true",
                    help="include the 2000-scan endurance case")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="run-length multiplier")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--json", help="write the full result matrix here")
    ap.add_argument("--platform", choices=["cpu", "axon"],
                    help="force a jax backend (the image's sitecustomize "
                         "otherwise routes everything to the TPU relay)")
    ap.add_argument("--override", action="append", default=[],
                    help="dotted.config.key=value applied to BOTH configs "
                         "(A/B diagnosis, e.g. registration.refresh_width=0)")
    ap.add_argument("--configs", nargs="*", choices=["ship", "parity"],
                    help="subset of configs to run")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: the matrix compiles several distinct
    # config-shaped programs; reruns (requalification after a config A/B)
    # should not re-pay them
    jax.config.update("jax_compilation_cache_dir", "/tmp/superodom_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import numpy as np

    from superodom_tpu.io import scenarios as sc
    from superodom_tpu.io.datasets import ate_rmse
    from superodom_tpu.runner import OdometryRunner

    cases = sc.stress_battery(points_per_scan=args.points, scale=args.scale,
                              long_run=args.long_run)
    if args.cases:
        cases = [c for c in cases if c.name in set(args.cases)]
    configs = _configs(args.points)
    if args.configs:
        configs = [(n, c) for n, c in configs if n in set(args.configs)]
    if args.override:
        import ast

        from tools.profile import apply_overrides

        ov = {}
        for kv in args.override:
            k, v = kv.split("=", 1)
            try:
                ov[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                ov[k] = v
        configs = [(n, apply_overrides(c, ov)) for n, c in configs]

    rows = []
    for case in cases:
        ds = case.build(np.random.default_rng(args.seed))
        for cfg_name, cfg in configs:
            cfg_c = dataclasses.replace(cfg, **case.cfg_overrides)
            runner = OdometryRunner(cfg_c)
            sc.prime_prior_map(runner, case,
                               np.random.default_rng(args.seed + 1))
            t0 = time.perf_counter()
            res = runner.run_dataset(ds, use_imu=True)
            wall = time.perf_counter() - t0
            s = case.settle
            finite = bool(np.all(np.isfinite(res.poses_t)))
            ate = (ate_rmse(res.poses_t[s:], np.asarray(ds.gt_poses_t)[s:])
                   if finite else float("inf"))
            check_ok = True
            for chk, chk_args in ((case.check, (res, ds, s)),
                                  (case.post_check, (runner, res, ds, s))):
                if chk is None:
                    continue
                try:
                    chk(*chk_args)
                except AssertionError as e:
                    check_ok = False
                    print(f"  check failed: {e}", file=sys.stderr)
            ok = finite and ate < case.ate_bound and check_ok
            rows.append({
                "case": case.name, "config": cfg_name,
                "n_scans": len(ds.scans), "ate_m": round(ate, 4),
                "bound_m": case.ate_bound, "check_ok": check_ok,
                "pass": ok, "wall_s": round(wall, 1),
            })
            print(f"{case.name:20s} {cfg_name:7s} ate={ate:7.4f} "
                  f"(bound {case.ate_bound}) check={'ok' if check_ok else 'FAIL'} "
                  f"{'PASS' if ok else 'FAIL'}  [{wall:.0f}s]")

    worst = max((r for r in rows if r["ate_m"] != float("inf")),
                key=lambda r: r["ate_m"] / r["bound_m"], default=None)
    n_fail = sum(not r["pass"] for r in rows)
    print(f"\n{len(rows) - n_fail}/{len(rows)} passed; worst case: "
          f"{worst['case']}/{worst['config']} ate={worst['ate_m']}"
          if worst else "no finite rows")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"provenance": _provenance(args),
                       "rows": rows}, f, indent=1)
    sys.exit(1 if n_fail else 0)


def _provenance(args):
    """Embed WHAT was measured and WHEN directly in the artifact (VERDICT
    r4: a stale pre-fix capture was committed as qualification because
    nothing inside the JSON named the commit it came from).  Mirrors the
    run metadata the reference's recorder stamps on its analysis files
    (script/save_benchmark_result.py:211-269)."""
    import hashlib
    import subprocess

    import jax

    try:
        sha = subprocess.run(
            ["git", "-C", _REPO_ROOT, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "-C", _REPO_ROOT, "status", "--porcelain"],
            capture_output=True, text=True, timeout=10).stdout.strip())
    except Exception:
        sha, dirty = "unknown", True
    cfg_hash = hashlib.sha256(
        "\n".join(repr(c) for _, c in _configs(args.points))
        .encode()).hexdigest()[:16]
    return {
        "git_sha": sha,
        "git_dirty": dirty,
        "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "points": args.points,
        "scale": args.scale,
        "seed": args.seed,
        "config_hash": cfg_hash,
        "overrides": list(args.override),
    }


if __name__ == "__main__":
    main()
