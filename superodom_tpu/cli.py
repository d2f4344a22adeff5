"""Command-line entry point — the role of the reference's launch files
(launch/{vlp_16,os1_128,livox_mid360}.launch.py) and tmuxp benchmark
sessions (script/benchmark_*.yaml): pick a sensor profile, replay a
dataset, write trajectory + stats + benchmark report.

Usage:
  python -m superodom_tpu.cli --profile vlp_16 --synthetic 100 \
      --out /tmp/run1
  python -m superodom_tpu.cli --profile os1_128 --synthetic 60 --chunked \
      --localize prior_map.pcd --out /tmp/run2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="superodom_tpu replay runner")
    ap.add_argument("--profile", default="vlp_16",
                    choices=["vlp_16", "os1_128", "livox_mid360"])
    ap.add_argument("--config", help="reference-style YAML config file")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic scans (no dataset file needed)")
    ap.add_argument("--npz", help="replay a dataset .npz (scans+imu arrays)")
    ap.add_argument("--bag", help="replay a rosbag2 recording "
                                  "(.db3 file or bag directory)")
    ap.add_argument("--lidar-topic", help="point cloud topic in --bag")
    ap.add_argument("--imu-topic", help="IMU topic in --bag")
    ap.add_argument("--sensor-kind",
                    choices=["velodyne", "ouster", "livox"],
                    help="vendor decode path for --bag point clouds "
                         "(default: inferred from field names, logged)")
    ap.add_argument("--max-scans", type=int,
                    help="cap the number of scans replayed from --bag")
    ap.add_argument("--no-imu", action="store_true")
    ap.add_argument("--high-rate", action="store_true",
                    help="also stream the ~50 Hz IMU-rate odometry to "
                         "state_estimation.txt (TUM format; reference "
                         "imuPreintegration.cpp:629,648-650); per-scan "
                         "replay only")
    ap.add_argument("--chunked", action="store_true",
                    help="high-throughput lax.scan replay")
    ap.add_argument("--localize", metavar="PCD",
                    help="localization mode against a prior map PCD")
    ap.add_argument("--init-pose", nargs=6, type=float, metavar="V",
                    help="x y z roll pitch yaw for localization init")
    ap.add_argument("--init-pose-file", metavar="TXT",
                    help="read the localization init pose from a pose file "
                         "(reference read_pose_file / start_pose.txt flow)")
    ap.add_argument("--save-map", metavar="PCD",
                    help="export the final surf map as a PCD")
    ap.add_argument("--checkpoint", metavar="NPZ",
                    help="save the full estimator state at the end")
    ap.add_argument("--resume", metavar="NPZ",
                    help="resume from a saved estimator state")
    ap.add_argument("--out", default="/tmp/superodom_run")
    args = ap.parse_args(argv)

    from superodom_tpu.config import (
        LocalizationConfig, PipelineConfig, load_yaml_config, profile_by_name,
    )
    from superodom_tpu.io.datasets import make_dataset
    from superodom_tpu.runner import OdometryRunner
    from superodom_tpu.tools import benchmark as bm

    if args.config:
        cfg = load_yaml_config(args.config)
    else:
        cfg = PipelineConfig(sensor=profile_by_name(args.profile))
    if args.localize:
        if args.init_pose_file:
            from superodom_tpu.io.pcd import read_pose_file

            rec = read_pose_file(args.init_pose_file)[0]
            init = (rec.x, rec.y, rec.z, rec.roll, rec.pitch, rec.yaw)
        else:
            init = tuple(args.init_pose or [0.0] * 6)
        cfg = dataclasses.replace(
            cfg,
            localization=LocalizationConfig(
                enabled=True, update_map=False,
                init_pose_xyz=init[:3], init_pose_rpy=init[3:],
            ),
        )

    runner = OdometryRunner(cfg)
    if args.resume:
        from superodom_tpu.checkpoint import load_state

        runner.state = load_state(args.resume, cfg)
    if args.localize:
        from superodom_tpu.checkpoint import load_prior_map

        runner.state = load_prior_map(args.localize, cfg, runner.state)

    if args.synthetic:
        from superodom_tpu.io.datasets import BoxWorld

        rng = np.random.default_rng(0)
        ds = make_dataset(rng, n_scans=args.synthetic,
                          points_per_scan=min(cfg.sensor.max_points, 16384),
                          world=BoxWorld(half_extent=np.array([10.0, 8.0, 4.0])),
                          radius=2.0)
        gt = ds.gt_poses_t
    elif args.npz:
        ds = _load_npz_dataset(args.npz)
        gt = None
    elif args.bag:
        from superodom_tpu.io.rosbag import load_bag_dataset

        ds = load_bag_dataset(
            args.bag, lidar_topic=args.lidar_topic, imu_topic=args.imu_topic,
            n_scan_lines=cfg.sensor.n_scan_lines, max_scans=args.max_scans,
            sensor_kind=args.sensor_kind,
        )
        gt = None
    else:
        ap.error("one of --synthetic / --npz / --bag is required")

    os.makedirs(args.out, exist_ok=True)
    if args.chunked:
        res = runner.run_dataset_chunked(ds, use_imu=not args.no_imu,
                                         high_rate=args.high_rate)
    else:
        res = runner.run_dataset(ds, use_imu=not args.no_imu,
                                 log_path=os.path.join(args.out, "stats.jsonl"),
                                 high_rate=args.high_rate)

    np.savetxt(os.path.join(args.out, "trajectory.txt"),
               np.concatenate([res.poses_t, res.poses_q], axis=1),
               header="x y z qw qx qy qz")
    if args.high_rate and res.high_rate_t is not None and len(res.high_rate_t):
        # TUM format (t x y z qx qy qz qw) — the ~50 Hz state_estimation
        # stream (reference imuPreintegration.cpp:629,648-650)
        hr = np.concatenate(
            [res.high_rate_t[:, None], res.high_rate_p,
             res.high_rate_q[:, 1:4], res.high_rate_q[:, 0:1]], axis=1)
        np.savetxt(os.path.join(args.out, "state_estimation.txt"), hr,
                   header="t x y z qx qy qz qw")
    report = bm.full_report(res, gt)
    bm.write_report(os.path.join(args.out, "report.json"), report)
    if args.save_map:
        from superodom_tpu.checkpoint import save_prior_map

        save_prior_map(args.save_map, runner.state)
    if args.checkpoint:
        from superodom_tpu.checkpoint import save_state

        save_state(args.checkpoint, runner.state)
    print(json.dumps({
        "scans": len(res.poses_t),
        "scans_per_sec": round(res.scans_per_sec, 2),
        "return_to_origin_m": report["return_to_origin"]["distance_m"],
        "ate_rmse_m": report.get("ate", {}).get("rmse_m"),
        "out": args.out,
    }))


def _load_npz_dataset(path):
    from superodom_tpu.io.datasets import SimDataset, SimImu, SimScan

    d = np.load(path, allow_pickle=True)
    n = int(d["n_scans"])
    scans = [
        SimScan(t_start=float(d[f"scan_{i}_t"]),
                xyz_body=d[f"scan_{i}_xyz"],
                t_rel=d[f"scan_{i}_trel"])
        for i in range(n)
    ]
    imu = SimImu(t=d["imu_t"], acc=d["imu_acc"], gyr=d["imu_gyr"])
    return SimDataset(scans=scans, imu=imu,
                      gt_poses_q=d.get("gt_q"), gt_poses_t=d.get("gt_t"),
                      times=d.get("times"))


if __name__ == "__main__":
    main()
