"""Capture a jax.profiler device trace of the tuned chunked replay and
aggregate per-op durations from the perfetto trace.  Run:
python tools/profile_trace.py [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def aggregate(trace_dir: str, top: int = 40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU/device track pids by process name
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower() or "XLA" in name:
                device_pids.add(e.get("pid"))
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        d = float(e.get("dur", 0.0))
        durs[name] += d
        counts[name] += 1
        total += d
    print(f"trace: {path}")
    print(f"total device op time: {total/1000:.2f} ms  "
          f"({len(durs)} distinct ops)")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/1000:9.2f} ms  x{counts[name]:5d}  {name[:90]}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/superodom_trace"
    import jax
    import bench
    from superodom_tpu.runner import OdometryRunner

    print("platform:", jax.devices()[0].platform, flush=True)
    cfg = bench._config("os1")
    ds = bench._dataset(cfg, 60)
    r = OdometryRunner(cfg)
    # warm (compile) run outside the trace
    rr = r.run_dataset_chunked(ds, use_imu=True, chunk=60)
    print(f"warm: {rr.scans_per_sec:.1f} scans/s", flush=True)
    r2 = OdometryRunner(cfg)
    jax.profiler.start_trace(outdir)
    rr = r2.run_dataset_chunked(ds, use_imu=True, chunk=60)
    jax.profiler.stop_trace()
    print(f"traced: {rr.scans_per_sec:.1f} scans/s", flush=True)
    aggregate(outdir)


if __name__ == "__main__":
    main()
