"""Measure the remote-attached relay's synchronous floor costs.

The bench environment reaches its single TPU chip through a TCP relay
("remote-attached" runtime).  Three fixed costs bound any host-in-the-loop
(streaming) measurement there, independent of our code:

  rpc_ms        per-``device_put`` CALL round trip (payload-independent
                floor; the wire itself moves 400-1000 MB/s)
  exec_ms       per-execution overhead: wall time of a trivially small
                jitted program, synced honestly (runner.device_sync) —
                dispatch + completion round trips
  sync_ms       cost of one honest sync on an already-complete array

From these it derives the synchronous lower bound for the streaming replay
(one upload + one execution per chunk) and compares it against the measured
streaming row, so the committed artifact shows how much of the gap to the
preloaded number is environment, not code.  The reference's live capability
this corresponds to is 10 Hz real-time operation on a locally attached GPU
(laserMapping.cpp:98-100) — a local attach has ~0.1 ms analogues of all
three costs.

Usage:
    python tools/relay_floor.py [--json RELAY_FLOOR.json] [--chunk 10]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _median_ms(fn, reps=7):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append((time.perf_counter() - t0) * 1000.0)
    return statistics.median(xs)


def measure(chunk: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from superodom_tpu.runner import device_sync

    dev = jax.devices()[0]
    out = {
        "backend": jax.default_backend(),
        "device": str(getattr(dev, "device_kind", dev.platform)),
    }

    # --- per-device_put RPC floor: tiny vs large payload ---------------
    tiny = np.zeros((8,), np.float32)
    big = np.zeros((4 << 20,), np.float32)  # 16 MB
    for _ in range(2):  # warm the path
        device_sync(jax.device_put(tiny))
    out["rpc_ms_tiny_put"] = _median_ms(
        lambda: device_sync(jax.device_put(tiny)))
    t_big = _median_ms(lambda: device_sync(jax.device_put(big)), reps=3)
    out["rpc_ms_16mb_put"] = t_big
    bw = big.nbytes / max(t_big - out["rpc_ms_tiny_put"], 1e-3) / 1e3
    out["wire_mb_per_s"] = round(bw, 1)

    # --- per-execution overhead: trivial jitted program ----------------
    f = jax.jit(lambda x: x + 1.0)
    xd = jax.device_put(tiny)
    device_sync(f(xd))  # compile
    out["exec_ms_trivial"] = _median_ms(lambda: device_sync(f(xd)))

    # --- honest-sync cost on an already-ready array ---------------------
    y = f(xd)
    device_sync(y)
    out["sync_ms_ready"] = _median_ms(lambda: device_sync(y))

    # --- derived streaming floor ----------------------------------------
    # one packed upload + one chunk execution per chunk of `chunk` scans;
    # compute time comes from the committed bench (preloaded p50/scans).
    res_path = os.path.join(_REPO_ROOT, "bench_results.json")
    if os.path.exists(res_path):
        with open(res_path) as fjson:
            res = json.load(fjson)
        compute_ms_scan = 1000.0 / res["os1"]["value"]
        floor_chunk_ms = (out["rpc_ms_tiny_put"] + out["exec_ms_trivial"]
                          + chunk * compute_ms_scan)
        out["chunk"] = chunk
        out["derived_stream_floor_scans_per_s"] = round(
            chunk / floor_chunk_ms * 1000.0, 1)
        if "streaming" in res:
            out["measured_stream_scans_per_s"] = res["streaming"]["value"]

    out["note"] = (
        "local-attach analogues of rpc/exec/sync are ~0.1 ms; on such a "
        "host the same streaming code's floor is within noise of the "
        "preloaded number")
    try:
        out["git_sha"] = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=_REPO_ROOT,
            capture_output=True, text=True).stdout.strip()
    except OSError:
        pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()
    out = measure(chunk=args.chunk)
    text = json.dumps(out, indent=1)
    print(text)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
