"""Host-side shell: streams a dataset through the jitted step function and
collects trajectories/metrics.

This is the thin replacement for the reference's ROS 2 runtime (executors,
topic buffers, tmuxp benchmark sessions): scan/IMU synchronization and
fixed-size windowing happen here; everything else runs on device.
Synchronization semantics follow featureExtraction::synchronize_measurements
(reference featureExtraction.cpp:171-217): a scan is processed only once IMU
samples cover its full time span; without IMU the pipeline runs LiDAR-only
(featureExtraction.cpp:483-496).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from superodom_tpu.config import PipelineConfig
from superodom_tpu.frontend import ImuWindow, Scan
from superodom_tpu.pipeline import OdomState, StepOutput, init_state, make_step_fn
from superodom_tpu.geometry import quat_identity, quat_normalize, quat_mul, so3_exp


@dataclasses.dataclass
class RunResult:
    poses_q: np.ndarray  # [n,4]
    poses_t: np.ndarray  # [n,3]
    smoothed_t: np.ndarray  # [n,3]
    stats: List[dict]
    wall_time_s: float
    scans_per_sec: float

    def return_to_origin_error(self) -> float:
        return float(np.linalg.norm(self.poses_t[-1] - self.poses_t[0]))


class OdometryRunner:
    """Feeds scans + IMU windows through the pipeline, maintaining host-side
    buffers (the MapRingBuffer role) and the gyro-orientation continuity the
    reference keeps in its IMU handler."""

    def __init__(self, cfg: PipelineConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.step_fn = make_step_fn(cfg)
        self.state = init_state(cfg, dtype)
        self._imu_t: list = []
        self._imu_acc: list = []
        self._imu_gyr: list = []
        self._q_last = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        self._gyr_last = np.zeros(3, np.float32)
        self._t_last = -1.0
        self._gyr_bias = np.zeros(3, np.float32)
        self._init_done = False
        self._init_acc: list = []
        self._init_gyr: list = []
        self._init_t0: Optional[float] = None

    # ---------------- IMU ingestion ---------------------------------------
    def add_imu(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        """Ingest one IMU sample; performs static init over the first
        ~init_window_sec (reference Imu::imuInit) then integrates
        orientation (featureExtraction::updateImuOrientation)."""
        if not self._init_done:
            if self._init_t0 is None:
                self._init_t0 = t
            self._init_acc.append(acc)
            self._init_gyr.append(gyr)
            if t - self._init_t0 >= self.cfg.imu.init_window_sec:
                self._gyr_bias = np.mean(self._init_gyr, axis=0).astype(np.float32)
                self._init_done = True
            # orientation integration still runs during init with raw rates
        dt = 1.0 / self.cfg.imu.imu_rate if self._t_last < 0 else t - self._t_last
        if dt < 0.001 or dt > 0.5:
            dt = 0.005
        gyr_c = gyr - self._gyr_bias
        dq = np.asarray(
            so3_exp(jnp.asarray(dt * 0.5 * (gyr_c + self._gyr_last), jnp.float32))
        )
        self._q_last = np.asarray(
            quat_normalize(quat_mul(jnp.asarray(self._q_last), jnp.asarray(dq)))
        )
        self._gyr_last = gyr_c.astype(np.float32)
        self._t_last = t
        self._imu_t.append(t)
        self._imu_acc.append(acc.astype(np.float32))
        self._imu_gyr.append(gyr_c.astype(np.float32))
        # bound the buffer (reference imu ring buffers hold 1000-2000)
        if len(self._imu_t) > 4096:
            for buf in (self._imu_t, self._imu_acc, self._imu_gyr):
                del buf[:2048]

    def _imu_window(self, t0: float, t1: float) -> tuple[ImuWindow, bool]:
        m = self.cfg.imu.max_imu_per_scan
        ts = np.asarray(self._imu_t)
        if len(ts) == 0 or ts[-1] <= t1 or (len(ts) and ts[0] >= t0):
            # not synchronized (scan span not covered) -> LiDAR-only this scan
            return self._empty_window(), False
        lo = np.searchsorted(ts, t0, side="right") - 1
        hi = min(np.searchsorted(ts, t1, side="right") + 1, len(ts))
        lo = max(lo, 0)
        idx = np.arange(lo, hi)
        if len(idx) > m:
            idx = idx[np.linspace(0, len(idx) - 1, m).astype(int)]
        n = len(idx)
        pad = m - n
        t_arr = np.pad(ts[idx], (0, pad))
        acc = np.pad(np.asarray(self._imu_acc)[idx], ((0, pad), (0, 0)))
        gyr = np.pad(np.asarray(self._imu_gyr)[idx], ((0, pad), (0, 0)))
        mask = np.arange(m) < n
        # orientations: integrate within the window starting from continuity
        # state — recompute here to keep windows self-consistent
        qs = np.zeros((m, 4), np.float32)
        q = self._window_q0(ts[idx[0]])
        g_prev = gyr[0]
        t_prev = t_arr[0]
        for i in range(n):
            dt = max(min(t_arr[i] - t_prev, 0.5), 0.0)
            dq = np.asarray(so3_exp(jnp.asarray(dt * 0.5 * (gyr[i] + g_prev))))
            q = np.asarray(quat_normalize(quat_mul(jnp.asarray(q), jnp.asarray(dq))))
            qs[i] = q
            g_prev, t_prev = gyr[i], t_arr[i]
        win = ImuWindow(
            t=jnp.asarray(t_arr, self.dtype),
            acc=jnp.asarray(acc, self.dtype),
            gyr=jnp.asarray(gyr, self.dtype),
            q=jnp.asarray(qs, self.dtype),
            mask=jnp.asarray(mask),
        )
        return win, True

    def _window_q0(self, t_first: float) -> np.ndarray:
        """Orientation at the first window sample: the global integration
        state rewound is approximated by the current accumulated q (windows
        are short; continuity error is absorbed by the relative use)."""
        return self._q_last.copy()

    def _empty_window(self) -> ImuWindow:
        m = self.cfg.imu.max_imu_per_scan
        return ImuWindow(
            t=jnp.zeros((m,), self.dtype),
            acc=jnp.zeros((m, 3), self.dtype),
            gyr=jnp.zeros((m, 3), self.dtype),
            q=jnp.tile(jnp.asarray([1.0, 0, 0, 0], self.dtype)[None], (m, 1)),
            mask=jnp.zeros((m,), bool),
        )

    # ---------------- scan processing --------------------------------------
    def make_scan(self, t_start: float, xyz: np.ndarray, t_rel: np.ndarray) -> Scan:
        n_max = self.cfg.sensor.max_points
        n = min(len(xyz), n_max)
        xyz_arr = np.zeros((n_max, 3), np.float32)
        t_arr = np.zeros((n_max,), np.float32)
        xyz_arr[:n] = xyz[:n]
        t_arr[:n] = t_rel[:n]
        mask = np.arange(n_max) < n
        return Scan(
            xyz=jnp.asarray(xyz_arr, self.dtype),
            t_rel=jnp.asarray(t_arr, self.dtype),
            mask=jnp.asarray(mask),
            t_start=jnp.asarray(t_start, self.dtype),
        )

    def process_scan(self, t_start, xyz, t_rel) -> StepOutput:
        scan = self.make_scan(t_start, xyz, t_rel)
        t_end = t_start + (float(t_rel[-1]) if len(t_rel) else 0.0)
        window, synced = self._imu_window(t_start, t_end)
        self.state, out = self.step_fn(
            self.state, scan, window, jnp.asarray(synced)
        )
        return out

    # ---------------- dataset replay ---------------------------------------
    def run_dataset(self, dataset, use_imu: bool = True, log_path: Optional[str] = None,
                    warmup: bool = True) -> RunResult:
        imu_i = 0
        imu = dataset.imu
        poses_q, poses_t, smoothed_t, stats = [], [], [], []

        if warmup:  # trigger compilation outside the timed loop
            s0 = dataset.scans[0]
            scan = self.make_scan(s0.t_start, s0.xyz_body, s0.t_rel)
            win = self._empty_window()
            self.step_fn(self.state, scan, win, jnp.asarray(False))

        t_begin = time.perf_counter()
        for i, s in enumerate(dataset.scans):
            t_end_scan = s.t_start + float(s.t_rel[-1]) if len(s.t_rel) else s.t_start
            if use_imu:
                while imu_i < len(imu.t) and imu.t[imu_i] <= t_end_scan + 0.02:
                    self.add_imu(imu.t[imu_i], imu.acc[imu_i], imu.gyr[imu_i])
                    imu_i += 1
            out = self.process_scan(s.t_start, s.xyz_body, s.t_rel)
            poses_q.append(np.asarray(out.pose.q))
            poses_t.append(np.asarray(out.pose.t))
            smoothed_t.append(np.asarray(out.smoothed_pose.t))
            stats.append(
                {
                    "i": i,
                    "t": float(s.t_start),
                    "surf_stack": int(out.surf_stack_num),
                    "surf_map": int(out.surf_map_num),
                    "pred_source": int(out.prediction_source),
                    "n_iterations": int(out.icp.n_iterations),
                    "uncertainty": np.asarray(out.icp.uncertainty).tolist(),
                    "degenerate": bool(out.icp.degenerate),
                    "imu_healthy": bool(out.imu_healthy),
                }
            )
        jax.block_until_ready(self.state)
        wall = time.perf_counter() - t_begin

        if log_path:
            with open(log_path, "w") as f:
                for rec in stats:
                    f.write(json.dumps(rec) + "\n")

        return RunResult(
            poses_q=np.asarray(poses_q),
            poses_t=np.asarray(poses_t),
            smoothed_t=np.asarray(smoothed_t),
            stats=stats,
            wall_time_s=wall,
            scans_per_sec=len(dataset.scans) / wall,
        )
