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

from superodom_tpu import native
from superodom_tpu.config import Extrinsics, PipelineConfig
from superodom_tpu.frontend import ImuWindow, Scan, VioWindow
from superodom_tpu.pipeline import (
    StepOutput,
    empty_vio_window,
    init_state,
    make_chunked_step_fn,
    make_step_fn,
)


class PackedChunkTransport:
    """Single-``device_put`` chunk transport for host->device streaming.

    The remote-attached relay charges a ~28 ms round trip PER device_put
    CALL regardless of payload size, so uploading the 11-leaf chunk pytree
    costs ~300 ms/chunk in pure RPC latency.  Worse, the wire itself is
    slow: ~21-40 MB/s sustained for packed payloads (measured round 5 with
    an honest sync — tools/relay_floor.py; the relay compresses, so
    structured data moves faster than random bytes).  This packs every
    leaf of the chunk into ONE contiguous uint8 buffer on the host and
    unpacks on-device inside the jitted chunk program — one RPC per chunk
    — and narrows every wide leaf, since wire bytes ARE the streaming
    floor here:

      Scan.xyz    f32 -> u16 per-axis quantized over the chunk's bounding
                  box (<= 2 mm resolution at 130 m span; sensor noise is
                  ~10x that), box shipped as a 24-byte header
      Scan.t_rel  f32 -> u16 quantized over 2x the sweep span (~3 us
                  resolution; IMU slerp interpolation noise is >> that)
      Scan.ring   i32 -> u8 (<= 256 scan lines on every supported sensor)
      masks/avail bool -> bitpacked u8 (8 lanes/byte)

    A live deployment would do the same packing in its ingest thread; the
    reference's driver equivalently receives ONE serialized LaserFeature
    message per scan (super_odometry_msgs/msg/LaserFeature.msg:1-30)."""

    _F32, _U16T, _BITS, _U8I, _U16Q3 = 0, 1, 2, 3, 4  # transport kinds

    def __init__(self, template_chunk, scan_period: float):
        self.trel_span = 2.0 * float(scan_period)
        leaves, self.treedef = jax.tree_util.tree_flatten(template_chunk)
        # identify the Scan leaves by position: the chunk tree is
        # (Scan, ImuWindow, avail[, VioWindow]) and Scan flattens first as
        # (xyz, t_rel, mask, t_start, ring)
        self.specs = []  # (kind, shape, offset, nbytes)
        off = 0
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf)
            if i == 0:  # Scan.xyz: 24-byte f32 box header + u16 payload
                kind, nbytes = self._U16Q3, 24 + arr.size * 2
            elif i == 1:  # Scan.t_rel
                kind, nbytes = self._U16T, arr.size * 2
            elif i == 4:  # Scan.ring
                kind, nbytes = self._U8I, arr.size
            elif arr.dtype == np.bool_:
                kind, nbytes = self._BITS, (arr.size + 7) // 8
            else:
                if arr.dtype != np.float32:
                    raise TypeError(
                        f"packed transport: unexpected dtype {arr.dtype} "
                        f"at leaf {i}")
                kind, nbytes = self._F32, arr.size * 4
            pad = (-nbytes) % 4  # keep every segment 4-byte aligned
            self.specs.append((kind, arr.shape, off, nbytes))
            off += nbytes + pad
        self.total_bytes = off

    def pack(self, chunk_tree) -> np.ndarray:
        leaves = jax.tree_util.tree_leaves(chunk_tree)
        buf = np.zeros((self.total_bytes,), np.uint8)
        for (kind, shape, off, nbytes), leaf in zip(self.specs, leaves):
            arr = np.ascontiguousarray(np.asarray(leaf))
            if kind == self._U16Q3:
                pts = arr.reshape(-1, 3)
                lo = pts.min(axis=0)
                span = np.maximum(pts.max(axis=0) - lo, 1e-6)
                hdr = np.concatenate([lo, span]).astype(np.float32)
                q = ((pts - lo) / span * 65535.0).astype(np.uint16)
                buf[off:off + 24] = hdr.view(np.uint8)
                raw = q.view(np.uint8).ravel()
                buf[off + 24:off + nbytes] = raw
                continue
            if kind == self._U16T:
                q = np.clip(arr / self.trel_span * 65535.0, 0, 65535)
                raw = q.astype(np.uint16).view(np.uint8).ravel()
            elif kind == self._U8I:
                if arr.size and arr.max() > 255:
                    raise ValueError("ring id > 255 in packed transport")
                raw = arr.astype(np.uint8).ravel()
            elif kind == self._BITS:
                raw = np.packbits(arr.ravel())
            else:
                raw = arr.view(np.uint8).ravel()
            buf[off:off + nbytes] = raw
        return buf

    def unpack(self, buf):
        """Device-side inverse (traced inside the jitted chunk program)."""
        leaves = []
        for kind, shape, off, nbytes in self.specs:
            seg = jax.lax.slice(buf, (off,), (off + nbytes,))
            if kind == self._U16Q3:
                hdr = jax.lax.bitcast_convert_type(
                    seg[:24].reshape(6, 4), jnp.float32)
                lo, span = hdr[:3], hdr[3:]
                u16 = jax.lax.bitcast_convert_type(
                    seg[24:].reshape(-1, 3, 2), jnp.uint16)
                x = (u16.astype(jnp.float32) * (span / 65535.0)
                     + lo).reshape(shape)
            elif kind == self._U16T:
                u16 = jax.lax.bitcast_convert_type(
                    seg.reshape(-1, 2), jnp.uint16)
                x = (u16.astype(jnp.float32)
                     * (self.trel_span / 65535.0)).reshape(shape)
            elif kind == self._U8I:
                x = seg.astype(jnp.int32).reshape(shape)
            elif kind == self._BITS:
                size = int(np.prod(shape))
                bits = (seg[:, None]
                        >> (7 - jnp.arange(8, dtype=jnp.uint8))) & 1
                x = bits.reshape(-1)[:size].astype(jnp.bool_).reshape(shape)
            else:
                x = jax.lax.bitcast_convert_type(
                    seg.reshape(-1, 4), jnp.float32).reshape(shape)
            leaves.append(x)
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


def make_packed_chunk_fn(cfg: PipelineConfig,
                         transport: PackedChunkTransport,
                         high_rate: bool = False):
    """The chunked replay program fed by ONE packed uint8 buffer: unpack
    on-device, then run the same lax.scan body as make_chunked_step_fn."""
    inner = make_chunked_step_fn(cfg, high_rate=high_rate)

    def _chunk(state, buf):
        return inner(state, *transport.unpack(buf))

    return jax.jit(_chunk)


def device_sync(tree) -> None:
    """Wait until every dispatched computation producing ``tree`` finished.

    ``jax.block_until_ready`` is a silent no-op for arrays living on the
    remote-attached relay backend (measured round 5: a 3 ms "wait" on a
    0.7 s chunk execution — it inflated a throughput reading 70x), so timed
    regions must force a small materialization instead: fetching ANY output
    of an execution implies the execution completed.  The smallest leaf
    keeps the forced transfer negligible; on normal backends this costs one
    tiny D2H copy."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    if leaves:
        np.asarray(jax.device_get(min(leaves, key=lambda a: a.size)))


@dataclasses.dataclass
class RunResult:
    poses_q: np.ndarray  # [n,4]
    poses_t: np.ndarray  # [n,3]
    smoothed_t: np.ndarray  # [n,3]
    stats: List[dict]
    wall_time_s: float
    scans_per_sec: float
    # streamed IMU-rate odometry (reference ~200 Hz integration published
    # every 4th sample => ~50 Hz, imuPreintegration.cpp:629,648-650);
    # populated when run_dataset(high_rate=True)
    high_rate_t: Optional[np.ndarray] = None  # [m] sample times
    high_rate_q: Optional[np.ndarray] = None  # [m,4]
    high_rate_p: Optional[np.ndarray] = None  # [m,3]
    high_rate_v: Optional[np.ndarray] = None  # [m,3]

    def return_to_origin_error(self) -> float:
        return float(np.linalg.norm(self.poses_t[-1] - self.poses_t[0]))


class OdometryRunner:
    """Feeds scans + IMU windows through the pipeline.

    IMU handling lives in the native ``ImuBuffer`` (superodom_tpu/native):
    raw samples are conditioned into the gravity-aligned laser frame
    (extrinsic rotation + lever-arm transport, the reference's imuConverter,
    imuPreintegration.cpp:486-541), static-initialized after
    ``init_window_sec`` (Imu::imuInit, imu_data.h:71-160), and carried with
    a per-sample gyro orientation chain (updateImuOrientation).  Because
    conditioning expresses the IMU stream in the laser frame, the on-device
    pipeline runs with identity IMU extrinsics.
    """

    def __init__(self, cfg: PipelineConfig, dtype=jnp.float32,
                 condition_imu: bool = True):
        self.cfg = cfg
        self.dtype = dtype
        ident = (np.allclose(cfg.extrinsics.R(), np.eye(3), atol=1e-9)
                 and np.allclose(cfg.extrinsics.t(), 0.0, atol=1e-12))
        self.condition_imu = condition_imu and not ident
        if self.condition_imu:
            # samples arrive at the device already in the laser frame
            self.step_cfg = dataclasses.replace(cfg, extrinsics=Extrinsics())
        else:
            self.step_cfg = cfg
        self.step_fn = make_step_fn(self.step_cfg)
        self._chunk_fn = None  # built lazily by run_dataset_chunked
        self._hr_fn = None  # built lazily by high_rate_states
        self._last_window = None
        self.state = init_state(self.step_cfg, dtype)
        self.imu_buf = native.ImuBuffer(
            capacity=1 << 20,
            R_imu_laser=cfg.extrinsics.R() if self.condition_imu else None,
            t_imu_laser=cfg.extrinsics.t() if self.condition_imu else None,
            imu_rate=cfg.imu.imu_rate,
        )
        self.imu_init = None  # (acc_mean, gyr_bias, q0) after static init
        self._imu_t_first: Optional[float] = None
        # external-odometry pose samples for 6-DoF path undistortion
        # (bounded like the reference's visualOdomBuf, MapRingBuffer 5000)
        self._vio_samples: list = []
        # online ingestion state (push_scan)
        self._frame_count = 0
        self._scan_queue: list = []
        self.frames_skipped = 0  # skip_frame decimation
        self.frames_shed = 0  # queue overflow drops

    # ---------------- IMU ingestion ---------------------------------------
    def add_imu(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        """Ingest one raw IMU sample.  The native buffer conditions it and
        integrates the orientation chain; static init (gravity alignment +
        gyro bias) runs once ``init_window_sec`` of data has accumulated."""
        self.imu_buf.add(t, np.asarray(acc, np.float32),
                         np.asarray(gyr, np.float32))
        if not self.imu_buf.initialized:
            if self._imu_t_first is None:
                self._imu_t_first = t
            if t - self._imu_t_first >= self.cfg.imu.init_window_sec:
                self.imu_init = self.imu_buf.static_init(
                    self.cfg.imu.init_window_sec)

    def _imu_window(self, t0: float, t1: float) -> tuple[ImuWindow, bool]:
        m = self.cfg.imu.max_imu_per_scan
        # the reference consumes IMU only after static init completes
        # (featureExtraction.cpp:603-618 IMU_INIT gate); pre-init scans run
        # LiDAR-only
        if not self.imu_buf.initialized or self.imu_buf.sync(t0, t1) != 1:
            return self._empty_window(), False
        ts, acc, gyr, qs = self.imu_buf.window(t0, t1, m)
        n = len(ts)
        pad = m - n
        # HOST (numpy) leaves throughout the ingest builders: under a
        # remote-attached device every eager jnp.asarray is a ~28 ms RPC,
        # and the chunked replay pulls each leaf straight back for host
        # stacking.  jit device_puts numpy inputs itself where needed.
        win = ImuWindow(
            t=np.pad(ts, (0, pad)).astype(self.dtype),
            acc=np.pad(acc, ((0, pad), (0, 0))).astype(self.dtype),
            gyr=np.pad(gyr, ((0, pad), (0, 0))).astype(self.dtype),
            q=np.concatenate(
                [qs, np.tile(np.array([1.0, 0, 0, 0], np.float32),
                             (pad, 1))]
            ).astype(self.dtype),
            mask=np.arange(m) < n,
        )
        return win, True

    def _empty_window(self) -> ImuWindow:
        m = self.cfg.imu.max_imu_per_scan
        return ImuWindow(
            t=np.zeros((m,), self.dtype),
            acc=np.zeros((m, 3), self.dtype),
            gyr=np.zeros((m, 3), self.dtype),
            q=np.tile(np.array([1.0, 0, 0, 0], self.dtype)[None], (m, 1)),
            mask=np.zeros((m,), bool),
        )

    # ---------------- external odometry (VIO) aiding ------------------------
    def add_vio_pose(self, t: float, q_wxyz: np.ndarray, p_xyz: np.ndarray):
        """Ingest one external-odometry pose sample (T_w_lidar at time t).
        With ``cfg.use_vio_undistortion`` the runner builds a per-scan pose
        path from these for 6-DoF undistortion (the reference's
        visual_odom_Handler feeding visualOdomBuf)."""
        self._vio_samples.append(
            (float(t), np.asarray(q_wxyz, np.float32),
             np.asarray(p_xyz, np.float32))
        )
        if len(self._vio_samples) > 5000:
            self._vio_samples.pop(0)

    def _vio_window(self, t0: float, t1: float) -> VioWindow:
        """Pose samples bracketing [t0, t1], evenly decimated to the static
        window capacity; all-masked when the stream does not cover the
        sweep (the on-device coverage gate re-checks)."""
        k = self.cfg.max_vio_per_scan
        ts = np.asarray([s[0] for s in self._vio_samples])
        if len(ts) < 2 or ts[0] > t0 or ts[-1] < t1:
            return VioWindow(
                t=np.zeros((k,), self.dtype),
                q=np.tile(np.array([1.0, 0, 0, 0], self.dtype)[None],
                          (k, 1)),
                p=np.zeros((k, 3), self.dtype),
                mask=np.zeros((k,), bool),
            )
        lo = int(np.searchsorted(ts, t0, side="right")) - 1
        hi = int(np.searchsorted(ts, t1, side="left")) + 1
        sel = list(range(max(lo, 0), min(hi, len(ts))))
        if len(sel) > k:  # keep endpoints, decimate the interior evenly
            idx = np.linspace(0, len(sel) - 1, k).round().astype(int)
            sel = [sel[i] for i in idx]
        n = len(sel)
        pad = k - n
        q = np.stack([self._vio_samples[i][1] for i in sel])
        p = np.stack([self._vio_samples[i][2] for i in sel])
        return VioWindow(
            t=np.pad(ts[sel], (0, pad)).astype(self.dtype),
            q=np.concatenate(
                [q, np.tile(np.array([1, 0, 0, 0], np.float32), (pad, 1))]
            ).astype(self.dtype),
            p=np.pad(p, ((0, pad), (0, 0))).astype(self.dtype),
            mask=np.arange(k) < n,
        )

    def set_vio_pose(self, q_wxyz: np.ndarray, t_xyz: np.ndarray,
                     available: bool = True):
        """Provide an external (e.g. visual-inertial) absolute pose estimate.
        Used as the prediction source and as an absolute-pose constraint when
        the lidar geometry is degenerate (reference visual_odom_Handler +
        addAbsolutePoseConstraints, LidarSlam.cpp:281-298)."""
        from superodom_tpu.geometry import Pose as _Pose

        self.state = self.state._replace(
            vio_pose=_Pose(jnp.asarray(q_wxyz, self.dtype),
                           jnp.asarray(t_xyz, self.dtype)),
            vio_available=jnp.asarray(bool(available)),
        )

    # ---------------- scan processing --------------------------------------
    def make_scan(self, t_start: float, xyz: np.ndarray, t_rel: np.ndarray,
                  ring: Optional[np.ndarray] = None) -> Scan:
        """Pack a raw cloud into the device Scan layout.

        When edge features are off and ``filter_point_size > 1``, the
        uniform stride selection + duplicate gate (featureExtraction.cpp:
        504-525) run HERE over contiguous numpy views and only the
        ~max_points/stride candidate lanes ship to the device: a device-side
        strided slice lowers to per-row gathers (~0.3 ms per 44k-lane slice
        on v5e) while the host slice is free, and the upload shrinks by the
        stride factor.  Edge mode keeps the full ring-major cloud (the
        curvature extractor needs raw neighbors)."""
        n_max = self.cfg.sensor.max_points
        stride = self.cfg.sensor.filter_point_size
        n = min(len(xyz), n_max)
        xyz_arr = np.zeros((n_max, 3), np.float32)
        t_arr = np.zeros((n_max,), np.float32)
        xyz_arr[:n] = xyz[:n]
        t_arr[:n] = t_rel[:n]
        mask = np.arange(n_max) < n

        if stride > 1 and not self.cfg.use_edge_features:
            from superodom_tpu.frontend import decimated_width

            w = decimated_width(n_max, stride)
            cand = xyz_arr[1::stride][:w]
            prev = xyz_arr[0::stride][:w]
            dup = np.all(np.abs(cand - prev) <= 1e-7, axis=-1)
            return Scan(
                xyz=np.ascontiguousarray(cand, self.dtype),
                t_rel=np.ascontiguousarray(t_arr[1::stride][:w], self.dtype),
                mask=mask[1::stride][:w] & ~dup,
                t_start=np.asarray(t_start, self.dtype),
                ring=np.zeros((w,), np.int32),
            )

        ring_arr = np.zeros((n_max,), np.int32)
        if ring is not None:
            ring_arr[:n] = ring[:n]
        return Scan(
            xyz=xyz_arr.astype(self.dtype, copy=False),
            t_rel=t_arr.astype(self.dtype, copy=False),
            mask=mask,
            t_start=np.asarray(t_start, self.dtype),
            ring=ring_arr,
        )

    def process_scan(self, t_start, xyz, t_rel) -> StepOutput:
        scan = self.make_scan(t_start, xyz, t_rel)
        t_end = t_start + (float(t_rel[-1]) if len(t_rel) else 0.0)
        window, synced = self._imu_window(t_start, t_end)
        args = (self.state, scan, window, np.asarray(synced))
        if self.cfg.use_vio_undistortion:
            args = args + (self._vio_window(t_start, t_end),)
        self.state, out = self.step_fn(*args)
        self._last_window = window
        return out

    # ---------------- online ingestion (real-time semantics) ---------------
    MAX_SCAN_QUEUE = 50  # lidar buffer shed threshold (featureExtraction.cpp:831)

    def push_scan(self, t_start: float, xyz: np.ndarray, t_rel: np.ndarray,
                  ring: Optional[np.ndarray] = None) -> List[StepOutput]:
        """Online scan ingestion with the reference's real-time buffering
        semantics (laserCloudHandler + manageLidarBuffer,
        featureExtraction.cpp:710-842):

        * frame decimation — every ``skip_frame``-th scan is processed
          (featureExtraction.cpp:713-715);
        * bounded pending queue — oldest scans are shed at 50 queued
          (featureExtraction.cpp:825-842);
        * deferred processing — a queued scan runs once the IMU stream
          covers its sweep (synchronize_measurements), LiDAR-only if it
          predates the buffer.

        Returns the outputs of every scan processed by this call.
        """
        self._frame_count += 1
        if self._frame_count % self.cfg.sensor.skip_frame != 0:
            self.frames_skipped += 1
            return []
        self._scan_queue.append((float(t_start), np.asarray(xyz),
                                 np.asarray(t_rel), ring))
        while len(self._scan_queue) > self.MAX_SCAN_QUEUE:
            self._scan_queue.pop(0)
            self.frames_shed += 1
        return self.drain_scans()

    def drain_scans(self) -> List[StepOutput]:
        """Process queued scans whose IMU coverage is complete."""
        outs: List[StepOutput] = []
        while self._scan_queue:
            t_start, xyz, t_rel, ring = self._scan_queue[0]
            t_end = t_start + (float(t_rel[-1]) if len(t_rel) else 0.0)
            sync = self.imu_buf.sync(t_start, t_end)
            if sync == 0 and len(self.imu_buf) > 0:
                break  # wait for more IMU before processing this scan
            self._scan_queue.pop(0)
            outs.append(self.process_scan(t_start, xyz, t_rel))
        return outs

    def high_rate_states(self):
        """IMU-rate (~200 Hz) odometry between the last two scans: the
        smoothed latest state propagated through the most recent IMU window
        with current bias estimates (the reference's ~200 Hz
        state_estimation output, imuPreintegration.cpp:544-570).

        Returns (times, poses_q [n,4], poses_t [n,3], velocities [n,3]).
        """
        from superodom_tpu.inertial import propagate_high_rate

        if getattr(self, "_last_window", None) is None:
            raise RuntimeError("no scan processed yet")
        if self._hr_fn is None:
            import jax as _jax

            self._hr_fn = _jax.jit(
                lambda sm, win: propagate_high_rate(sm, self.cfg.imu, win)
            )
        poses, vels, mask = self._hr_fn(self.state.smoother, self._last_window)
        m = np.asarray(mask)
        qs = np.asarray(poses.q)[m]
        if self.cfg.use_imu_roll_pitch:
            # publish the IMU's own orientation chain instead of the smoothed
            # attitude (reference prepareOdometryMessage,
            # imuPreintegration.cpp:713-723)
            qs = np.asarray(self._last_window.q)[m]
        return (
            np.asarray(self._last_window.t)[m],
            qs,
            np.asarray(poses.t)[m],
            np.asarray(vels)[m],
        )

    @staticmethod
    def _stats_record(out: StepOutput, i: int, t: Optional[float] = None,
                      time_ms: Optional[float] = None) -> dict:
        """One per-scan stats record — the full OptimizationStats surface
        (reference super_odometry_msgs/msg/OptimizationStats.msg), identical
        between per-scan and chunked replays.  ``out`` must hold host
        (numpy) leaves for one scan."""
        rec = {
            "i": i,
            "surf_stack": int(out.surf_stack_num),
            "edge_stack": int(out.edge_stack_num),
            "surf_map": int(out.surf_map_num),
            "edge_map": int(out.edge_map_num),
            "pred_source": int(out.prediction_source),
            "n_iterations": int(out.icp.n_iterations),
            "uncertainty": np.asarray(out.icp.uncertainty).tolist(),
            "degenerate": bool(out.icp.degenerate),
            "imu_healthy": bool(out.imu_healthy),
            "translation_from_last": float(out.translation_from_last),
            "rotation_from_last": float(out.rotation_from_last),
            "total_translation": float(out.total_translation),
            "total_rotation": float(out.total_rotation),
            "average_distance": float(out.average_distance),
            "motion_accepted": bool(out.motion_accepted),
            "plane_rejection_hist": np.asarray(
                out.icp.plane_rejection_hist).tolist(),
            "line_rejection_hist": np.asarray(
                out.icp.line_rejection_hist).tolist(),
            "obs_histogram": np.asarray(out.icp.obs_histogram).tolist(),
            "position_error": float(out.icp.error.position_error),
            "position_error_dir": np.asarray(
                out.icp.error.position_error_dir).tolist(),
            "pos_inverse_condition": float(
                out.icp.error.pos_inverse_condition),
            "orientation_error_deg": float(
                out.icp.error.orientation_error_deg),
            "orientation_error_dir": np.asarray(
                out.icp.error.orientation_error_dir).tolist(),
            "ori_inverse_condition": float(
                out.icp.error.ori_inverse_condition),
            "iterations": [
                {
                    "translation_norm": float(out.icp.iter_trans_norm[k]),
                    "rotation_norm": float(out.icp.iter_rot_norm[k]),
                    "num_surf_from_scan": int(out.icp.iter_surf_num[k]),
                    "num_corner_from_scan": int(out.icp.iter_edge_num[k]),
                }
                for k in range(len(np.asarray(out.icp.iter_trans_norm)))
            ],
            "acc_bias": np.asarray(out.acc_bias).tolist(),
            "gyr_bias": np.asarray(out.gyr_bias).tolist(),
        }
        if t is not None:
            rec["t"] = t
        if time_ms is not None:
            # OptimizationStats.msg:9-10 time_elapsed / latency; in offline
            # replay both are the per-scan processing time
            rec["time_elapsed_ms"] = round(time_ms, 3)
            rec["latency_ms"] = round(time_ms, 3)
        return rec

    # ---------------- dataset replay ---------------------------------------
    def _ingest_dataset_vio(self, dataset) -> None:
        """Feed a dataset's external-odometry stream (``dataset.vio`` with
        t/q/p arrays), if present and the VIO undistortion path is on."""
        vio = getattr(dataset, "vio", None)
        if vio is None or not self.cfg.use_vio_undistortion:
            return
        if self._vio_samples and self._vio_samples[-1][0] >= float(vio.t[0]):
            return  # already ingested (chunked replay after per-scan replay)
        for i in range(len(vio.t)):
            self.add_vio_pose(vio.t[i], vio.q[i], vio.p[i])

    def run_dataset(self, dataset, use_imu: bool = True, log_path: Optional[str] = None,
                    warmup: bool = True, high_rate: bool = False) -> RunResult:
        """Replay a dataset scan by scan.

        ``high_rate=True`` additionally streams the IMU-rate odometry: after
        each scan the latest smoothed state is propagated through the scan's
        IMU window and every ``cfg.imu.high_rate_decimation``-th sample is
        emitted (the reference publishes every 4th ~200 Hz integration step
        => ~50 Hz, imuPreintegration.cpp:629,648-650)."""
        imu_i = 0
        imu = dataset.imu
        self._ingest_dataset_vio(dataset)
        poses_q, poses_t, smoothed_t, stats = [], [], [], []
        hr_t, hr_q, hr_p, hr_v = [], [], [], []
        hr_last_t = -np.inf

        if warmup:  # trigger compilation outside the timed loop
            s0 = dataset.scans[0]
            scan = self.make_scan(s0.t_start, s0.xyz_body, s0.t_rel)
            win = self._empty_window()
            wargs = (self.state, scan, win, np.asarray(False))
            if self.cfg.use_vio_undistortion:
                wargs = wargs + (empty_vio_window(
                    self.cfg.max_vio_per_scan, self.dtype),)
            self.step_fn(*wargs)

        t_begin = time.perf_counter()
        for i, s in enumerate(dataset.scans):
            t_end_scan = s.t_start + float(s.t_rel[-1]) if len(s.t_rel) else s.t_start
            if use_imu:
                while imu_i < len(imu.t) and imu.t[imu_i] <= t_end_scan + 0.02:
                    self.add_imu(imu.t[imu_i], imu.acc[imu_i], imu.gyr[imu_i])
                    imu_i += 1
            t_scan0 = time.perf_counter()
            out = self.process_scan(s.t_start, s.xyz_body, s.t_rel)
            out = jax.device_get(out)
            scan_ms = (time.perf_counter() - t_scan0) * 1000.0
            poses_q.append(out.pose.q)
            poses_t.append(out.pose.t)
            smoothed_t.append(out.smoothed_pose.t)
            stats.append(
                self._stats_record(out, i, t=float(s.t_start),
                                   time_ms=scan_ms)
            )
            if high_rate and self._last_window is not None:
                ts, qs, ps, vs = self.high_rate_states()
                dec = self.cfg.imu.high_rate_decimation
                for k in range(0, len(ts), dec):
                    if ts[k] <= hr_last_t:  # windows overlap at boundaries
                        continue
                    hr_last_t = float(ts[k])
                    hr_t.append(ts[k])
                    hr_q.append(qs[k])
                    hr_p.append(ps[k])
                    hr_v.append(vs[k])
        device_sync(self.state)
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
            high_rate_t=np.asarray(hr_t) if high_rate else None,
            high_rate_q=np.asarray(hr_q) if high_rate else None,
            high_rate_p=np.asarray(hr_p) if high_rate else None,
            high_rate_v=np.asarray(hr_v) if high_rate else None,
        )

    def stack_chunked_inputs(self, dataset, use_imu: bool = True,
                             chunk: int = 16):
        """Ingest + window + stack a replay into host pytrees shaped
        ``[n_chunks, chunk, ...]`` — the host half of chunked replay,
        shared by run_dataset_chunked and tools/relay_floor.py (which
        measures the wire cost of the REAL packed chunk payload)."""
        imu = dataset.imu
        if use_imu:
            for i in range(len(imu.t)):
                self.add_imu(imu.t[i], imu.acc[i], imu.gyr[i])
        self._ingest_dataset_vio(dataset)

        def build(s):
            scan = self.make_scan(s.t_start, s.xyz_body, s.t_rel)
            t_end = s.t_start + (float(s.t_rel[-1]) if len(s.t_rel) else 0.0)
            if use_imu:
                win, ok = self._imu_window(s.t_start, t_end)
            else:
                win, ok = self._empty_window(), False
            out = (scan, win, np.asarray(ok))
            if self.cfg.use_vio_undistortion:
                out = out + (self._vio_window(s.t_start, t_end),)
            return out

        built = [build(s) for s in dataset.scans]
        n_chunks = len(built) // chunk

        # stacked [n_chunks, chunk, ...]: preload uploads this to device
        # memory ONCE so scan streaming bandwidth (PCIe on a real host, a
        # TCP relay here) stays out of the registration-throughput
        # measurement, matching the reference's "bag already in page
        # cache" replay benchmarks
        def stack_host(get):
            leaves = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[get(b) for b in built[: n_chunks * chunk]],
            )
            return jax.tree_util.tree_map(
                lambda a: a.reshape((n_chunks, chunk) + a.shape[1:]), leaves
            )

        n_inputs = len(built[0])  # scan, imu, avail[, vio]
        host_inputs = tuple(
            stack_host(lambda b, j=j: b[j]) for j in range(n_inputs)
        )
        return host_inputs, n_chunks

    def run_dataset_chunked(self, dataset, use_imu: bool = True,
                            chunk: int = 16, preload: bool = True,
                            time_chunks: bool = False,
                            high_rate: bool = False) -> RunResult:
        """Replay with lax.scan-batched dispatch: `chunk` scans per device
        call.  Requires the dataset offline (all IMU available up front) —
        the high-throughput replay mode (BASELINE.md north star).

        ``preload=True`` uploads the whole replay to device memory before
        the timed loop (the reference's "bag in page cache" semantics);
        ``preload=False`` keeps host->device streaming INSIDE the timed
        region — the number a live deployment would see.

        ``time_chunks=True`` blocks after every chunk and stamps each scan
        with its own chunk's wall time / ``chunk`` — at chunk sizes 8-16
        this yields real latency percentiles (the reference stamps each
        frame, laserMapping.cpp:581-596); the default stamps the whole-run
        mean (async dispatch, maximum throughput).

        ``high_rate=True`` additionally streams the IMU-rate odometry
        (~50 Hz after decimation) computed INSIDE the same device program
        as the throughput loop — each scan body integrates its IMU window
        forward from the post-update smoothed state (the reference
        publishes the 50 Hz stream and the registration concurrently,
        imuPreintegration.cpp:629,648-650)."""
        if high_rate:
            chunk_fn = make_chunked_step_fn(self.step_cfg, high_rate=True)
        else:
            if self._chunk_fn is None:
                self._chunk_fn = make_chunked_step_fn(self.step_cfg)
            chunk_fn = self._chunk_fn

        host_inputs, n_chunks = self.stack_chunked_inputs(
            dataset, use_imu, chunk)
        index = lambda tree, c: jax.tree_util.tree_map(lambda a: a[c], tree)
        host_chunk = lambda c: tuple(index(t, c) for t in host_inputs)
        if preload:
            # whole replay resident in HBM before timing: streaming
            # bandwidth (PCIe on a real host, a TCP relay here) stays out of
            # the registration-throughput number
            dev_inputs = jax.device_put(host_inputs)
            transport = None
        else:
            dev_inputs = None  # uploaded chunk by chunk inside the loop
            # ONE device_put per chunk (see PackedChunkTransport: the relay
            # charges ~28 ms per CALL, so the 11-leaf pytree upload was
            # ~300 ms/chunk in RPC latency alone — the round-4 streaming
            # regression to 0.23x north star)
            transport = PackedChunkTransport(host_chunk(0),
                                             self.cfg.sensor.scan_period)
            packed_fn = make_packed_chunk_fn(self.step_cfg, transport,
                                             high_rate=high_rate)

        poses_q, poses_t, smoothed_t, stats = [], [], [], []

        # warmup compile on the first chunk shape
        if preload:
            first = tuple(index(t, 0) for t in dev_inputs)
            _ = chunk_fn(self.state, *first)
        else:
            _ = packed_fn(self.state,
                          jax.device_put(transport.pack(host_chunk(0))))
        device_sync(_[0])

        t_begin = time.perf_counter()
        pending = []
        chunk_ms: List[float] = []
        if not preload:
            # Two-stage ingest pipeline (the live-driver shape: the
            # reference's feature-extraction node packs LaserFeature
            # messages in its own executor thread while laserMapping
            # consumes, laserMapping.cpp:98-100).  Stage 1 packs chunk
            # c+2 on a worker core while stage 2's device_put of chunk
            # c+1 blocks on the wire and the device computes chunk c —
            # pack cost (~60-180 ms/chunk on this host) and device
            # compute both hide under the transfer, so the wire IS the
            # streaming floor (tools/relay_floor.py), not pack+wire.
            # Lookahead is bounded at 2 chunks (~2x4 MB packed).
            from concurrent.futures import ThreadPoolExecutor

            pack_ex = ThreadPoolExecutor(max_workers=1)
            put_ex = ThreadPoolExecutor(max_workers=1)
            pack_then_put = lambda c: jax.device_put(
                transport.pack(host_chunk(c)))
            put_futs = [put_ex.submit(pack_then_put, c)
                        for c in range(min(2, n_chunks))]
        try:
            for c in range(n_chunks):
                t_chunk0 = time.perf_counter()
                if preload:
                    inp = tuple(index(t, c) for t in dev_inputs)
                    self.state, outs = chunk_fn(self.state, *inp)
                else:
                    buf = put_futs[c].result()
                    if c + 2 < n_chunks:
                        nxt = pack_ex.submit(transport.pack,
                                             host_chunk(c + 2))
                        put_futs.append(
                            put_ex.submit(lambda f=nxt:
                                          jax.device_put(f.result())))
                    self.state, outs = packed_fn(self.state, buf)
                    put_futs[c] = None  # free the consumed upload
                if time_chunks:
                    # block per chunk: each chunk's wall time is real (costs
                    # one device round trip per chunk, amortized over
                    # `chunk` scans)
                    device_sync(self.state)
                    chunk_ms.append((time.perf_counter() - t_chunk0) * 1000.0)
                # keep device->host reads OUT of the loop otherwise: each
                # scalar read is a full round trip on a remote-attached
                # device
                pending.append(outs)
        finally:
            if not preload:
                pack_ex.shutdown(wait=False)
                put_ex.shutdown(wait=False)
        device_sync(self.state)
        wall = time.perf_counter() - t_begin  # registration work ends here;
        # stats readback below is reporting, not estimation
        mean_scan_ms = wall / max(n_chunks * chunk, 1) * 1000.0
        host = jax.device_get(pending)
        hr_t, hr_q, hr_p, hr_v = [], [], [], []
        hr_last_t = -np.inf
        if high_rate:
            # split (StepOutput, HighRateOut) and host-decimate the stream
            # (every high_rate_decimation-th live sample; windows overlap at
            # scan boundaries, deduped by timestamp — same semantics as the
            # per-scan path in run_dataset)
            dec = self.cfg.imu.high_rate_decimation
            scan_i = 0
            for outs, hr in host:
                for k in range(hr.t.shape[0]):  # scans within the chunk
                    qs = hr.q[k]
                    if self.cfg.use_imu_roll_pitch:
                        # publish the IMU's own orientation chain (reference
                        # prepareOdometryMessage, imuPreintegration.cpp:713)
                        qs = np.asarray(built[scan_i][1].q)
                    live = np.flatnonzero(hr.mask[k])[::dec]
                    for j in live:
                        if hr.t[k, j] <= hr_last_t:
                            continue
                        hr_last_t = float(hr.t[k, j])
                        hr_t.append(hr.t[k, j])
                        hr_q.append(qs[j])
                        hr_p.append(hr.p[k, j])
                        hr_v.append(hr.v[k, j])
                    scan_i += 1
            host = [outs for outs, _hr in host]
        for c, outs in enumerate(host):
            poses_q.append(outs.pose.q)
            poses_t.append(outs.pose.t)
            smoothed_t.append(outs.smoothed_pose.t)
            per_scan_ms = chunk_ms[c] / chunk if time_chunks else mean_scan_ms
            for k in range(chunk):
                out_k = jax.tree_util.tree_map(lambda a: a[k], outs)
                stats.append(self._stats_record(
                    out_k, c * chunk + k, time_ms=per_scan_ms))
        # trailing remainder: per-scan path (full record surface kept)
        for b in built[n_chunks * chunk:]:
            t_scan0 = time.perf_counter()
            self.state, out = self.step_fn(self.state, *b)
            out = jax.device_get(out)
            scan_ms = (time.perf_counter() - t_scan0) * 1000.0
            poses_q.append(out.pose.q[None])
            poses_t.append(out.pose.t[None])
            smoothed_t.append(out.smoothed_pose.t[None])
            stats.append(self._stats_record(out, len(stats),
                                            time_ms=scan_ms))
            if high_rate:
                self._last_window = b[1]
                ts, qs, ps, vs = self.high_rate_states()
                dec = self.cfg.imu.high_rate_decimation
                for k in range(0, len(ts), dec):
                    if ts[k] <= hr_last_t:
                        continue
                    hr_last_t = float(ts[k])
                    hr_t.append(ts[k])
                    hr_q.append(qs[k])
                    hr_p.append(ps[k])
                    hr_v.append(vs[k])
        return RunResult(
            poses_q=np.concatenate(poses_q),
            poses_t=np.concatenate(poses_t),
            smoothed_t=np.concatenate(smoothed_t),
            stats=stats,
            wall_time_s=wall,
            scans_per_sec=n / wall,
            high_rate_t=np.asarray(hr_t) if high_rate else None,
            high_rate_q=np.asarray(hr_q) if high_rate else None,
            high_rate_p=np.asarray(hr_p) if high_rate else None,
            high_rate_v=np.asarray(hr_v) if high_rate else None,
        )
