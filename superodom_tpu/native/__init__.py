"""ctypes bindings for the native host runtime (loader.cpp).

Builds the shared library on first import if the compiler is available;
every entry point has a NumPy fallback so the framework works without a
toolchain.  Use ``native.available()`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsuperodom_native.so")

FIELD_F32, FIELD_F64 = 0, 1
FIELD_I8, FIELD_U8, FIELD_I16, FIELD_U16, FIELD_I32, FIELD_U32 = 2, 3, 4, 5, 6, 7

_NP_TO_FIELD = {
    np.dtype("f4"): FIELD_F32, np.dtype("f8"): FIELD_F64,
    np.dtype("i1"): FIELD_I8, np.dtype("u1"): FIELD_U8,
    np.dtype("i2"): FIELD_I16, np.dtype("u2"): FIELD_U16,
    np.dtype("i4"): FIELD_I32, np.dtype("u4"): FIELD_U32,
}

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR], check=True, capture_output=True
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i64, i32, f32p, f64, u8p = (
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8),
    )
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)

    lib.so_decode_points.restype = i64
    lib.so_decode_points.argtypes = [u8p, i64, i64, i64p, i32p, f64,
                                     f32p, f32p, i32p, f32p]
    lib.so_synth_ring_time.restype = i64
    lib.so_synth_ring_time.argtypes = [f32p, i64, i32, f64, f64,
                                       f32p, f32p, i32p]
    lib.so_imu_buffer_new.restype = ctypes.c_void_p
    lib.so_imu_buffer_new.argtypes = [i64]
    lib.so_imu_buffer_free.argtypes = [ctypes.c_void_p]
    lib.so_imu_buffer_set_conditioning.argtypes = [ctypes.c_void_p, f64p,
                                                   f64p, f64]
    lib.so_imu_buffer_add.argtypes = [ctypes.c_void_p, f64, f32p, f32p]
    lib.so_imu_buffer_static_init.restype = i32
    lib.so_imu_buffer_static_init.argtypes = [ctypes.c_void_p, f64, f64p]
    lib.so_imu_buffer_size.restype = i64
    lib.so_imu_buffer_size.argtypes = [ctypes.c_void_p]
    lib.so_imu_buffer_sync.restype = i32
    lib.so_imu_buffer_sync.argtypes = [ctypes.c_void_p, f64, f64]
    lib.so_imu_buffer_window.restype = i64
    lib.so_imu_buffer_window.argtypes = [ctypes.c_void_p, f64, f64, i64,
                                         f64p, f32p, f32p, f32p]
    lib.so_imu_buffer_clean.argtypes = [ctypes.c_void_p, f64]
    lib.so_voxel_downsample.restype = i64
    lib.so_voxel_downsample.argtypes = [f32p, i64, f64, f32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_points(
    data: bytes | np.ndarray,
    n: int,
    stride: int,
    layout: dict,
    time_scale: float = 1.0,
):
    """Decode packed point records (PointCloud2-style layouts).

    ``layout`` maps field name -> (byte offset, numpy dtype) for any of
    x, y, z, time, ring, intensity; x/y/z are required.
    Returns (xyz f32[m,3], t f32[m], ring i32[m], intensity f32[m]).
    """
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(
        data, np.ndarray) else data.view(np.uint8).reshape(-1)
    names = ["x", "y", "z", "time", "ring", "intensity"]
    offsets = np.array(
        [layout.get(k, (-1, np.dtype("f4")))[0] for k in names], np.int64
    )
    types = np.array(
        [_NP_TO_FIELD[np.dtype(layout.get(k, (0, np.dtype("f4")))[1])]
         for k in names],
        np.int32,
    )
    lib = _load()
    xyz = np.empty((n, 3), np.float32)
    t = np.empty(n, np.float32)
    ring = np.empty(n, np.int32)
    inten = np.empty(n, np.float32)
    if lib is not None:
        m = lib.so_decode_points(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, stride,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            time_scale, _fp(xyz), _fp(t),
            ring.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _fp(inten),
        )
        return xyz[:m], t[:m], ring[:m], inten[:m]
    # NumPy fallback via strided views over the raw buffer
    def field(k, default=0.0, out_dtype=np.float32):
        if k not in layout:
            return np.full(n, default, out_dtype)
        off, dt = layout[k]
        dt = np.dtype(dt)
        v = np.ndarray(shape=(n,), dtype=dt, buffer=buf.tobytes(),
                       offset=off, strides=(stride,))
        return v.astype(out_dtype)

    x, y, z = field("x"), field("y"), field("z")
    ok = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    xyz = np.stack([x, y, z], -1)[ok]
    tt = (field("time", 0.0, np.float64) * time_scale).astype(np.float32)[ok]
    rr = field("ring", 0, np.float64).astype(np.int32)[ok]
    ii = field("intensity", 0.0)[ok]
    return xyz, tt, rr, ii


def synth_ring_time(xyz: np.ndarray, n_scan_lines: int,
                    column_time: float, laser_time: float):
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    if lib is not None:
        xo = np.empty((n, 3), np.float32)
        to = np.empty(n, np.float32)
        ro = np.empty(n, np.int32)
        m = lib.so_synth_ring_time(
            _fp(xyz), n, n_scan_lines, column_time, laser_time,
            _fp(xo), _fp(to), ro.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return xo[:m], to[:m], ro[:m]
    from superodom_tpu.io.adapters import _synthesize_ring_time

    raw = _synthesize_ring_time(xyz, np.zeros(n, np.float32), n_scan_lines)
    return raw.xyz, raw.t_rel, raw.ring


def voxel_downsample(xyz: np.ndarray, res: float) -> np.ndarray:
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    if lib is not None:
        out = np.empty((n, 3), np.float32)
        m = lib.so_voxel_downsample(_fp(xyz), n, res, _fp(out))
        return out[:m].copy()
    # numpy fallback: centroid per voxel via dict
    keys = np.floor(xyz / res).astype(np.int64)
    _, inv, cnt = np.unique(keys, axis=0, return_inverse=True,
                            return_counts=True)
    sums = np.zeros((len(cnt), 3), np.float64)
    np.add.at(sums, inv, xyz)
    return (sums / cnt[:, None]).astype(np.float32)


def _np_quat_mul(q, p):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = p
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], np.float64)


def _np_so3_expq(w):
    theta = float(np.linalg.norm(w))
    if theta < 1e-12:
        q = np.array([1.0, 0.5 * w[0], 0.5 * w[1], 0.5 * w[2]], np.float64)
    else:
        s = np.sin(theta / 2.0) / theta
        q = np.array([np.cos(theta / 2.0), s * w[0], s * w[1], s * w[2]],
                     np.float64)
    return q / np.linalg.norm(q)


def _np_quat_from_matrix(R):
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        q = np.array([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                      (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        q = np.array([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                      0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        q = np.array([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                      (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    return q / np.linalg.norm(q)


class ImuBuffer:
    """Time-indexed bounded IMU buffer with raw-sample conditioning, gyro
    orientation chain, static initialization and scan synchronization.

    One native unit covering the reference's MapRingBuffer<Imu> +
    imuConverter (gravity/extrinsic rotation + lever-arm transport,
    imuPreintegration.cpp:486-541) + updateImuOrientation
    (featureExtraction.cpp:574-583) + Imu::imuInit (imu_data.h:71-160).
    The NumPy fallback mirrors the C++ semantics exactly.
    """

    def __init__(self, capacity: int = 4096, R_imu_laser=None,
                 t_imu_laser=None, imu_rate: float = 200.0):
        self._lib = _load()
        self._cap = capacity
        self._rate = imu_rate
        self.initialized = False
        if self._lib is not None:
            self._h = self._lib.so_imu_buffer_new(capacity)
            if R_imu_laser is not None or t_imu_laser is not None:
                R = np.eye(3) if R_imu_laser is None else np.asarray(
                    R_imu_laser, np.float64)
                R_li = np.ascontiguousarray(R.T)  # imu -> laser
                t = np.ascontiguousarray(
                    np.zeros(3) if t_imu_laser is None
                    else np.asarray(t_imu_laser, np.float64))
                self._lib.so_imu_buffer_set_conditioning(
                    self._h,
                    R_li.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    imu_rate,
                )
            return
        # NumPy fallback state
        self._t: list = []
        self._acc: list = []
        self._gyr: list = []
        self._q: list = []
        R = np.eye(3) if R_imu_laser is None else np.asarray(
            R_imu_laser, np.float64)
        self._R_li = R.T
        self._t_il = (np.zeros(3) if t_imu_laser is None
                      else np.asarray(t_imu_laser, np.float64))
        self._condition = R_imu_laser is not None or t_imu_laser is not None
        self._prev_raw_gyr = None
        self._q_last = np.array([1.0, 0, 0, 0])
        self._gyr_last = np.zeros(3)
        self._t_last = -1.0
        self._bias = np.zeros(3)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.so_imu_buffer_free(self._h)
            self._h = None

    def _np_chain_step(self, t, gyr_c):
        dt = 1.0 / self._rate if self._t_last < 0 else t - self._t_last
        dt = min(max(dt, 0.0), 0.5)
        dq = _np_so3_expq(dt * 0.5 * (gyr_c + self._gyr_last))
        q = _np_quat_mul(self._q_last, dq)
        self._q_last = q / np.linalg.norm(q)
        self._gyr_last = np.asarray(gyr_c, np.float64)
        self._t_last = t
        return self._q_last.copy()

    def add(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        acc = np.ascontiguousarray(acc, np.float32)
        gyr = np.ascontiguousarray(gyr, np.float32)
        if self._lib is not None:
            self._lib.so_imu_buffer_add(self._h, t, _fp(acc), _fp(gyr))
            return
        a = np.asarray(acc, np.float64)
        w = np.asarray(gyr, np.float64)
        if self._condition:
            alpha = (np.zeros(3) if self._prev_raw_gyr is None
                     else (w - self._prev_raw_gyr) * self._rate)
            self._prev_raw_gyr = w.copy()
            a = a + np.cross(alpha, self._t_il) + np.cross(
                w, np.cross(w, self._t_il))
            a = self._R_li @ a
            w = self._R_li @ w
        w = w - self._bias
        q = self._np_chain_step(t, w)
        self._t.append(t)
        self._acc.append(a.astype(np.float32))
        self._gyr.append(w.astype(np.float32))
        self._q.append(q.astype(np.float32))
        if len(self._t) > self._cap:
            del self._t[0], self._acc[0], self._gyr[0], self._q[0]

    def static_init(self, window_sec: float = 1.0):
        """Gravity/bias initialization over the first ``window_sec`` of
        samples.  Returns (acc_mean, gyr_bias, q0_wxyz) or None if there is
        not enough data yet."""
        if self._lib is not None:
            out = np.zeros(10, np.float64)
            ok = self._lib.so_imu_buffer_static_init(
                self._h, window_sec,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            if not ok:
                return None
            self.initialized = True
            return out[:3], out[3:6], out[6:10]
        if len(self._t) < 10:
            return None
        ts = np.asarray(self._t)
        n = int(np.searchsorted(ts, ts[0] + window_sec, "right"))
        if n < 10:
            return None
        acc_mean = np.mean(np.asarray(self._acc[:n], np.float64), axis=0)
        gyr_mean = np.mean(np.asarray(self._gyr[:n], np.float64), axis=0)
        theta = np.arctan2(acc_mean[0], np.hypot(acc_mean[1], acc_mean[2]))
        phi = np.arctan2(-acc_mean[1], acc_mean[2])
        ct, st_ = np.cos(theta), np.sin(theta)
        cp, sp = np.cos(phi), np.sin(phi)
        Ry = np.array([[ct, 0, st_], [0, 1, 0], [-st_, 0, ct]])
        Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        q0 = _np_quat_from_matrix((Rx @ Ry).T)
        self._bias = self._bias + gyr_mean
        self._q_last = q0.copy()
        self._gyr_last = np.zeros(3)
        self._t_last = -1.0
        for i in range(len(self._t)):
            self._gyr[i] = (self._gyr[i] - gyr_mean).astype(np.float32)
            self._q[i] = self._np_chain_step(
                self._t[i], np.asarray(self._gyr[i], np.float64)
            ).astype(np.float32)
        self.initialized = True
        return acc_mean, gyr_mean, q0

    def __len__(self):
        if self._lib is not None:
            return int(self._lib.so_imu_buffer_size(self._h))
        return len(self._t)

    def sync(self, t0: float, t1: float) -> int:
        """1 = covered, 0 = wait for more IMU, -1 = scan predates buffer."""
        if self._lib is not None:
            return int(self._lib.so_imu_buffer_sync(self._h, t0, t1))
        if not self._t:
            return 0
        if self._t[0] > t0:
            return -1
        if self._t[-1] <= t1:
            return 0
        return 1

    def window(self, t0: float, t1: float, max_out: int
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Samples covering [t0, t1] (one before, one after), evenly
        decimated to max_out.  Returns (t, acc, gyr, q_wxyz)."""
        if self._lib is not None:
            t = np.empty(max_out, np.float64)
            acc = np.empty((max_out, 3), np.float32)
            gyr = np.empty((max_out, 3), np.float32)
            q = np.empty((max_out, 4), np.float32)
            m = self._lib.so_imu_buffer_window(
                self._h, t0, t1, max_out,
                t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                _fp(acc), _fp(gyr), _fp(q),
            )
            return t[:m], acc[:m], gyr[:m], q[:m]
        ts = np.asarray(self._t)
        if len(ts) == 0:
            z = np.zeros((0,))
            return z, z.reshape(0, 3), z.reshape(0, 3), z.reshape(0, 4)
        lo = max(int(np.searchsorted(ts, t0, "right")) - 1, 0)
        hi = min(int(np.searchsorted(ts, t1, "right")) + 1, len(ts))
        idx = np.arange(lo, hi)
        if len(idx) > max_out:
            idx = idx[np.linspace(0, len(idx) - 1, max_out).astype(int)]
        return (
            ts[idx],
            np.asarray(self._acc)[idx],
            np.asarray(self._gyr)[idx],
            np.asarray(self._q)[idx],
        )

    def clean(self, t: float):
        if self._lib is not None:
            self._lib.so_imu_buffer_clean(self._h, t)
        else:
            k = int(np.searchsorted(np.asarray(self._t), t, "left"))
            del self._t[:k], self._acc[:k], self._gyr[:k], self._q[:k]
