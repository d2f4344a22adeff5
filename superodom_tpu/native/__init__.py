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
    lib.so_imu_buffer_add.argtypes = [ctypes.c_void_p, f64, f32p, f32p]
    lib.so_imu_buffer_size.restype = i64
    lib.so_imu_buffer_size.argtypes = [ctypes.c_void_p]
    lib.so_imu_buffer_sync.restype = i32
    lib.so_imu_buffer_sync.argtypes = [ctypes.c_void_p, f64, f64]
    lib.so_imu_buffer_window.restype = i64
    lib.so_imu_buffer_window.argtypes = [ctypes.c_void_p, f64, f64, i64,
                                         f64p, f32p, f32p]
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


class ImuBuffer:
    """Time-indexed bounded IMU buffer with scan synchronization (native
    MapRingBuffer equivalent; NumPy fallback keeps semantics)."""

    def __init__(self, capacity: int = 4096):
        self._lib = _load()
        self._cap = capacity
        if self._lib is not None:
            self._h = self._lib.so_imu_buffer_new(capacity)
        else:
            self._t: list = []
            self._acc: list = []
            self._gyr: list = []

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.so_imu_buffer_free(self._h)
            self._h = None

    def add(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        acc = np.ascontiguousarray(acc, np.float32)
        gyr = np.ascontiguousarray(gyr, np.float32)
        if self._lib is not None:
            self._lib.so_imu_buffer_add(self._h, t, _fp(acc), _fp(gyr))
        else:
            self._t.append(t)
            self._acc.append(acc)
            self._gyr.append(gyr)
            if len(self._t) > self._cap:
                del self._t[0], self._acc[0], self._gyr[0]

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
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self._lib is not None:
            t = np.empty(max_out, np.float64)
            acc = np.empty((max_out, 3), np.float32)
            gyr = np.empty((max_out, 3), np.float32)
            m = self._lib.so_imu_buffer_window(
                self._h, t0, t1, max_out,
                t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                _fp(acc), _fp(gyr),
            )
            return t[:m], acc[:m], gyr[:m]
        ts = np.asarray(self._t)
        lo = max(int(np.searchsorted(ts, t0, "right")) - 1, 0)
        hi = min(int(np.searchsorted(ts, t1, "right")) + 1, len(ts))
        idx = np.arange(lo, hi)
        if len(idx) > max_out:
            idx = idx[np.linspace(0, len(idx) - 1, max_out).astype(int)]
        return (
            ts[idx],
            np.asarray(self._acc)[idx],
            np.asarray(self._gyr)[idx],
        )

    def clean(self, t: float):
        if self._lib is not None:
            self._lib.so_imu_buffer_clean(self._h, t)
        else:
            k = int(np.searchsorted(np.asarray(self._t), t, "left"))
            del self._t[:k], self._acc[:k], self._gyr[:k]
