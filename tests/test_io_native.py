import numpy as np
import pytest

from superodom_tpu.io import adapters, pcd
from superodom_tpu import native


def test_native_library_builds():
    assert native.available(), "native loader must compile on this image"


def make_packed_ouster(rng, n=500):
    """Pack records like an Ouster PointCloud2: x,y,z f32 @0,4,8;
    t u32 ns @16; reflectivity u16 @24; ring u8 @26; stride 32."""
    stride = 32
    buf = np.zeros(n * stride, np.uint8)
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    t = (rng.uniform(0, 0.1, n) * 1e9).astype(np.uint32)
    ring = rng.integers(0, 128, n).astype(np.uint8)
    refl = rng.integers(0, 1000, n).astype(np.uint16)
    for i in range(n):
        rec = buf[i * stride:(i + 1) * stride]
        rec[0:12] = np.frombuffer(xyz[i].tobytes(), np.uint8)
        rec[16:20] = np.frombuffer(t[i].tobytes(), np.uint8)
        rec[24:26] = np.frombuffer(refl[i].tobytes(), np.uint8)
        rec[26:27] = np.frombuffer(ring[i].tobytes(), np.uint8)
    return buf, stride, xyz, t, ring, refl


def test_decode_points_native(rng):
    buf, stride, xyz, t, ring, refl = make_packed_ouster(rng)
    layout = {
        "x": (0, "f4"), "y": (4, "f4"), "z": (8, "f4"),
        "time": (16, "u4"), "ring": (26, "u1"), "intensity": (24, "u2"),
    }
    oxyz, ot, oring, oint = native.decode_points(
        buf, len(xyz), stride, layout, time_scale=1e-9)
    np.testing.assert_allclose(oxyz, xyz, atol=1e-6)
    np.testing.assert_allclose(ot, t.astype(np.float64) * 1e-9, atol=1e-6)
    np.testing.assert_array_equal(oring, ring.astype(np.int32))
    np.testing.assert_allclose(oint, refl.astype(np.float32))


def test_decode_points_drops_nonfinite(rng):
    buf, stride, xyz, *_ = make_packed_ouster(rng, 10)
    # poison record 3's x
    buf[3 * stride:3 * stride + 4] = np.frombuffer(np.float32(np.nan).tobytes(), np.uint8)
    layout = {"x": (0, "f4"), "y": (4, "f4"), "z": (8, "f4")}
    oxyz, *_ = native.decode_points(buf, 10, stride, layout)
    assert len(oxyz) == 9


def test_synth_ring_time_matches_numpy(rng):
    xyz = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
    xo, to, ro = native.synth_ring_time(
        xyz, 16, adapters.COLUMN_TIME, adapters.LASER_TIME)
    ref = adapters._synthesize_ring_time(xyz, np.zeros(2000, np.float32), 16)
    assert len(xo) == len(ref.xyz)
    np.testing.assert_allclose(xo, ref.xyz, atol=1e-6)
    np.testing.assert_array_equal(ro, ref.ring)
    np.testing.assert_allclose(to, ref.t_rel, atol=1e-7)


def test_native_voxel_downsample(rng):
    xyz = rng.uniform(-5, 5, (5000, 3)).astype(np.float32)
    out = native.voxel_downsample(xyz, 1.0)
    keys = set(map(tuple, np.floor(xyz / 1.0).astype(int)))
    assert len(out) == len(keys)
    got = set(map(tuple, np.floor(out / 1.0).astype(int)))
    assert got == keys


def test_imu_buffer_sync_and_window(rng):
    buf = native.ImuBuffer(capacity=256)
    for i in range(100):
        t = i * 0.005
        buf.add(t, np.full(3, float(i), np.float32),
                np.full(3, -float(i), np.float32))
    assert len(buf) == 100
    # scan span covered
    assert buf.sync(0.1, 0.2) == 1
    # scan extends beyond latest imu -> wait
    assert buf.sync(0.4, 0.6) == 0
    # scan older than buffer start after clean -> drop
    buf.clean(0.2)
    assert buf.sync(0.0, 0.1) == -1
    t, acc, gyr, q = buf.window(0.25, 0.35, 64)
    assert t[0] <= 0.25 and t[-1] > 0.35
    assert np.all(np.diff(t) > 0)
    np.testing.assert_allclose(acc[:, 0], t / 0.005, atol=1e-5)


def test_imu_buffer_window_decimation():
    buf = native.ImuBuffer(capacity=1024)
    for i in range(400):
        buf.add(i * 0.001, np.zeros(3, np.float32), np.zeros(3, np.float32))
    t, acc, gyr, q = buf.window(0.0, 0.4, 32)
    assert len(t) == 32
    assert np.all(np.diff(t) > 0)


def test_adapters_livox_tag_filter(rng):
    n = 100
    xyz = rng.uniform(-5, 5, (n, 3))
    tag = np.zeros(n, np.uint8)
    tag[50:] = 0x20  # multi-return: filtered out
    raw = adapters.from_livox(
        xyz, np.arange(n) * 1e6, np.zeros(n, np.int32), tag)
    assert len(raw.xyz) == 50


def test_adapters_ouster_frame(rng):
    xyz = np.array([[1.0, 2.0, 3.0]], np.float32)
    raw = adapters.from_ouster(xyz, np.array([5e8]))
    np.testing.assert_allclose(raw.xyz[0], [-1.0, -2.0, 3.036180], atol=1e-6)
    np.testing.assert_allclose(raw.t_rel[0], 0.5, atol=1e-6)


def test_pcd_roundtrip(tmp_path, rng):
    xyz = rng.uniform(-10, 10, (1000, 3)).astype(np.float32)
    p1 = tmp_path / "a.pcd"
    pcd.write_pcd(str(p1), xyz, binary=True)
    back = pcd.read_pcd(str(p1))
    np.testing.assert_allclose(back, xyz, atol=1e-6)
    p2 = tmp_path / "b.pcd"
    pcd.write_pcd(str(p2), xyz[:50], binary=False)
    back2 = pcd.read_pcd(str(p2))
    np.testing.assert_allclose(back2, xyz[:50], atol=1e-5)


def test_pose_file_roundtrip(tmp_path):
    recs = [pcd.OdometryRecord(1, 2, 3, 0.1, 0.2, 0.3),
            pcd.OdometryRecord(4, 5, 6, -0.1, -0.2, -0.3)]
    p = tmp_path / "poses.txt"
    pcd.write_pose_file(str(p), recs)
    back = pcd.read_pose_file(str(p))
    assert len(back) == 2
    np.testing.assert_allclose(back[0], recs[0], atol=1e-6)
