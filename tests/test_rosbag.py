"""rosbag2 (.db3) reader: CDR codec round trips and bag -> dataset loading.

The writer half exists so these tests exercise the real SQLite schema and
CDR byte layouts without a ROS installation (the reference consumes the
same recordings via ros2 bag play, readme.md:161-163)."""

import numpy as np
import pytest

from superodom_tpu.io import rosbag as rb


def _velodyne_cloud(stamp, n=64, rng=None):
    rng = rng or np.random.default_rng(0)
    pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    rec = np.zeros(n, np.dtype([
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("intensity", "<f4"),
        ("time", "<f4"), ("ring", "<u2"), ("_pad", "u2"),
    ]))
    rec["x"], rec["y"], rec["z"] = pts.T
    rec["intensity"] = rng.uniform(0, 255, n)
    rec["time"] = np.linspace(0, 0.1, n)
    rec["ring"] = np.arange(n) % 16
    fields = [
        rb.PointField("x", 0, 7, 1), rb.PointField("y", 4, 7, 1),
        rb.PointField("z", 8, 7, 1), rb.PointField("intensity", 12, 7, 1),
        rb.PointField("time", 16, 7, 1), rb.PointField("ring", 20, 4, 1),
    ]
    return rb.PointCloud2(stamp, "velodyne", 1, n, fields, False,
                          rec.itemsize, rec.itemsize * n, rec.tobytes(),
                          True), pts


def test_pointcloud2_cdr_roundtrip():
    msg, pts = _velodyne_cloud(12.345)
    out = rb.parse_pointcloud2(rb.encode_pointcloud2(msg))
    assert out.frame_id == "velodyne"
    assert abs(out.stamp - 12.345) < 1e-6
    assert out.width == msg.width and out.point_step == msg.point_step
    assert [f.name for f in out.fields] == [f.name for f in msg.fields]
    assert out.data == msg.data


def test_imu_cdr_roundtrip():
    msg = rb.ImuMsg(7.5, "imu", np.array([1.0, 0, 0, 0]),
                    np.array([0.1, -0.2, 0.3]), np.array([0.0, 0.0, 9.81]))
    out = rb.parse_imu(rb.encode_imu(msg))
    np.testing.assert_allclose(out.angular_velocity, msg.angular_velocity)
    np.testing.assert_allclose(out.linear_acceleration,
                               msg.linear_acceleration)
    np.testing.assert_allclose(out.orientation, msg.orientation)
    assert abs(out.stamp - 7.5) < 1e-6


def test_livox_cdr_roundtrip():
    rng = np.random.default_rng(1)
    n = 37
    msg = rb.LivoxCustomMsg(
        3.0, "livox", 3_000_000_000, rng.uniform(-5, 5, (n, 3)).astype(np.float32),
        (np.arange(n) * 10_000).astype(np.uint32),
        rng.integers(0, 255, n).astype(np.uint8),
        np.zeros(n, np.uint8), (np.arange(n) % 4).astype(np.uint8))
    out = rb.parse_livox_custom(rb.encode_livox_custom(msg))
    np.testing.assert_allclose(out.xyz, msg.xyz)
    np.testing.assert_array_equal(out.offset_time_ns, msg.offset_time_ns)
    np.testing.assert_array_equal(out.line, msg.line)
    assert out.timebase == msg.timebase


def test_odometry_cdr_roundtrip():
    msg = rb.OdometryMsg(2.0, "map", "base", np.array([0.9, 0.1, 0.2, 0.3]),
                         np.array([1.0, 2.0, 3.0]))
    out = rb.parse_odometry(rb.encode_odometry(msg))
    np.testing.assert_allclose(out.q_wxyz, msg.q_wxyz)
    np.testing.assert_allclose(out.t_xyz, msg.t_xyz)
    assert out.child_frame_id == "base"


def _write_velodyne_bag(path, n_scans=5, imu_rate=200.0):
    w = rb.Rosbag2Writer(str(path))
    w.add_topic("/velodyne_points", "sensor_msgs/msg/PointCloud2")
    w.add_topic("/imu/data", "sensor_msgs/msg/Imu")
    rng = np.random.default_rng(3)
    clouds = []
    for i in range(n_scans):
        t = 1.0 + i * 0.1
        msg, pts = _velodyne_cloud(t, n=128, rng=rng)
        clouds.append(pts)
        w.write("/velodyne_points", int(t * 1e9), rb.encode_pointcloud2(msg))
    n_imu = int((n_scans * 0.1 + 0.2) * imu_rate)
    for k in range(n_imu):
        t = 0.9 + k / imu_rate
        imu = rb.ImuMsg(t, "imu", np.array([1.0, 0, 0, 0]),
                        np.array([0.0, 0.0, 0.01]),
                        np.array([0.0, 0.0, 9.81]))
        w.write("/imu/data", int(t * 1e9), rb.encode_imu(imu))
    w.close()
    return clouds


def test_bag_reader_topics_and_messages(tmp_path):
    bag = tmp_path / "demo"
    _write_velodyne_bag(bag)
    r = rb.Rosbag2Reader(str(bag))
    topics = r.topics()
    assert topics["/velodyne_points"] == "sensor_msgs/msg/PointCloud2"
    assert topics["/imu/data"] == "sensor_msgs/msg/Imu"
    kinds = [typ for _, typ, _, _ in r.messages()]
    assert kinds.count("sensor_msgs/msg/PointCloud2") == 5
    assert kinds.count("sensor_msgs/msg/Imu") > 100


def test_load_bag_dataset(tmp_path):
    bag = tmp_path / "demo"
    clouds = _write_velodyne_bag(bag)
    ds = rb.load_bag_dataset(str(bag))
    assert len(ds.scans) == 5
    assert len(ds.imu.t) > 100
    s0 = ds.scans[0]
    assert abs(s0.t_start - 1.0) < 1e-6
    np.testing.assert_allclose(s0.xyz_body, clouds[0], atol=1e-5)
    assert s0.t_rel[0] <= s0.t_rel[-1]
    # IMU stream is time ordered and covers the scans
    assert ds.imu.t[0] < ds.scans[0].t_start
    assert ds.imu.t[-1] > ds.scans[-1].t_start


def test_load_bag_dataset_ouster_rotation(tmp_path):
    """Ouster clouds must be rotated into the sensor frame
    (parameter.cpp:271-277)."""
    from superodom_tpu.io.adapters import OUSTER_SENSOR_R, OUSTER_SENSOR_T

    n = 32
    rng = np.random.default_rng(5)
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    rec = np.zeros(n, np.dtype([
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("intensity", "<f4"),
        ("t", "<u4"), ("reflectivity", "<u2"), ("ring", "u1"), ("_p", "u1"),
    ]))
    rec["x"], rec["y"], rec["z"] = pts.T
    rec["t"] = np.linspace(0, 1e8, n).astype(np.uint32)
    rec["ring"] = np.arange(n) % 128
    fields = [
        rb.PointField("x", 0, 7, 1), rb.PointField("y", 4, 7, 1),
        rb.PointField("z", 8, 7, 1), rb.PointField("intensity", 12, 7, 1),
        rb.PointField("t", 16, 6, 1), rb.PointField("reflectivity", 20, 4, 1),
        rb.PointField("ring", 22, 2, 1),
    ]
    msg = rb.PointCloud2(2.0, "os_sensor", 1, n, fields, False,
                         rec.itemsize, rec.itemsize * n, rec.tobytes(), True)
    w = rb.Rosbag2Writer(str(tmp_path / "ouster"))
    w.add_topic("/os_cloud_node/points", "sensor_msgs/msg/PointCloud2")
    w.write("/os_cloud_node/points", int(2e9), rb.encode_pointcloud2(msg))
    w.close()
    ds = rb.load_bag_dataset(str(tmp_path / "ouster"))
    expect = pts @ OUSTER_SENSOR_R.T + OUSTER_SENSOR_T
    np.testing.assert_allclose(ds.scans[0].xyz_body, expect, atol=1e-5)
    assert abs(float(ds.scans[0].t_rel[-1]) - 0.1) < 1e-3


def test_load_bag_dataset_livox(tmp_path):
    rng = np.random.default_rng(6)
    n = 200
    msg = rb.LivoxCustomMsg(
        4.0, "livox", 4_000_000_000,
        rng.uniform(-5, 5, (n, 3)).astype(np.float32),
        (np.linspace(0, 1e8, n)).astype(np.uint32),
        np.zeros(n, np.uint8), np.zeros(n, np.uint8),
        (np.arange(n) % 4).astype(np.uint8))
    w = rb.Rosbag2Writer(str(tmp_path / "livox"))
    w.add_topic("/livox/lidar", "livox_ros_driver2/msg/CustomMsg")
    w.write("/livox/lidar", int(4e9), rb.encode_livox_custom(msg))
    w.close()
    ds = rb.load_bag_dataset(str(tmp_path / "livox"))
    assert len(ds.scans) == 1
    assert len(ds.scans[0].xyz_body) == n  # all tags pass the filter
    assert abs(ds.scans[0].t_start - 4.0) < 1e-9


def test_bag_end_to_end_replay(tmp_path):
    """A bag-built dataset runs through the odometry pipeline."""
    from superodom_tpu.config import (
        ImuConfig, MapConfig, PipelineConfig, RegistrationConfig, VLP_16,
    )
    import dataclasses

    from superodom_tpu.runner import OdometryRunner

    # structured world so registration has geometry to lock onto
    from superodom_tpu.io.datasets import BoxWorld, make_dataset

    rng = np.random.default_rng(11)
    sim = make_dataset(rng, n_scans=6, points_per_scan=2048,
                       world=BoxWorld(half_extent=np.array([10.0, 8.0, 4.0])),
                       radius=2.0)
    w = rb.Rosbag2Writer(str(tmp_path / "sim"))
    w.add_topic("/velodyne_points", "sensor_msgs/msg/PointCloud2")
    w.add_topic("/imu/data", "sensor_msgs/msg/Imu")
    for s in sim.scans:
        n = len(s.xyz_body)
        rec = np.zeros(n, np.dtype([
            ("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("time", "<f4"),
        ]))
        rec["x"], rec["y"], rec["z"] = s.xyz_body.T
        rec["time"] = s.t_rel
        fields = [rb.PointField("x", 0, 7, 1), rb.PointField("y", 4, 7, 1),
                  rb.PointField("z", 8, 7, 1), rb.PointField("time", 12, 7, 1)]
        msg = rb.PointCloud2(s.t_start, "velo", 1, n, fields, False, 16,
                             16 * n, rec.tobytes(), True)
        w.write("/velodyne_points", int(s.t_start * 1e9),
                rb.encode_pointcloud2(msg))
    for k in range(len(sim.imu.t)):
        imu = rb.ImuMsg(float(sim.imu.t[k]), "imu", np.array([1.0, 0, 0, 0]),
                        sim.imu.gyr[k], sim.imu.acc[k])
        w.write("/imu/data", int(sim.imu.t[k] * 1e9), rb.encode_imu(imu))
    w.close()

    ds = rb.load_bag_dataset(str(tmp_path / "sim"))
    cfg = PipelineConfig(
        sensor=dataclasses.replace(VLP_16, max_points=2048,
                                   max_surface_features=512),
        map=MapConfig(table_size=1 << 13, cell_capacity=16),
        registration=RegistrationConfig(),
        imu=ImuConfig(window_size=4),
        auto_voxel_size=False,
    )
    runner = OdometryRunner(cfg)
    res = runner.run_dataset(ds, use_imu=True, warmup=False)
    assert np.all(np.isfinite(res.poses_t))
    # trajectory should track the sim ground truth coarsely
    err = np.linalg.norm(res.poses_t - sim.gt_poses_t, axis=1)
    assert float(err.max()) < 1.0
