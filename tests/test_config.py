import textwrap

from superodom_tpu.config import load_yaml_config, profile_by_name


def test_profile_lookup():
    assert profile_by_name("vlp_16").n_scan_lines == 16
    assert profile_by_name("os1_128").max_points == 131072
    assert profile_by_name("livox").max_surface_features == 4096


def test_load_reference_style_yaml(tmp_path):
    """The loader accepts the reference's config schema
    (config/vlp_16.yaml layout) so existing configs carry over."""
    y = textwrap.dedent(
        """
        /**:
          ros__parameters:
            imu_topic: "/imu/data"
            laser_topic: "/points"
            sensor: "velodyne"
            feature_extraction_node:
                scan_line: 32
                min_range: 0.5
                filter_point_size: 4
            laser_mapping_node:
                mapping_line_resolution: 0.2
                mapping_plane_resolution: 0.4
                max_iterations: 3
                max_surface_features: 1500
                localization_mode: true
                init_x: 1.0
                init_y: 2.0
                init_z: 3.0
                init_yaw: 0.5
            imu_preintegration_node:
                lidar_correction_noise: 0.02
                acc_n: 0.004
                gyr_n: 0.002
                g_norm: 9.81
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(y)
    cfg = load_yaml_config(str(p))
    assert cfg.sensor.n_scan_lines == 32
    assert cfg.sensor.min_range == 0.5
    assert cfg.sensor.filter_point_size == 4
    assert cfg.sensor.default_plane_res == 0.4
    assert cfg.sensor.max_surface_features == 1500
    assert cfg.registration.max_icp_iters == 3
    assert cfg.imu.lidar_correction_noise == 0.02
    assert cfg.imu.gravity == 9.81
    assert cfg.localization.enabled
    assert cfg.localization.init_pose_xyz == (1.0, 2.0, 3.0)
    assert cfg.localization.init_pose_rpy[2] == 0.5


def test_load_calibration_direct(tmp_path):
    """Reference-schema calibration YAML (config/velodyne/
    vlp_16_calibration.yaml layout, parsed as parameter.cpp:118-234):
    OpenCV-matrix nodes, RPY offset in degrees composed on the left."""
    import numpy as np

    from superodom_tpu.config import load_calibration

    y = """%YAML:1.0

#Rotation from laser frame to imu frame, imu^R_laser
extrinsicRotation_imu_laser: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [0., -1., 0.,
         1., 0., 0.,
         0., 0., 1.]

extrinsicTranslation_imu_laser: !!opencv-matrix
  rows: 3
  cols: 1
  dt: d
  data: [0.080, 0.029, 0.030]

imu_laser_rotation_offset: !!opencv-matrix
  rows: 3
  cols: 1
  dt: d
  data: [0.0, 90.0, 0.0]

yaw_ratio: 0.25
"""
    p = tmp_path / "calib.yaml"
    p.write_text(y)
    extr, yaw_ratio = load_calibration(str(p))
    assert yaw_ratio == 0.25
    np.testing.assert_allclose(extr.t(), [0.080, 0.029, 0.030], atol=1e-7)
    # offset pitch 90 deg: R = Ry(90) @ R_base
    base = np.array([[0., -1., 0.], [1., 0., 0.], [0., 0., 1.]])
    ry90 = np.array([[0., 0., 1.], [0., 1., 0.], [-1., 0., 0.]])
    np.testing.assert_allclose(extr.R(), ry90 @ base, atol=1e-6)


def test_load_calibration_camera_composition(tmp_path):
    """PROVIDE_IMU_LASER_EXTRINSIC=false path: imu<-cam o cam<-laser
    (parameter.cpp:237-260)."""
    import numpy as np

    from superodom_tpu.config import load_calibration

    y = """%YAML:1.0
extrinsicRotation_camera_laser: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [0., 0., 1.,
         -1., 0., 0.,
         0., -1., 0.]
extrinsicTranslation_camera_laser: !!opencv-matrix
  rows: 3
  cols: 1
  dt: d
  data: [0.1, 0.0, 0.0]
extrinsicRotation_imu_camera: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [1., 0., 0.,
         0., 0., -1.,
         0., 1., 0.]
extrinsicTranslation_imu_camera: !!opencv-matrix
  rows: 3
  cols: 1
  dt: d
  data: [0.0, 0.2, 0.0]
"""
    p = tmp_path / "calib_cam.yaml"
    p.write_text(y)
    extr, _ = load_calibration(str(p), provide_imu_laser_extrinsic=False)
    R_cl = np.array([[0., 0., 1.], [-1., 0., 0.], [0., -1., 0.]])
    R_ic = np.array([[1., 0., 0.], [0., 0., -1.], [0., 1., 0.]])
    np.testing.assert_allclose(extr.R(), R_ic @ R_cl, atol=1e-6)
    np.testing.assert_allclose(
        extr.t(), R_ic @ np.array([0.1, 0.0, 0.0]) + np.array([0.0, 0.2, 0.0]),
        atol=1e-6)


def test_yaml_config_wires_calibration(tmp_path):
    """A config YAML naming a calibration_file populates extrinsics and
    yaw_ratio end-to-end (the reference wires this via launch parameters)."""
    import numpy as np
    import textwrap as tw

    from superodom_tpu.config import load_yaml_config

    (tmp_path / "calib.yaml").write_text("""%YAML:1.0
extrinsicRotation_imu_laser: !!opencv-matrix
  rows: 3
  cols: 3
  dt: d
  data: [1., 0., 0., 0., 1., 0., 0., 0., 1.]
extrinsicTranslation_imu_laser: !!opencv-matrix
  rows: 3
  cols: 1
  dt: d
  data: [0.05, 0.0, -0.02]
yaw_ratio: 0.1
""")
    (tmp_path / "cfg.yaml").write_text(tw.dedent("""
        /**:
          ros__parameters:
            sensor: "velodyne"
            calibration_file: "calib.yaml"
            laser_mapping_node:
                use_imu_roll_pitch: true
        """))
    cfg = load_yaml_config(str(tmp_path / "cfg.yaml"))
    np.testing.assert_allclose(cfg.extrinsics.t(), [0.05, 0.0, -0.02],
                               atol=1e-7)
    assert cfg.registration.yaw_ratio == 0.1
    assert cfg.use_imu_roll_pitch
