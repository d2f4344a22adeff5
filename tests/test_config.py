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
