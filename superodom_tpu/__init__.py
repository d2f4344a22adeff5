"""superodom_tpu — TPU-native LiDAR-inertial odometry framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SuperOdometry
(reference: superxslam/SuperOdom, ROS 2 / C++ / Ceres / GTSAM / PCL), designed
TPU-first:

  * fixed-size masked point arrays instead of PCL clouds,
  * a voxel-hash local map with vectorized 27-cell KNN gather instead of
    per-block octrees (reference LocalMap.h),
  * batched Gauss-Newton with robust Tukey weights reducing to an on-chip
    6x6 normal-equation solve instead of Ceres (reference LidarSlam.cpp),
  * lax.scan IMU preintegration + a small dense sliding-window smoother
    instead of GTSAM ISAM2 (reference imuPreintegration.cpp),
  * one jitted pure function ``step(state, scan, imu_window) -> state'``
    instead of three ROS 2 processes.
"""

__version__ = "0.1.0"

import jax as _jax

# Estimator math is small dense contractions (3x3 PCA scatter, 6x6 normal
# equations); reduced-precision matmul accumulation (bf16_3x on TPU) costs
# real pose accuracy there and buys nothing — the hot path is gathers.
_jax.config.update("jax_default_matmul_precision", "highest")

from superodom_tpu.config import (  # noqa: F401
    PipelineConfig,
    SensorProfile,
    OS1_128,
    VLP_16,
    LIVOX_MID360,
)
