"""SO(3)/SE(3) primitives in JAX.

Quaternions are stored as ``(w, x, y, z)`` float arrays.  All functions are
pure jnp, shape-polymorphic over leading batch dimensions only via
``jax.vmap`` (no implicit broadcasting games), and f32-safe.

This replaces the reference's Eigen/Sophus/tf2 usage (reference
utils/Twist.h, LaserMapping/lidarOptimization.cpp:112-162 se3 exp,
utils/sophus_utils.hpp) with one closed-form implementation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# quaternion ops (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q*p."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so poses compare stably
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q. Shapes broadcast on the batch dims."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2*w*(u x v) + 2*(u x (u x v))
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion, branch-free (Shepperd's method via 4-way max)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # pick the numerically largest construction
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    return quat_normalize(q[..., 0, :])


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation with short-path selection and small-angle guard.

    ``t`` is a scalar or an array broadcastable against ``q0[..., 0]``.
    """
    t = jnp.asarray(t, dtype=q0.dtype)[..., None]
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.clip(jnp.abs(d), 0.0, 1.0 - 1e-7)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-4
    safe_sin = jnp.where(small, 1.0, sin_theta)
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / safe_sin)
    w1 = jnp.where(small, t, jnp.sin(t * theta) / safe_sin)
    return quat_normalize(w0 * q0 + w1 * q1)


def quat_from_rpy(roll, pitch, yaw) -> jnp.ndarray:
    """ZYX (yaw-pitch-roll) Euler angles to quaternion, matching tf2 setRPY."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def rpy_from_quat(q: jnp.ndarray):
    """Quaternion to (roll, pitch, yaw), matching tf2 Matrix3x3::getRPY solution 1."""
    R = quat_to_matrix(q)
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    roll = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    pitch = jnp.arctan2(-R[..., 2, 0], sy)
    yaw = jnp.where(singular, 0.0, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return roll, pitch, yaw


def quat_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of q: 2*atan2(|vec|, |w|) (reference LidarSlam.cpp:204)."""
    return 2.0 * jnp.arctan2(jnp.linalg.norm(q[..., 1:4], axis=-1), jnp.abs(q[..., 0]))


# ---------------------------------------------------------------------------
# so(3)/se(3) exponential maps
# ---------------------------------------------------------------------------


def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector -> quaternion (closed form, Taylor-guarded).

    Replaces Sophus::SO3d::exp (reference featureExtraction.cpp:580) and the
    quaternion branch of getTransformFromSe3 (lidarOptimization.cpp:112-135).
    """
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    # +tiny keeps the sqrt differentiable at 0 (d sqrt/dx at 0 is inf and
    # poisons autodiff tangents even through selected-away branches)
    theta = jnp.sqrt(theta_sq + 1e-24)
    half = 0.5 * theta
    small = theta_sq < 1e-10
    # sin(theta/2)/theta with Taylor fallback 0.5 - theta^2/48
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, theta),
    )
    real = jnp.cos(half)
    return jnp.concatenate([real, imag * omega], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> axis-angle vector."""
    q = quat_normalize(q)
    w = q[..., 0:1]
    v = q[..., 1:4]
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-24)
    angle = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / jnp.where(small, 1.0, n))
    return scale * v


def se3_exp(xi: jnp.ndarray):
    """se(3) twist [upsilon(3), omega(3)] -> (quat, trans).

    Matches getTransformFromSe3 (reference lidarOptimization.cpp:112-150):
    t = V(omega) @ upsilon with the standard left-Jacobian V.
    """
    ups = xi[..., 0:3]
    omega = xi[..., 3:6]
    q = so3_exp(omega)
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq + 1e-24)
    small = theta_sq < 1e-10
    Om = skew(omega)
    # Om^2 = w w^T - theta^2 I in closed form (full-precision; a matmul here
    # hits reduced-precision accumulation on some backends)
    Om2 = omega[..., :, None] * omega[..., None, :] - theta_sq[..., None] * jnp.eye(
        3, dtype=omega.dtype
    )
    a = jnp.where(small, 0.5, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    b = jnp.where(
        small,
        1.0 / 6.0,
        (theta - jnp.sin(theta)) / jnp.where(small, 1.0, theta_sq * theta),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), Om.shape)
    V = eye + a[..., None] * Om + b[..., None] * Om2
    t = jnp.einsum("...ij,...j->...i", V, ups)
    return q, t


# ---------------------------------------------------------------------------
# Pose (SE3 value type, replaces reference Twist<T>/Transformd, utils/Twist.h)
# ---------------------------------------------------------------------------


class Pose(NamedTuple):
    q: jnp.ndarray  # quaternion (w, x, y, z)
    t: jnp.ndarray  # translation (3,)

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(quat_identity(dtype), jnp.zeros(3, dtype=dtype))

    def compose(self, other: "Pose") -> "Pose":
        """self * other (apply other first, then self)."""
        return Pose(
            quat_normalize(quat_mul(self.q, other.q)),
            quat_rotate(self.q, other.t) + self.t,
        )

    def inverse(self) -> "Pose":
        qinv = quat_conj(self.q)
        return Pose(qinv, -quat_rotate(qinv, self.t))

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Transform points [..., 3]."""
        return quat_rotate(self.q, pts) + self.t

    def normalize(self) -> "Pose":
        return Pose(quat_normalize(self.q), self.t)


def pose_interpolate(p0: Pose, p1: Pose, alpha) -> Pose:
    """Slerp rotation + lerp translation (reference featureExtraction.cpp:269-275)."""
    return Pose(
        quat_slerp(p0.q, p1.q, alpha),
        (1.0 - alpha) * p0.t + alpha * p1.t,
    )


def pose_delta(a: Pose, b: Pose) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(translation norm, rotation angle) of a^-1 * b (reference LidarSlam.cpp:205-208)."""
    rel = a.inverse().compose(b)
    return jnp.linalg.norm(rel.t, axis=-1), quat_angle(rel.q)


def apply_se3_update(pose: Pose, xi: jnp.ndarray) -> Pose:
    """Left-multiplicative SE3 update: pose' = exp(xi) * pose.

    Same retraction family as the reference's PoseSE3Parameterization::Plus
    (lidarOptimization.cpp:83-99): q' = dq*q, t' = dq*t + dt with
    (dq, dt) = se3_exp(xi).
    """
    dq, dt = se3_exp(xi)
    return Pose(
        quat_normalize(quat_mul(dq, pose.q)),
        quat_rotate(dq, pose.t) + dt,
    )


def gravity_align_matrix(acc_mean: jnp.ndarray) -> jnp.ndarray:
    """Roll/pitch rotation whose *transpose* aligns the measured gravity
    direction with +Z (R^T @ acc_mean = (0, 0, |acc_mean|)).

    Mirrors Imu::calculatePitchRollMatrix (reference imu_data.h:45-69):
    R = R_x(phi) @ R_y(theta) with theta = atan2(ax, sqrt(ay^2+az^2)),
    phi = atan2(-ay, az).  The reference consumes it inverted:
    imu_laser_R_Gravity = R^-1 @ imu_laser_R (imu_data.h:144).
    """
    ax, ay, az = acc_mean[..., 0], acc_mean[..., 1], acc_mean[..., 2]
    theta = jnp.arctan2(ax, jnp.sqrt(ay * ay + az * az))
    phi = jnp.arctan2(-ay, az)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    zeros = jnp.zeros_like(ct)
    ones = jnp.ones_like(ct)
    R_y = jnp.stack(
        [
            jnp.stack([ct, zeros, st], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
            jnp.stack([-st, zeros, ct], axis=-1),
        ],
        axis=-2,
    )
    R_x = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros], axis=-1),
            jnp.stack([zeros, cp, -sp], axis=-1),
            jnp.stack([zeros, sp, cp], axis=-1),
        ],
        axis=-2,
    )
    return R_x @ R_y


# NamedTuples are native JAX pytrees; Pose needs no explicit registration.
