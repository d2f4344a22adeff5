import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superodom_tpu import geometry as geo


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(geo.quat_normalize(jnp.asarray(q)))


def test_quat_mul_matches_matrix(rng):
    q1 = random_quat(rng)
    q2 = random_quat(rng)
    R1 = np.asarray(geo.quat_to_matrix(jnp.asarray(q1)))
    R2 = np.asarray(geo.quat_to_matrix(jnp.asarray(q2)))
    q12 = geo.quat_mul(jnp.asarray(q1), jnp.asarray(q2))
    R12 = np.asarray(geo.quat_to_matrix(q12))
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng)
    v = rng.normal(size=(10, 3)).astype(np.float32)
    R = np.asarray(geo.quat_to_matrix(jnp.asarray(q)))
    out = np.asarray(geo.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, v @ R.T, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    for _ in range(20):
        q = random_quat(rng)
        R = geo.quat_to_matrix(jnp.asarray(q))
        q2 = np.asarray(geo.matrix_to_quat(R))
        # same rotation up to sign; quat_normalize canonicalizes w>=0
        qn = np.asarray(geo.quat_normalize(jnp.asarray(q)))
        np.testing.assert_allclose(np.abs(q2 @ qn), 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(50, 3)).astype(np.float32) * 0.5
    q = geo.so3_exp(jnp.asarray(w))
    w2 = np.asarray(geo.so3_log(q))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([1e-9, 0.0, 0.0], dtype=jnp.float32)
    q = geo.so3_exp(w)
    np.testing.assert_allclose(np.asarray(q), [1, 5e-10, 0, 0], atol=1e-7)


def test_se3_exp_matches_reference_form():
    # pure translation
    xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0], dtype=jnp.float32)
    q, t = geo.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(t), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-6)
    # rotation about z by pi/2 with unit x translation:
    # t = V @ ups with V the left Jacobian of SO(3)
    xi = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2], dtype=jnp.float32)
    q, t = geo.se3_exp(xi)
    theta = np.pi / 2
    V = np.array(
        [
            [np.sin(theta) / theta, -(1 - np.cos(theta)) / theta, 0],
            [(1 - np.cos(theta)) / theta, np.sin(theta) / theta, 0],
            [0, 0, 1],
        ]
    )
    np.testing.assert_allclose(np.asarray(t), V @ np.array([1, 0, 0]), atol=1e-5)


def test_pose_compose_inverse(rng):
    pa = geo.Pose(jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    pb = geo.Pose(jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    pts = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
    ab = pa.compose(pb)
    np.testing.assert_allclose(
        np.asarray(ab.apply(pts)), np.asarray(pa.apply(pb.apply(pts))), atol=1e-5
    )
    ident = pa.compose(pa.inverse())
    np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-5)
    np.testing.assert_allclose(abs(np.asarray(ident.q)[0]), 1.0, atol=1e-5)


def test_rpy_roundtrip():
    rpy = (0.3, -0.2, 1.1)
    q = geo.quat_from_rpy(*[jnp.float32(v) for v in rpy])
    out = geo.rpy_from_quat(q)
    np.testing.assert_allclose([float(v) for v in out], rpy, atol=1e-5)


def test_slerp_endpoints_and_midpoint(rng):
    q0 = jnp.asarray(random_quat(rng))
    q1 = geo.quat_mul(q0, geo.so3_exp(jnp.array([0.0, 0.0, 0.5], jnp.float32)))
    np.testing.assert_allclose(
        np.abs(np.asarray(geo.quat_slerp(q0, q1, 0.0)) @ np.asarray(q0)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.abs(np.asarray(geo.quat_slerp(q0, q1, 1.0)) @ np.asarray(q1)), 1.0, atol=1e-5
    )
    qm = geo.quat_slerp(q0, q1, 0.5)
    expected = geo.quat_mul(q0, geo.so3_exp(jnp.array([0.0, 0.0, 0.25], jnp.float32)))
    np.testing.assert_allclose(
        np.abs(np.asarray(qm) @ np.asarray(expected)), 1.0, atol=1e-5
    )


def test_apply_se3_update_matches_reference_plus(rng):
    """pose' = exp(xi) * pose with q' = dq*q, t' = dq*t + dt
    (reference PoseSE3Parameterization::Plus, lidarOptimization.cpp:83-99)."""
    pose = geo.Pose(jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32)))
    xi = jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1)
    out = geo.apply_se3_update(pose, xi)
    dq, dt = geo.se3_exp(xi)
    np.testing.assert_allclose(
        np.asarray(out.t), np.asarray(geo.quat_rotate(dq, pose.t) + dt), atol=1e-5
    )
    expect_q = geo.quat_normalize(geo.quat_mul(dq, pose.q))
    np.testing.assert_allclose(np.asarray(out.q), np.asarray(expect_q), atol=1e-5)


def test_gravity_align_matrix():
    # gravity measured along an arbitrary tilt; aligned accel must point +z
    acc = jnp.array([2.0, -1.0, 9.5], dtype=jnp.float32)
    R = geo.gravity_align_matrix(acc)
    # the reference uses the inverse for alignment (imu_data.h:144)
    aligned = np.asarray(R).T @ np.asarray(acc)
    np.testing.assert_allclose(aligned[:2], 0.0, atol=1e-4)
    assert aligned[2] > 9.0
    # proper rotation
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_jit_and_vmap_compatibility(rng):
    q = jnp.asarray(random_quat(rng, (32,)))
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    out = jax.jit(jax.vmap(geo.quat_rotate))(q, v)
    assert out.shape == (32, 3)
