"""Closed-form symmetric 3x3 eigendecomposition, batched and branch-free.

The reference performs per-correspondence PCA with Eigen's
SelfAdjointEigenSolver (reference utils/superodom_utils.h:143-163 ComputePCA,
used by LidarSlam.cpp:749-790).  On TPU a LAPACK-style iterative eigensolver
per 3x3 block would be scalar-heavy; the trigonometric closed form below is
pure VPU arithmetic and vmaps over thousands of neighborhoods at once.

Convention: eigenvalues ascending (eigvals[0] smallest), matching Eigen's
SelfAdjointEigenSolver so the reference's gate expressions carry over
verbatim.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _eigvals3(A: jnp.ndarray):
    """Eigenvalues of symmetric [...,3,3], ascending."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, _EPS)

    b00, b11, b22 = (a00 - q) / safe_p, (a11 - q) / safe_p, (a22 - q) / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min

    diag = jnp.sort(jnp.stack([a00, a11, a22], axis=-1), axis=-1)
    near_diag = p1 < _EPS
    lo = jnp.where(near_diag, diag[..., 0], lam_min)
    mid = jnp.where(near_diag, diag[..., 1], lam_mid)
    hi = jnp.where(near_diag, diag[..., 2], lam_max)
    return lo, mid, hi


def _eigvec(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric A for eigenvalue lam via the largest cross
    product of rows of (A - lam*I); falls back to a canonical axis when all
    cross products vanish (isotropic case: any unit vector works)."""
    eye = jnp.eye(3, dtype=A.dtype)
    M = A - lam[..., None, None] * eye
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    nmax = jnp.max(norms, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=A.dtype), v.shape)
    v = jnp.where(nmax > _EPS, v, fallback)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def eigh3(A: jnp.ndarray):
    """Symmetric 3x3 eigendecomposition.

    Returns ``(eigvals[...,3] ascending, eigvecs[...,3,3])`` with
    ``eigvecs[..., :, k]`` the unit eigenvector for ``eigvals[..., k]``
    (column convention, same as Eigen).
    """
    lo, mid, hi = _eigvals3(A)
    v_lo = _eigvec(A, lo)
    v_hi = _eigvec(A, hi)
    # (near-)isotropic case: both solves fall back to the same direction;
    # replace v_hi with any unit vector orthogonal to v_lo (branch-free)
    c = jnp.cross(v_hi, v_lo)
    c_n = jnp.sum(c * c, axis=-1, keepdims=True)
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v_lo.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], A.dtype), v_lo.shape)
    alt1 = jnp.cross(v_lo, ex)
    alt2 = jnp.cross(v_lo, ey)
    alt = jnp.where(
        jnp.sum(alt1 * alt1, axis=-1, keepdims=True)
        > jnp.sum(alt2 * alt2, axis=-1, keepdims=True),
        alt1,
        alt2,
    )
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-20)
    v_hi = jnp.where(c_n > 1e-12, v_hi, alt)
    # middle vector: orthogonal completion is more stable than a third solve
    v_mid = jnp.cross(v_hi, v_lo)
    v_mid = v_mid / jnp.maximum(jnp.linalg.norm(v_mid, axis=-1, keepdims=True), 1e-20)
    vals = jnp.stack([lo, mid, hi], axis=-1)
    vecs = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return vals, vecs


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve 3x3 system(s) A x = b via the adjugate (Cramer), batched."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, jnp.inf, det)
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    x1 = (c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    x2 = (c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)
