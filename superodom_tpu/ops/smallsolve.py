"""Unrolled small SPD solves.

``jax.scipy.linalg.cho_factor`` / ``cho_solve`` / ``jnp.linalg.inv`` lower
to separate XLA decomposition ops; for the 6x6 normal systems in the ICP
inner loop (12-16 solves per scan, sequentially dependent) the per-op
overhead dominates the O(n^3)=72 flops.  Unrolling the Cholesky
factorization into plain scalar arithmetic lets XLA fuse the whole solve
into the surrounding computation.

Replaces the role of Ceres' DENSE_QR linear solver at this problem size
(reference LidarSlam.cpp:230-240).
"""

from __future__ import annotations

import jax.numpy as jnp


def _chol6(H: jnp.ndarray, eps: float = 1e-12):
    """Unrolled lower-Cholesky of a 6x6 SPD matrix -> list of lists (scalars).

    Guarded square roots / divisions keep NaNs out for near-singular inputs;
    the caller's damping makes true singularity unreachable.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = H[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    return L


def solve6_spd(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """x = H^-1 g for SPD 6x6 H, fully unrolled (fusable scalar ops)."""
    L = _chol6(H)
    n = 6
    # forward substitution L y = g
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def inv6_spd(H: jnp.ndarray) -> jnp.ndarray:
    """H^-1 for SPD 6x6 via the unrolled Cholesky (column-by-column)."""
    L = _chol6(H)
    n = 6
    cols = []
    for j in range(n):
        # solve L y = e_j
        y = [None] * n
        for i in range(n):
            s = jnp.asarray(1.0 if i == j else 0.0, H.dtype)
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        cols.append(jnp.stack(x))
    return jnp.stack(cols, axis=1)
