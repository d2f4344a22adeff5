import numpy as np
import jax.numpy as jnp

from superodom_tpu.ops import eigh3, solve3, voxel_downsample_centroid
from superodom_tpu.ops.voxel import uniform_stride_mask


def random_symmetric(rng, n):
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (A + np.swapaxes(A, -1, -2)) / 2


def test_eigh3_matches_numpy(rng):
    A = random_symmetric(rng, 200)
    vals, vecs = eigh3(jnp.asarray(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(vals, ref_vals, atol=5e-4, rtol=1e-3)
    # eigenvector property A v = lambda v
    for k in range(3):
        Av = np.einsum("nij,nj->ni", A, vecs[:, :, k])
        lv = vals[:, k : k + 1] * vecs[:, :, k]
        np.testing.assert_allclose(Av, lv, atol=5e-3)


def test_eigh3_degenerate_cases():
    # isotropic
    A = jnp.eye(3, dtype=jnp.float32)[None] * 2.0
    vals, vecs = eigh3(A)
    np.testing.assert_allclose(np.asarray(vals)[0], [2, 2, 2], atol=1e-6)
    norms = np.linalg.norm(np.asarray(vecs)[0], axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # rank-1 (line-like scatter)
    d = np.array([1.0, 2.0, -0.5], dtype=np.float32)
    d /= np.linalg.norm(d)
    A = jnp.asarray(np.outer(d, d) * 5.0)[None]
    vals, vecs = eigh3(A)
    np.testing.assert_allclose(np.asarray(vals)[0], [0, 0, 5.0], atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(vecs)[0, :, 2] @ d), 1.0, atol=1e-5)


def test_solve3(rng):
    A = rng.normal(size=(50, 3, 3)).astype(np.float32) + 3 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(50, 3)).astype(np.float32)
    x = np.asarray(solve3(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, atol=1e-3, rtol=1e-3)


def test_voxel_downsample_centroid(rng):
    # points in known voxels
    pts = np.array(
        [
            [0.1, 0.1, 0.1],
            [0.3, 0.2, 0.1],  # same voxel as above at res=0.5
            [0.9, 0.1, 0.1],  # different voxel
            [10.0, 10.0, 10.0],
        ],
        dtype=np.float32,
    )
    pad = np.zeros((4, 3), dtype=np.float32)
    xyz = np.concatenate([pts, pad])
    mask = np.array([True] * 4 + [False] * 4)
    out, out_mask = voxel_downsample_centroid(jnp.asarray(xyz), jnp.asarray(mask), 0.5)
    out, out_mask = np.asarray(out), np.asarray(out_mask)
    got = sorted(map(tuple, np.round(out[out_mask], 3)))
    want = sorted(map(tuple, [[0.2, 0.15, 0.1], [0.9, 0.1, 0.1], [10.0, 10.0, 10.0]]))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_downsample_large_random(rng):
    xyz = rng.uniform(-20, 20, size=(5000, 3)).astype(np.float32)
    mask = rng.uniform(size=5000) < 0.9
    res = 1.0
    out, out_mask = voxel_downsample_centroid(jnp.asarray(xyz), jnp.asarray(mask), res)
    out, out_mask = np.asarray(out), np.asarray(out_mask)
    # count distinct voxels with an exact dict
    keys = set(map(tuple, np.floor(xyz[mask] / res).astype(int)))
    assert out_mask.sum() == len(keys)
    # each output lies within its voxel
    got_keys = set(map(tuple, np.floor(out[out_mask] / res).astype(int)))
    assert got_keys == keys


def test_voxel_downsample_centroid_extras(rng):
    # extras are averaged per voxel alongside the coordinates
    xyz = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.2, 0.1], [0.9, 0.1, 0.1]], np.float32
    )
    t = np.array([0.0, 0.4, 0.1], np.float32)
    mask = np.ones(3, bool)
    out, out_mask, t_out = voxel_downsample_centroid(
        jnp.asarray(xyz), jnp.asarray(mask), 0.5, jnp.asarray(t)
    )
    out, out_mask, t_out = map(np.asarray, (out, out_mask, t_out))
    got = sorted(zip(np.round(out[out_mask, 0], 3), np.round(t_out[out_mask], 3)))
    assert got == [(np.float32(0.2), np.float32(0.2)),
                   (np.float32(0.9), np.float32(0.1))]


def test_uniform_stride_mask():
    m = np.asarray(uniform_stride_mask(10, 3))
    # lanes 1, 4, 7 (reference loop: for i=1; i<n; i+=skip)
    np.testing.assert_array_equal(np.where(m)[0], [1, 4, 7])


def test_solve6_spd_matches_linalg(rng):
    import jax.numpy as jnp
    import numpy as np

    from superodom_tpu.ops.smallsolve import inv6_spd, solve6_spd

    for _ in range(5):
        A = rng.normal(size=(6, 6))
        H = A @ A.T + 0.5 * np.eye(6)
        g = rng.normal(size=6)
        x = np.asarray(solve6_spd(jnp.asarray(H, jnp.float32),
                                  jnp.asarray(g, jnp.float32)))
        np.testing.assert_allclose(x, np.linalg.solve(H, g), rtol=2e-3,
                                   atol=2e-4)
        Hi = np.asarray(inv6_spd(jnp.asarray(H, jnp.float32)))
        np.testing.assert_allclose(Hi, np.linalg.inv(H), rtol=2e-3,
                                   atol=2e-4)


def test_solve6_spd_illconditioned_stays_finite():
    import jax.numpy as jnp
    import numpy as np

    from superodom_tpu.ops.smallsolve import solve6_spd

    # rank-deficient H: guarded sqrt must keep the output finite
    H = jnp.zeros((6, 6), jnp.float32).at[0, 0].set(1.0)
    x = solve6_spd(H, jnp.ones(6, jnp.float32))
    assert bool(jnp.all(jnp.isfinite(x)))
