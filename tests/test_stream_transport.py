"""Packed single-RPC streaming transport (runner.PackedChunkTransport):
pack/unpack round-trips the chunk pytree exactly (f32/bool/ring) and
quantizes t_rel within its documented resolution.  The end-to-end
streaming-vs-preload ATE equivalence runs in test_chunked.py."""

import numpy as np
import jax
import jax.numpy as jnp

from superodom_tpu.frontend import ImuWindow, Scan
from superodom_tpu.runner import PackedChunkTransport


def _chunk_tree(rng, c=4, w=512, m=16):
    scan = Scan(
        xyz=jnp.asarray(rng.normal(size=(c, w, 3)).astype(np.float32)),
        t_rel=jnp.asarray(rng.uniform(0, 0.1, (c, w)).astype(np.float32)),
        mask=jnp.asarray(rng.random((c, w)) > 0.3),
        t_start=jnp.asarray(rng.uniform(0, 100, (c,)).astype(np.float32)),
        ring=jnp.asarray(rng.integers(0, 128, (c, w)).astype(np.int32)),
    )
    imu = ImuWindow(
        t=jnp.asarray(rng.uniform(0, 100, (c, m)).astype(np.float32)),
        acc=jnp.asarray(rng.normal(size=(c, m, 3)).astype(np.float32)),
        gyr=jnp.asarray(rng.normal(size=(c, m, 3)).astype(np.float32)),
        q=jnp.asarray(rng.normal(size=(c, m, 4)).astype(np.float32)),
        mask=jnp.asarray(rng.random((c, m)) > 0.1),
    )
    avail = jnp.asarray(rng.random((c,)) > 0.5)
    return (scan, imu, avail)


def test_pack_unpack_roundtrip(rng):
    tree = _chunk_tree(rng)
    tr = PackedChunkTransport(tree, scan_period=0.1)
    buf = tr.pack(tree)
    assert buf.dtype == np.uint8 and buf.nbytes == tr.total_bytes
    out = jax.jit(tr.unpack)(jnp.asarray(buf))

    scan, imu, avail = tree
    oscan, oimu, oavail = out
    # xyz is u16-quantized over the chunk's per-axis bounding box:
    # resolution = span/65535 per axis (docstring guarantees <= 2 mm at
    # the 130 m sensor span; here the span is whatever rng produced)
    pts = np.asarray(scan.xyz).reshape(-1, 3)
    res = (pts.max(axis=0) - pts.min(axis=0)) / 65535.0
    np.testing.assert_allclose(np.asarray(oscan.xyz), np.asarray(scan.xyz),
                               atol=float(res.max()) + 1e-7)
    np.testing.assert_array_equal(np.asarray(oscan.mask),
                                  np.asarray(scan.mask))
    np.testing.assert_array_equal(np.asarray(oscan.ring),
                                  np.asarray(scan.ring))
    np.testing.assert_array_equal(np.asarray(oscan.t_start),
                                  np.asarray(scan.t_start))
    np.testing.assert_array_equal(np.asarray(oavail), np.asarray(avail))
    for a, b in zip(jax.tree_util.tree_leaves(oimu),
                    jax.tree_util.tree_leaves(imu)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # t_rel quantized to u16 over 2x the sweep: resolution 0.2/65535 ~ 3 us
    np.testing.assert_allclose(np.asarray(oscan.t_rel),
                               np.asarray(scan.t_rel), atol=0.2 / 65535 + 1e-7)


def test_pack_is_one_contiguous_buffer(rng):
    """The whole point: one leaf -> one device_put -> one RPC."""
    tree = _chunk_tree(rng)
    tr = PackedChunkTransport(tree, scan_period=0.1)
    buf = tr.pack(tree)
    assert isinstance(buf, np.ndarray) and buf.ndim == 1
    # narrow transports actually shrink the payload vs raw f32/i32/bool
    raw = sum(np.asarray(leaf).nbytes
              for leaf in jax.tree_util.tree_leaves(tree))
    assert buf.nbytes < raw * 0.85, (buf.nbytes, raw)


def test_ring_overflow_rejected(rng):
    tree = _chunk_tree(rng)
    scan, imu, avail = tree
    bad = (scan._replace(ring=scan.ring.at[0, 0].set(300)), imu, avail)
    tr = PackedChunkTransport(tree, scan_period=0.1)
    try:
        tr.pack(bad)
    except ValueError:
        return
    raise AssertionError("ring id 300 must be rejected by the u8 transport")
