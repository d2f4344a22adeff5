"""Voxel hashing primitives: coordinates, spatial hashes, scatter/sort-based
voxel-grid downsampling and masked compaction.

These replace PCL's VoxelGrid filter (reference LocalMap.h:562-567,
laserMapping.cpp:638-645) and the implicit variable-length cloud handling of
PCL.  Everything is static-shape: downsampling returns the same array length
with a validity mask; compaction moves valid lanes to the front.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import ops as jops

# Multiplier primes per axis; mixing is murmur3-fmix style.  (Plain XOR of
# odd multiples — the classic Teschner hash — collides on sign-flipped
# coordinate pairs: (-a)^(-b) == a^b whenever a and b are both odd.)
# HOST (numpy) constants: module-level jnp scalars live on the default
# device and cost a relay round trip per captured program at lowering
# time (see mapstate.py) — numpy scalars embed into the HLO directly.
_P1 = np.uint32(73856093)
_P2 = np.uint32(19349663)
_P3 = np.uint32(83492791)
_SEEDS = (np.uint32(0x9E3779B9), np.uint32(0x85EBCA77))


def voxel_coords(xyz: jnp.ndarray, res) -> jnp.ndarray:
    """Integer voxel coordinates floor(x/res), int32 [..., 3]."""
    return jnp.floor(xyz / res).astype(jnp.int32)


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def hash_coords(coords: jnp.ndarray, variant: int = 0) -> jnp.ndarray:
    """Spatial hash of int32 [..., 3] -> int32 [...]. Two independent variants."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * _P1 + c[..., 1] * _P2 + c[..., 2] * _P3 + _SEEDS[variant]
    return _fmix32(h).astype(jnp.int32)


def _composite_sort_order(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """Stable lexicographic argsort by (h1, h2) built from two stable sorts."""
    order2 = jnp.argsort(h2, stable=True)
    order1 = jnp.argsort(h1[order2], stable=True)
    return order2[order1]


def voxel_downsample_centroid(xyz: jnp.ndarray, mask: jnp.ndarray, res,
                              *extras: jnp.ndarray):
    """Voxel-grid downsample keeping per-voxel centroids (PCL VoxelGrid
    semantics, reference LocalMap.h:562-567).

    Args:
      xyz: f32[N, 3]
      mask: bool[N] valid lanes
      res: scalar voxel edge (traced value allowed)
      extras: optional per-lane channels f32[N] or f32[N,d]; averaged per
        voxel alongside the coordinates (e.g. per-point time for
        undistortion of merged points)

    Returns:
      (xyz_out f32[N,3], mask_out bool[N], *extras_out) — one valid lane per
      occupied voxel, compacted to the front; invalid lanes zeroed.
    """
    n = xyz.shape[0]
    coords = voxel_coords(xyz, res)
    h1 = hash_coords(coords, 0)
    h2 = hash_coords(coords, 1)
    # shunt invalid lanes to a reserved key so they sort together at the end
    h1 = jnp.where(mask, h1, jnp.int32(2147483647))
    h2 = jnp.where(mask, h2, jnp.int32(2147483647))

    order = _composite_sort_order(h1, h2)
    h1s, h2s, ms = h1[order], h2[order], mask[order]
    xs = xyz[order]

    new_run = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1]),
        ]
    )
    seg_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # [N]

    w = ms.astype(xyz.dtype)
    cnts = jops.segment_sum(w, seg_id, num_segments=n)
    safe = jnp.maximum(cnts, 1.0)
    out_mask = cnts > 0.0

    def seg_mean(a):
        wcol = w[:, None] if a.ndim > 1 else w
        s = jops.segment_sum(a * wcol, seg_id, num_segments=n)
        m = s / (safe[:, None] if a.ndim > 1 else safe)
        zmask = out_mask[:, None] if a.ndim > 1 else out_mask
        return jnp.where(zmask, m, 0.0)

    centroids = seg_mean(xs)
    outs = tuple(seg_mean(e[order]) for e in extras)
    return (centroids, out_mask) + outs


def voxel_downsample_scatter(xyz: jnp.ndarray, mask: jnp.ndarray, res,
                             table_bits: int = 0):
    """O(N) scatter-based voxel thinning: keep (approximately) one point per
    voxel — the first valid lane to claim the voxel's hash slot wins.

    Unlike :func:`voxel_downsample_centroid` (exact, sort-based, centroid
    semantics) this costs one scatter + one gather, which matters at
    OS1-128 density (131k lanes) where two full argsorts dominate the
    frontend.  Distinct voxels whose hashes collide in the table merge
    (one survivor): with a 4x-oversized table that thins a few percent
    extra, well within the adaptive-resolution slack of the pipeline.

    Returns a boolean keep-mask over the input lanes.
    """
    n = xyz.shape[0]
    if table_bits == 0:
        table_bits = max((n * 4 - 1).bit_length(), 4)
    T = 1 << table_bits
    coords = voxel_coords(xyz, res)
    slot = (hash_coords(coords, 0) & (T - 1)).astype(jnp.int32)
    slot = jnp.where(mask, slot, T)  # masked lanes dropped (positive OOB)
    lane = jnp.arange(n, dtype=jnp.int32)
    claims = jnp.full((T,), jnp.int32(2147483647)).at[slot].min(lane, mode="drop")
    win = mask & (claims[jnp.minimum(slot, T - 1)] == lane)
    return win


def uniform_stride_mask(n: int, stride: int) -> jnp.ndarray:
    """Every ``stride``-th lane starting at 1 (reference uniformFeatureExtraction
    loop ``for (i=1; i<n; i+=skip_num)``, featureExtraction.cpp:507)."""
    idx = jnp.arange(n, dtype=jnp.int32)
    return (idx >= 1) & ((idx - 1) % stride == 0)
