"""Voxel-hash local map: the TPU-native replacement for the reference's
rolling 21x21x11 grid of 50 m blocks with per-block octrees and PCL voxel
filtering (reference include/super_odometry/LidarProcess/LocalMap.h).

Design
------
The reference recenters a dense block array around the robot (shiftMap,
LocalMap.h:169-287), voxel-filters each touched block on insertion
(LocalMap.h:562-567) and answers KNN queries with a per-block octree
(flann/octree.h).  None of that maps to XLA: block shifting is a giant
dynamic copy, octree traversal is pointer chasing.

Instead the map is one open-addressing hash table over *small* cells
(~1 m, config MapConfig.cell_size) with a fixed per-cell point capacity:

  keys  int32[T, 3]   cell integer coordinates
  used  bool [T]      slot occupancy
  pts   f32  [T, C, 3] stored points (world frame)
  cnt   int32[T]      valid points per cell

* Insertion is a fully vectorized batch op: sort by cell, rank within cell,
  claim-or-adopt hash slots in a fixed number of probe rounds, distance-gate
  against existing points (this reproduces the reference's voxel-grid
  thinning: stored points stay >= resolution apart), then one scatter.
* KNN gathers the 27 neighboring cells per query and takes top-k by distance
  — equivalent locality to the reference's per-block search but with a
  tighter (3 x cell_size)^3 support instead of a whole 50 m block.
* "Recentering" is just eviction of far cells (absolute integer coordinates
  never shift), replacing shiftMap.

All shapes are static; the entire map lives on device as a pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from superodom_tpu.config import MapConfig
from superodom_tpu.ops.voxel import (
    _composite_sort_order,
    hash_coords,
    voxel_coords,
)

_BIG = jnp.float32(1e30)
_INT_MAX = jnp.int32(2147483647)


class VoxelHashMap(NamedTuple):
    keys: jnp.ndarray  # i32[T, 3]
    used: jnp.ndarray  # bool[T]
    pts: jnp.ndarray  # f32[T, C, 3]
    cnt: jnp.ndarray  # i32[T]

    @property
    def table_size(self) -> int:
        return self.used.shape[0]

    @property
    def cell_capacity(self) -> int:
        return self.pts.shape[1]


def empty_map(cfg: MapConfig, dtype=jnp.float32) -> VoxelHashMap:
    T, C = cfg.table_size, cfg.cell_capacity
    return VoxelHashMap(
        keys=jnp.zeros((T, 3), dtype=jnp.int32),
        used=jnp.zeros((T,), dtype=bool),
        pts=jnp.zeros((T, C, 3), dtype=dtype),
        cnt=jnp.zeros((T,), dtype=jnp.int32),
    )


def lookup(m: VoxelHashMap, cfg: MapConfig, cells: jnp.ndarray) -> jnp.ndarray:
    """Find table slots for integer cell coords [Q, 3] -> i32[Q], -1 if absent.

    Scans all ``n_probes`` linear-probe positions (no early exit), so
    eviction holes never break lookup chains.
    """
    T = cfg.table_size
    P = cfg.n_probes
    h0 = hash_coords(cells, 0) & (T - 1)
    slots = (h0[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]) & (T - 1)  # [Q,P]
    occupied = m.used[slots]
    key_eq = jnp.all(m.keys[slots] == cells[:, None, :], axis=-1)
    match = occupied & key_eq
    any_match = jnp.any(match, axis=-1)
    first = jnp.argmax(match, axis=-1).astype(jnp.int32)
    found = jnp.take_along_axis(slots, first[:, None], axis=1)[:, 0]
    return jnp.where(any_match, found, -1)


def insert(
    m: VoxelHashMap,
    cfg: MapConfig,
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    min_dist,
) -> VoxelHashMap:
    """Insert a batch of world-frame points, keeping stored points at least
    ``min_dist`` apart (the voxel-thinning role of the reference's per-block
    VoxelGrid filter, LocalMap.h:562-567).

    Fully vectorized: sort by cell, allocate slots in ``n_probes`` rounds of
    claim-with-scatter-min, distance-gate, then one flat scatter.
    """
    T, C, P = cfg.table_size, cfg.cell_capacity, cfg.n_probes
    n = xyz.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)

    # within-batch voxel thinning at min_dist (keep first point per fine
    # voxel) — the in-batch half of the reference's per-block VoxelGrid
    # refiltering; spacing vs. already-stored points is gated further below.
    fine = voxel_coords(xyz, jnp.maximum(jnp.asarray(min_dist, xyz.dtype), 1e-6))
    f1 = jnp.where(mask, hash_coords(fine, 0), _INT_MAX)
    f2 = jnp.where(mask, hash_coords(fine, 1), _INT_MAX)
    forder = _composite_sort_order(f1, f2)
    f1s, f2s = f1[forder], f2[forder]
    first_of_voxel = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), (f1s[1:] != f1s[:-1]) | (f2s[1:] != f2s[:-1])]
    )
    keep_sorted = jnp.zeros((n,), dtype=bool).at[forder].set(first_of_voxel)
    mask = mask & keep_sorted

    cells = voxel_coords(xyz, cfg.cell_size)
    h1 = jnp.where(mask, hash_coords(cells, 0), _INT_MAX)
    h2 = jnp.where(mask, hash_coords(cells, 1), _INT_MAX)
    order = _composite_sort_order(h1, h2)

    xyz_s = xyz[order]
    cells_s = cells[order]
    mask_s = mask[order]
    h1s, h2s = h1[order], h2[order]

    new_run = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
    )
    seg_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1  # [N]

    # --- resolve slot per lane -------------------------------------------
    slot = lookup(m, cfg, cells_s)  # [N]
    rep = new_run & mask_s & (slot < 0)  # unique new cells, one lane each

    used = m.used
    keys = m.keys
    h0 = hash_coords(cells_s, 0) & (T - 1)
    probe = jnp.zeros((n,), dtype=jnp.int32)
    pend = rep
    for _ in range(P):
        cand = (h0 + probe) & (T - 1)
        cur_used = used[cand]
        key_eq = jnp.all(keys[cand] == cells_s, axis=-1)
        adopt = pend & cur_used & key_eq
        slot = jnp.where(adopt, cand, slot)
        pend = pend & ~(cur_used & key_eq)

        free_try = pend & ~cur_used
        claim_idx = jnp.where(free_try, cand, T)  # T = dropped
        claims = jnp.full((T,), _INT_MAX).at[claim_idx].min(lane, mode="drop")
        won = free_try & (claims[cand] == lane)
        upd_idx = jnp.where(won, cand, T)
        used = used.at[upd_idx].set(True, mode="drop")
        keys = keys.at[upd_idx].set(cells_s, mode="drop")
        slot = jnp.where(won, cand, slot)
        pend = pend & ~won
        probe = jnp.where(pend, probe + 1, probe)

    # broadcast the rep's slot to every lane of its run
    seg_slot = jax.ops.segment_max(
        jnp.where(new_run, slot, -1), seg_id, num_segments=n
    )
    slot = jnp.maximum(slot, seg_slot[seg_id])

    ok = mask_s & (slot >= 0)
    safe_slot = jnp.maximum(slot, 0)

    # --- distance gate vs. existing cell contents ------------------------
    cell_pts = m.pts[safe_slot]  # [N, C, 3]
    cell_cnt = m.cnt[safe_slot]  # [N]
    exist = jnp.arange(C, dtype=jnp.int32)[None, :] < cell_cnt[:, None]
    d2 = jnp.sum((cell_pts - xyz_s[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(exist, d2, _BIG)
    keep = ok & (jnp.min(d2, axis=-1) >= jnp.asarray(min_dist, xyz.dtype) ** 2)

    # --- rank survivors within their cell, append ------------------------
    inc = keep.astype(jnp.int32)
    ex_cum = jnp.cumsum(inc) - inc  # exclusive prefix count
    seg_base = jax.ops.segment_sum(
        ex_cum * new_run.astype(jnp.int32), seg_id, num_segments=n
    )
    rank = ex_cum - seg_base[seg_id]
    dest = cell_cnt + rank
    write = keep & (dest < C)

    # NOTE: sentinel must be positive-out-of-bounds — negative indices wrap
    # NumPy-style in JAX scatters and would corrupt the last slot.
    flat = jnp.where(write, safe_slot * C + dest, T * C)
    pts = m.pts.reshape(T * C, 3).at[flat].set(xyz_s, mode="drop").reshape(T, C, 3)

    adds = jax.ops.segment_sum(write.astype(jnp.int32), seg_id, num_segments=n)
    rep_lane = new_run & (slot >= 0) & mask_s
    cnt_idx = jnp.where(rep_lane, safe_slot, T)
    cnt = m.cnt.at[cnt_idx].add(adds[seg_id], mode="drop")

    return VoxelHashMap(keys=keys, used=used, pts=pts, cnt=cnt)


# 27-neighborhood offsets, static
_OFFSETS = jnp.stack(
    jnp.meshgrid(
        jnp.arange(-1, 2, dtype=jnp.int32),
        jnp.arange(-1, 2, dtype=jnp.int32),
        jnp.arange(-1, 2, dtype=jnp.int32),
        indexing="ij",
    ),
    axis=-1,
).reshape(27, 3)


def query_knn(
    m: VoxelHashMap,
    cfg: MapConfig,
    queries: jnp.ndarray,
    k: int,
):
    """K nearest stored points for each query (world frame).

    Gathers the 27 cells around each query and top-k's by squared distance —
    the static-shape stand-in for the reference's per-block octree KNN
    (LocalMap.h:481-525 nearestKSearchSurf, flann/octree.h knnNeighbors).

    Returns ``(pts f32[Q,k,3], sqdist f32[Q,k], valid bool[Q,k])`` with
    invalid lanes at +BIG distance.  Support radius is one cell size; the
    caller's distance gates (3*res thresholds) are far tighter in practice.
    """
    C = cfg.cell_capacity
    q = queries
    nq = q.shape[0]
    cell = voxel_coords(q, cfg.cell_size)
    ncells = (cell[:, None, :] + _OFFSETS[None, :, :]).reshape(-1, 3)
    slots = lookup(m, cfg, ncells).reshape(nq, 27)
    safe = jnp.maximum(slots, 0)

    cand = m.pts[safe]  # [Q, 27, C, 3]
    cvalid = (slots >= 0)[..., None] & (
        jnp.arange(C, dtype=jnp.int32)[None, None, :] < m.cnt[safe][..., None]
    )
    d2 = jnp.sum((cand - q[:, None, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cvalid, d2, _BIG).reshape(nq, 27 * C)

    neg, idx = jax.lax.top_k(-d2, k)
    sq = -neg
    pts = jnp.take_along_axis(cand.reshape(nq, 27 * C, 3), idx[..., None], axis=1)
    valid = sq < _BIG * 0.5
    return pts, sq, valid


def evict_far(m: VoxelHashMap, cfg: MapConfig, center: jnp.ndarray) -> VoxelHashMap:
    """Drop cells farther than ``evict_radius`` from ``center`` — the rolling
    behavior of the reference map (shiftMap clears departing blocks,
    LocalMap.h:169-287) without any data movement."""
    cell_center = (m.keys.astype(m.pts.dtype) + 0.5) * cfg.cell_size
    far = m.used & (
        jnp.sum((cell_center - center[None, :]) ** 2, axis=-1)
        > jnp.asarray(cfg.evict_radius, m.pts.dtype) ** 2
    )
    return VoxelHashMap(
        keys=m.keys,
        used=m.used & ~far,
        pts=m.pts,
        cnt=jnp.where(far, 0, m.cnt),
    )


def census_box(
    m: VoxelHashMap, cfg: MapConfig, center: jnp.ndarray, half_extent: jnp.ndarray
) -> jnp.ndarray:
    """Number of stored points whose cell center lies inside the axis-aligned
    box around ``center`` — replaces get5x5LocalMapFeatureSize
    (LocalMap.h:292-318) which feeds the hasEnoughFeatures gate."""
    cell_center = (m.keys.astype(m.pts.dtype) + 0.5) * cfg.cell_size
    inside = m.used & jnp.all(
        jnp.abs(cell_center - center[None, :]) <= half_extent[None, :], axis=-1
    )
    return jnp.sum(jnp.where(inside, m.cnt, 0))


def total_points(m: VoxelHashMap) -> jnp.ndarray:
    return jnp.sum(jnp.where(m.used, m.cnt, 0))


def extract_points(m: VoxelHashMap):
    """Host-side helper: all stored points + validity mask, flattened."""
    C = m.pts.shape[1]
    valid = m.used[:, None] & (
        jnp.arange(C, dtype=jnp.int32)[None, :] < m.cnt[:, None]
    )
    return m.pts.reshape(-1, 3), valid.reshape(-1)
