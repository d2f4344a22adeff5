"""Voxel-hash local map: the TPU-native replacement for the reference's
rolling 21x21x11 grid of 50 m blocks with per-block octrees and PCL voxel
filtering (reference include/super_odometry/LidarProcess/LocalMap.h).

Design (v2, tuned for TPU gather behavior)
------------------------------------------
The reference recenters a dense block array around the robot (shiftMap,
LocalMap.h:169-287), voxel-filters each touched block on insertion
(LocalMap.h:562-587) and answers KNN queries with a per-block octree
(flann/octree.h).  None of that maps to XLA.  Here the map is a bucketized
open-addressing hash table over ~2 m cells:

  keys  int32[NB, B]      packed cell coordinate per slot (-1 = empty)
  pts   f32  [NB*B, 3C]   stored points, coordinate-planar slot rows
  cnt   int32[NB, B]      valid points per slot

* Cell coordinates pack into one int32 (10 bits/axis, wraps at +-512 cells;
  eviction keeps the live region far inside the wrap period).  A lookup
  gathers ONE contiguous bucket row [B] and compares packed words — on TPU
  this is ~8x cheaper than probing 4-element rows 8 times (measured: the
  probe-style lookup alone cost 7.7 ms for 55k cells on v5e).
* KNN queries gather the 8 octant-neighbor cells (the 2x2x2 block of cells
  nearest the query), guaranteeing coverage radius >= cell_size/2; with 2 m
  cells that exceeds every correspondence gate in the pipeline
  (sqrt(3*plane_res) <= 1.55 m only in far mode, ~0.77 m nominally).
* Insertion is a fully vectorized batch op: thin in-batch, sort by cell,
  rank within cell, claim-or-adopt bucket slots in a few contention rounds,
  distance-gate against stored points, one flat scatter.
* "Recentering" is eviction of far cells (no data movement).

All shapes are static; the entire map lives on device as a pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from superodom_tpu.config import MapConfig
from superodom_tpu.ops.voxel import (
    _composite_sort_order,
    hash_coords,
    voxel_coords,
)

# HOST (numpy) constants: a module-level jnp scalar is created ON the
# default device at import, and every program that closes over it must
# fetch its value back at lowering time — measured at 47 s per fetch
# through the remote-attached relay (round 5).  numpy constants embed
# into the HLO for free.
_BIG = np.float32(1e30)
_INT_MAX = np.int32(2147483647)
_EMPTY = np.int32(-1)
_COORD_BITS = 10
_COORD_MASK = (1 << _COORD_BITS) - 1  # 1023
_COORD_PERIOD = 1 << _COORD_BITS  # 1024 cells before wrap


class VoxelHashMap(NamedTuple):
    """Bucketized voxel-hash table, laid out for TPU (8,128) tiling.

    ``pts`` is ONE flat 2-D table: row = slot (bucket*B + lane), columns =
    the slot's 3xC coordinate-planar block [x0..x_{C-1}, y0.., z0..].  Every
    hot op is then a row gather / row scatter on a natively tiled array.
    Earlier layouts kept a 4-D [NB, B, 3, C] table: its minor (3, C) dims
    tile as T(4,128) -> 10.6x PADDING (12.6 MB of points stored in 134 MB),
    and the insert's flat-view reshape repacked the whole padded table twice
    per scan (0.39 ms/scan measured on v5e).  The 2-D [slots, 3C] form pads
    only 3C=48 -> 128 lanes and never reshapes.

    ``keys``/``cnt`` stay [NB, B]: with the default B=128 a bucket row IS one
    (8,128) tile row, so lookups read dense rows (B=8 padded those rows 16x).
    Bigger buckets also lower overflow variance at equal load factor."""

    keys: jnp.ndarray  # i32[NB, B] packed cell keys, -1 empty
    pts: jnp.ndarray  # f32[NB*B, 3*C] coordinate-planar slot rows
    cnt: jnp.ndarray  # i32[NB, B]

    @property
    def n_buckets(self) -> int:
        return self.keys.shape[0]

    @property
    def bucket_size(self) -> int:
        return self.keys.shape[1]

    @property
    def cell_capacity(self) -> int:
        return self.pts.shape[1] // 3


def pack_cells(cells: jnp.ndarray) -> jnp.ndarray:
    """int32 [...,3] cell coords -> packed non-negative int32 [...].

    10 bits per axis, two's-complement wrap at +-512 cells: positions a full
    wrap period (1024 * cell_size) apart alias, but eviction keeps live
    cells well inside half a period of the robot."""
    c = cells & _COORD_MASK
    return (c[..., 0] | (c[..., 1] << _COORD_BITS) | (c[..., 2] << (2 * _COORD_BITS))).astype(jnp.int32)


def unpack_cells(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed key -> int32 [...,3] coords in [-512, 512)."""
    def ext(v):
        return jnp.where(v >= _COORD_PERIOD // 2, v - _COORD_PERIOD, v)

    x = ext(packed & _COORD_MASK)
    y = ext((packed >> _COORD_BITS) & _COORD_MASK)
    z = ext((packed >> (2 * _COORD_BITS)) & _COORD_MASK)
    return jnp.stack([x, y, z], axis=-1)


def _bucket_scramble(packed: jnp.ndarray) -> jnp.ndarray:
    # fmix-style scramble of the packed cell word (uint32 out)
    h = packed.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    return h


def _bucket_of(packed: jnp.ndarray, nb: int) -> jnp.ndarray:
    return (_bucket_scramble(packed) & jnp.uint32(nb - 1)).astype(jnp.int32)


def empty_map(cfg: MapConfig, dtype=jnp.float32) -> VoxelHashMap:
    if cfg.table_size % cfg.bucket_size != 0:
        raise ValueError(
            f"table_size ({cfg.table_size}) must be a multiple of "
            f"bucket_size ({cfg.bucket_size})"
        )
    nb = cfg.table_size // cfg.bucket_size
    if nb & (nb - 1) != 0:
        raise ValueError(
            f"table_size/bucket_size ({nb}) must be a power of two "
            "(_bucket_of masks the hash with nb-1)"
        )
    # unoccupied point lanes hold the BIG sentinel: queries then need no
    # per-slot count — the distance ranking excludes empties naturally,
    # sparing a 16k-element scalar gather of cnt per scan (~0.1 ms on v5e)
    return VoxelHashMap(
        keys=jnp.full((nb, cfg.bucket_size), _EMPTY, dtype=jnp.int32),
        pts=jnp.full((nb * cfg.bucket_size, 3 * cfg.cell_capacity), _BIG,
                     dtype=dtype),
        cnt=jnp.zeros((nb, cfg.bucket_size), dtype=jnp.int32),
    )


def lookup_packed(m: VoxelHashMap, packed: jnp.ndarray) -> jnp.ndarray:
    """Packed cell keys [Q] -> flat slot index [Q] (bucket*B + lane), -1 if
    absent.  One contiguous row gather per query."""
    nb, B = m.keys.shape
    bucket = _bucket_of(packed, nb)
    rows = m.keys[bucket]  # [Q, B] contiguous row gather
    match = rows == packed[:, None]
    any_match = jnp.any(match, axis=-1)
    lane = jnp.argmax(match, axis=-1).astype(jnp.int32)
    return jnp.where(any_match, bucket * B + lane, -1)


def lookup(m: VoxelHashMap, cfg: MapConfig, cells: jnp.ndarray) -> jnp.ndarray:
    """Integer cell coords [Q,3] -> flat slot [Q] or -1."""
    return lookup_packed(m, pack_cells(cells))


def insert(
    m: VoxelHashMap,
    cfg: MapConfig,
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    min_dist,
    max_writes: int = 0,
) -> VoxelHashMap:
    """Insert world-frame points, keeping stored points >= ``min_dist`` apart
    (the role of the reference's per-block VoxelGrid thinning,
    LocalMap.h:562-587).  ``max_writes`` overrides ``cfg.insert_width``
    (0 = use the config; pass ``xyz.shape[0]`` for uncapped bulk loads)."""
    nb, B = m.keys.shape
    C = m.cell_capacity
    n = xyz.shape[0]
    lane_ids = jnp.arange(n, dtype=jnp.int32)

    # --- one lexicographic sort by (hash(cell), cell, fine-voxel hash) ------
    # serves the cell grouping and the within-batch thinning (keep the first
    # point per fine voxel, the role of the reference's per-block VoxelGrid
    # refiltering).  The PRIMARY key is a scrambled cell hash, not the packed
    # cell coordinate: the insert-width prefix cut below drops whatever sorts
    # last, and in coordinate order that cut is a spatial half-plane — on a
    # feature-rich first scan it starves one side of the scene of map points
    # for tens of frames (measured: ~2 m divergence at OS1/VLP densities with
    # 2048 features vs insert_width 1024).  Hash order makes the capped
    # write set a spatially uniform sample instead.
    fine = voxel_coords(xyz, jnp.maximum(jnp.asarray(min_dist, xyz.dtype), 1e-6))
    fine_h = hash_coords(fine, 0)
    packed = pack_cells(voxel_coords(xyz, cfg.cell_size))
    scramble = (_bucket_scramble(packed) >> jnp.uint32(1)).astype(jnp.int32)
    sk_cell = jnp.where(mask, packed, _INT_MAX)
    sk_hash = jnp.where(mask, scramble, _INT_MAX)
    sk_fine = jnp.where(mask, fine_h, _INT_MAX)
    order = _composite_sort_order(sk_cell, sk_fine)
    order = order[jnp.argsort(sk_hash[order], stable=True)]
    xyz_s = xyz[order]
    packed_s = packed[order]
    key_s = sk_cell[order]
    fine_s = sk_fine[order]

    new_run = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), key_s[1:] != key_s[:-1]]
    )
    first_of_fine = new_run | jnp.concatenate(
        [jnp.ones((1,), dtype=bool), fine_s[1:] != fine_s[:-1]]
    )
    mask_s = mask[order] & first_of_fine
    seg_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1

    # --- resolve / allocate slots ------------------------------------------
    slot = lookup_packed(m, packed_s)  # [N] flat or -1
    rep = new_run & mask_s & (slot < 0)

    bucket = _bucket_of(packed_s, nb)

    # One-shot deterministic allocation: rank each NEW cell among the new
    # cells of its bucket, then claim the rank-th empty lane of that bucket
    # directly.  Ranks are distinct per bucket, so there is no write race —
    # this replaces the old claim/contend while_loop, which could allocate
    # only ONE cell per bucket per round (fine at B=8, but at B=128 a bulk
    # load needing ~30 cells in one bucket starved after n_probes rounds).
    rep_bucket = jnp.where(rep, bucket, _INT_MAX)
    border = jnp.argsort(rep_bucket, stable=True)
    rb_sorted = rep_bucket[border]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), rb_sorted[1:] != rb_sorted[:-1]]
    )
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.ops.segment_min(idx, seg, num_segments=n)
    rank_sorted = idx - run_start[seg]
    rank = jnp.zeros((n,), jnp.int32).at[border].set(rank_sorted)

    empty_cum = jnp.cumsum((m.keys == _EMPTY).astype(jnp.int32), axis=1)
    rows_cum = empty_cum[bucket]  # [N, B]
    want = rank + 1
    hit = rows_cum == want[:, None]
    got = rep & jnp.any(hit, axis=-1)  # rank < #empty lanes, else drop
    elane = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    new_slot = bucket * B + elane
    slot = jnp.where(got, new_slot, slot)
    key_rows = jnp.where(got, bucket, nb + lane_ids)  # distinct OOB rows
    keys = m.keys.at[key_rows, elane].set(
        packed_s, mode="drop", unique_indices=True
    )

    seg_slot = jax.ops.segment_max(
        jnp.where(new_run, slot, -1), seg_id, num_segments=n
    )
    slot = jnp.maximum(slot, seg_slot[seg_id])

    ok = mask_s & (slot >= 0)
    safe_slot = jnp.maximum(slot, 0)

    # --- distance gate vs. existing cell contents ---------------------------
    cnt_flat = m.cnt.reshape(nb * B)
    cell_pts = m.pts[safe_slot]  # [N, 3C] one contiguous row per slot
    cell_cnt = cnt_flat[safe_slot]
    exist = jnp.arange(C, dtype=jnp.int32)[None, :] < cell_cnt[:, None]
    d2 = (
        (cell_pts[:, 0:C] - xyz_s[:, 0:1]) ** 2
        + (cell_pts[:, C:2 * C] - xyz_s[:, 1:2]) ** 2
        + (cell_pts[:, 2 * C:] - xyz_s[:, 2:3]) ** 2
    )  # [N, C]
    d2 = jnp.where(exist, d2, _BIG)
    keep = ok & (jnp.min(d2, axis=-1) >= jnp.asarray(min_dist, xyz.dtype) ** 2)

    # --- rank survivors within their cell, append ---------------------------
    inc = keep.astype(jnp.int32)
    ex_cum = jnp.cumsum(inc) - inc
    seg_base = jax.ops.segment_sum(
        ex_cum * new_run.astype(jnp.int32), seg_id, num_segments=n
    )
    rank = ex_cum - seg_base[seg_id]
    dest = cell_cnt + rank
    write = keep & (dest < C)

    # Cap and COMPACT the write set before scattering: a scatter into the
    # (tens of MB) pts table costs ~0.5 us per update lane on TPU regardless
    # of masking, so the update width — not the data volume — is the cost.
    # In steady state only frontier points survive the distance gate; the
    # prefix cap only bites on the first few frames (dropped points re-enter
    # next scan, exactly like the reference's per-block overflow thinning).
    W_ins = min(max_writes if max_writes > 0 else cfg.insert_width, n)
    if W_ins < n:
        w_rank = jnp.cumsum(write.astype(jnp.int32)) - 1
        # prefix cut in sorted order keeps each cell's kept lanes contiguous
        # from rank 0 (a cell's lanes are contiguous under the hash-primary
        # sort), so `dest` stays gap-free
        write = write & (w_rank < W_ins)
        sel_keys = jnp.where(write, n - lane_ids, 0)
        _, sel = jax.lax.top_k(sel_keys, W_ins)
        write_c = write[sel]
        # dropped lanes get DISTINCT out-of-range rows (unique_indices)
        drop_rows = nb * B + jnp.arange(W_ins, dtype=jnp.int32)
        row_w = jnp.where(write_c, safe_slot[sel], drop_rows)
        col_w = jnp.minimum(dest[sel], C - 1)
        xyz_w = xyz_s[sel]
    else:
        row_w = jnp.where(write, safe_slot, nb * B + lane_ids)
        col_w = jnp.minimum(dest, C - 1)
        xyz_w = xyz_s
    # one 2-D scatter of 3W lanes straight into the native [slots, 3C]
    # tiling (rows = slots, columns = x/y/z plane offsets of the append
    # position) — no flat view, no layout repack.  Distinct dropped rows
    # keep every (row, col) pair unique; live pairs are unique because a
    # cell's appends have distinct ranks.
    rows3 = jnp.concatenate([row_w, row_w, row_w])
    cols3 = jnp.concatenate([col_w, col_w + C, col_w + 2 * C])
    vals3 = jnp.concatenate([xyz_w[:, 0], xyz_w[:, 1], xyz_w[:, 2]])
    pts = m.pts.at[rows3, cols3].set(vals3, mode="drop", unique_indices=True)

    adds = jax.ops.segment_sum(write.astype(jnp.int32), seg_id, num_segments=n)
    rep_lane = new_run & (slot >= 0) & mask_s
    cnt_idx = jnp.where(rep_lane, safe_slot, nb * B)
    cnt = (
        cnt_flat.at[cnt_idx].add(adds[seg_id], mode="drop").reshape(nb, B)
    )

    return VoxelHashMap(keys=keys, pts=pts, cnt=cnt)


def query_knn(
    m: VoxelHashMap,
    cfg: MapConfig,
    queries: jnp.ndarray,
    k: int,
):
    """K nearest stored points per query via the 8 octant-neighbor cells.

    Static-shape stand-in for the reference's per-block octree KNN
    (LocalMap.h:481-525, flann/octree.h).  Guaranteed support radius is
    cell_size/2 around every query — larger than the pipeline's nominal
    acceptance gates; beyond it neighbors may be missed (far-mode queries
    only), which the NOT_ENOUGH_NEIGHBORS/TOO_FAR rejection codes absorb
    exactly like the reference's block-boundary misses.

    Returns ``(pts f32[Q,k,3], sqdist f32[Q,k], valid bool[Q,k])``.
    """
    cand, cvalid = gather_candidates(m, cfg, queries)
    return select_knn(cand, cvalid, queries, k)


# octant offset patterns: 8 corners of {0, s}^3 where s = +-1 per axis
_OCT_CORNERS = np.stack(
    np.meshgrid(
        np.arange(2, dtype=np.int32),
        np.arange(2, dtype=np.int32),
        np.arange(2, dtype=np.int32),
        indexing="ij",
    ),
    axis=-1,
).reshape(8, 3)


def gather_candidates(m: VoxelHashMap, cfg: MapConfig, queries: jnp.ndarray):
    """Gather the candidate point sets for a batch of queries: the 2x2x2
    block of cells nearest each query.  Returns (cand f32[Q,8,3C] — one
    coordinate-planar slot row per octant cell — and valid bool[Q,8*C]).
    Exposed separately so ICP can gather once and re-select across
    iterations."""
    nb, B = m.keys.shape
    C = m.cell_capacity
    q = queries
    nq = q.shape[0]
    scaled = q / cfg.cell_size
    cell = jnp.floor(scaled).astype(jnp.int32)
    frac = scaled - cell.astype(q.dtype)
    side = jnp.where(frac < 0.5, -1, 1).astype(jnp.int32)  # [Q,3]
    offs = _OCT_CORNERS[None, :, :] * side[:, None, :]  # [Q,8,3]
    ncells = cell[:, None, :] + offs
    packed = pack_cells(ncells.reshape(-1, 3))
    slots = lookup_packed(m, packed).reshape(nq, 8)
    safe = jnp.maximum(slots, 0)

    cand = m.pts[safe]  # [Q, 8, 3C] one contiguous row gather per slot
    # no cnt gather: unoccupied lanes hold the BIG sentinel (see empty_map/
    # evict_far), so masking missing SLOTS suffices — sentinel lanes lose
    # every distance comparison on their own
    cvalid = jnp.broadcast_to(
        (slots >= 0)[..., None], (nq, 8, C)
    )
    return cand, cvalid.reshape(nq, 8 * C)


def cand_planes(cand: jnp.ndarray):
    """Split gathered candidate rows [Q,8,3C] into coordinate planes
    (x, y, z), each [Q, 8C] — static minor-dim slices, no transpose."""
    nq, eight, threeC = cand.shape
    C = threeC // 3
    x = cand[:, :, 0:C].reshape(nq, eight * C)
    y = cand[:, :, C:2 * C].reshape(nq, eight * C)
    z = cand[:, :, 2 * C:].reshape(nq, eight * C)
    return x, y, z


def select_knn(cand: jnp.ndarray, cvalid: jnp.ndarray, queries: jnp.ndarray, k: int):
    """Top-k nearest among gathered candidates (cand f32[Q,8,3C]).

    Distance math runs planar ([Q,8C] per coordinate — no size-3 minor
    axis anywhere); only the k selected neighbors materialize as [Q,k,3]."""
    cx, cy, cz = cand_planes(cand)
    d2 = (
        (cx - queries[:, 0:1]) ** 2
        + (cy - queries[:, 1:2]) ** 2
        + (cz - queries[:, 2:3]) ** 2
    )
    d2 = jnp.where(cvalid, d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    sq = -neg
    # materialize the k neighbors via a one-hot batched matmul instead of
    # take_along_axis: the within-row element gather lowers to one scalar
    # load per element (~80 us per plane for 2048x5 on v5e) while the
    # one-hot contraction is a dense [k,8C]x[8C,3] MXU pass per query
    lanes = jnp.arange(d2.shape[1], dtype=idx.dtype)
    onehot = (idx[:, :, None] == lanes[None, None, :]).astype(cand.dtype)
    stacked = jnp.stack([cx, cy, cz], axis=-1)  # [Q, 8C, 3]
    pts = jnp.einsum("qkc,qcp->qkp", onehot, stacked)  # [Q, k, 3]
    valid = sq < _BIG * 0.5
    return pts, sq, valid


class ReducedCandidates(NamedTuple):
    """Distance-ordered top-W candidate subset, materialized planar
    ([Q, W] per coordinate — no size-3 minor axis).  Produced once per scan
    by :func:`reduce_candidates`; ICP refresh rounds re-select their K
    neighbors from these W lanes instead of the full 8*C gathered set."""

    x: jnp.ndarray  # f32[Q, W]
    y: jnp.ndarray  # f32[Q, W]
    z: jnp.ndarray  # f32[Q, W]
    valid: jnp.ndarray  # bool[Q, W]


def reduce_candidates(
    cand: jnp.ndarray, cvalid: jnp.ndarray, queries: jnp.ndarray, w: int
) -> ReducedCandidates:
    """The W nearest gathered candidates per query, as planar arrays.

    One full-width distance pass + top_k + one-hot MXU contraction — the
    same cost as a single full KNN selection (with k=W).  Subsequent
    selections from the reduced set cost 8*C/W times less; valid while the
    query pose moves less than the margin the W-th candidate's radius
    provides over the acceptance gates (see RegistrationConfig.refresh_width).
    """
    cx, cy, cz = cand_planes(cand)
    d2 = (
        (cx - queries[:, 0:1]) ** 2
        + (cy - queries[:, 1:2]) ** 2
        + (cz - queries[:, 2:3]) ** 2
    )
    d2 = jnp.where(cvalid, d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, w)
    lanes = jnp.arange(d2.shape[1], dtype=idx.dtype)
    onehot = (idx[:, :, None] == lanes[None, None, :]).astype(cand.dtype)
    rx = jnp.einsum("qwc,qc->qw", onehot, cx)
    ry = jnp.einsum("qwc,qc->qw", onehot, cy)
    rz = jnp.einsum("qwc,qc->qw", onehot, cz)
    # sentinel lanes square to inf in d2, so the -neg test stays safe even
    # when top_k had to take them (fewer than W live candidates)
    return ReducedCandidates(x=rx, y=ry, z=rz, valid=-neg < _BIG * 0.5)


def select_knn_reduced(red: ReducedCandidates, queries: jnp.ndarray, k: int):
    """Top-k selection from a reduced candidate set ([Q,W] planes).  Same
    contract as :func:`select_knn`; ~8*C/W times cheaper per call."""
    d2 = (
        (red.x - queries[:, 0:1]) ** 2
        + (red.y - queries[:, 1:2]) ** 2
        + (red.z - queries[:, 2:3]) ** 2
    )
    d2 = jnp.where(red.valid, d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    sq = -neg
    lanes = jnp.arange(d2.shape[1], dtype=idx.dtype)
    onehot = (idx[:, :, None] == lanes[None, None, :]).astype(red.x.dtype)
    stacked = jnp.stack([red.x, red.y, red.z], axis=-1)  # [Q, W, 3]
    pts = jnp.einsum("qkw,qwp->qkp", onehot, stacked)
    return pts, sq, sq < _BIG * 0.5


def _wrapped_cell_delta(keys: jnp.ndarray, center_cell: jnp.ndarray) -> jnp.ndarray:
    """Cell-coordinate delta to the center, modulo the pack period (nearest
    representative)."""
    coords = unpack_cells(keys)
    d = (coords - center_cell[None, None, :]) & (_COORD_PERIOD - 1)
    return jnp.where(d >= _COORD_PERIOD // 2, d - _COORD_PERIOD, d)


def evict_far(m: VoxelHashMap, cfg: MapConfig, center: jnp.ndarray) -> VoxelHashMap:
    """Drop cells farther than ``evict_radius`` from ``center`` — the rolling
    behavior of the reference map without data movement."""
    center_cell = jnp.floor(center / cfg.cell_size).astype(jnp.int32)
    d = _wrapped_cell_delta(m.keys, center_cell).astype(m.pts.dtype) * cfg.cell_size
    far = (m.keys != _EMPTY) & (
        jnp.sum(d * d, axis=-1) > jnp.asarray(cfg.evict_radius, m.pts.dtype) ** 2
    )
    # restore the BIG sentinel on dropped slots' point lanes: queries rely
    # on empties losing every distance comparison (no cnt gather), so a
    # reallocated slot must not resurrect stale points.  One masked full-
    # table write per eviction pass (~16 us for 12.6 MB on v5e).
    return VoxelHashMap(
        keys=jnp.where(far, _EMPTY, m.keys),
        pts=jnp.where(far.reshape(-1)[:, None], _BIG, m.pts),
        cnt=jnp.where(far, 0, m.cnt),
    )


def census_box(
    m: VoxelHashMap, cfg: MapConfig, center: jnp.ndarray, half_extent: jnp.ndarray
) -> jnp.ndarray:
    """Stored points whose cell center lies inside the box around ``center``
    — replaces get5x5LocalMapFeatureSize (LocalMap.h:292-318)."""
    center_cell = jnp.floor(center / cfg.cell_size).astype(jnp.int32)
    d = (
        _wrapped_cell_delta(m.keys, center_cell).astype(m.pts.dtype) + 0.5
    ) * cfg.cell_size
    inside = (m.keys != _EMPTY) & jnp.all(
        jnp.abs(d) <= half_extent[None, None, :], axis=-1
    )
    return jnp.sum(jnp.where(inside, m.cnt, 0))


def total_points(m: VoxelHashMap) -> jnp.ndarray:
    return jnp.sum(jnp.where(m.keys != _EMPTY, m.cnt, 0))


def extract_points(m: VoxelHashMap):
    """Host-side helper: all stored points + validity mask, flattened."""
    nb, B = m.keys.shape
    C = m.cell_capacity
    valid = (m.keys != _EMPTY)[..., None] & (
        jnp.arange(C, dtype=jnp.int32)[None, None, :] < m.cnt[..., None]
    )
    C = m.cell_capacity
    pts = jnp.stack(
        [m.pts[:, 0:C], m.pts[:, C:2 * C], m.pts[:, 2 * C:]], axis=-1
    ).reshape(-1, 3)
    return pts, valid.reshape(-1)
