import numpy as np
import jax
import jax.numpy as jnp

from superodom_tpu.config import MapConfig
from superodom_tpu import mapstate as ms


CFG = MapConfig(cell_size=1.0, table_size=1 << 12, bucket_size=8,
                cell_capacity=16)


def brute_knn(points, query, k):
    d = np.sum((points - query) ** 2, axis=-1)
    idx = np.argsort(d)[:k]
    return points[idx], d[idx]


def insert_np(m, xyz, mask, min_dist):
    return ms.insert(m, CFG, jnp.asarray(xyz), jnp.asarray(mask), min_dist)


def test_insert_and_total(rng):
    m = ms.empty_map(CFG)
    pts = rng.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    mask = np.ones(500, dtype=bool)
    m = insert_np(m, pts, mask, 0.01)
    total = int(ms.total_points(m))
    assert 400 <= total <= 500  # some points may be <1cm apart


def test_insert_respects_min_dist(rng):
    m = ms.empty_map(CFG)
    pts = np.array([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0], [0.5, 0.0, 0.0]], np.float32)
    mask = np.ones(3, dtype=bool)
    m = insert_np(m, pts, mask, 0.2)
    # second point is within 0.2 of the first -> thinned
    assert int(ms.total_points(m)) == 2
    # reinserting the same batch adds nothing
    m2 = insert_np(m, pts, mask, 0.2)
    assert int(ms.total_points(m2)) == 2


def test_insert_ignores_masked(rng):
    m = ms.empty_map(CFG)
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, dtype=bool)
    m = insert_np(m, pts, mask, 0.01)
    assert int(ms.total_points(m)) == 0


def test_knn_matches_bruteforce(rng):
    m = ms.empty_map(CFG)
    pts = rng.uniform(-4, 4, size=(800, 3)).astype(np.float32)
    m = insert_np(m, pts, np.ones(800, bool), 1e-4)
    stored, valid = ms.extract_points(m)
    stored = np.asarray(stored)[np.asarray(valid)]

    queries = rng.uniform(-3, 3, size=(50, 3)).astype(np.float32)
    k = 5
    npts, nsq, nvalid = ms.query_knn(m, CFG, jnp.asarray(queries), k)
    npts, nsq, nvalid = np.asarray(npts), np.asarray(nsq), np.asarray(nvalid)
    for i, q in enumerate(queries):
        ref_pts, ref_d = brute_knn(stored, q, k)
        # all reference neighbors within the octant support (cell_size/2)
        # must be found
        in_range = ref_d < (CFG.cell_size * 0.49) ** 2
        np.testing.assert_allclose(
            np.sort(nsq[i][: in_range.sum()]), np.sort(ref_d[in_range]), atol=1e-4
        )


def test_knn_respects_cell_support(rng):
    """Neighbors farther than a cell away may be missed — by design the
    support is the 27-cell neighborhood; gates in registration only accept
    sub-resolution distances anyway."""
    m = ms.empty_map(CFG)
    pts = np.array([[0.1, 0.1, 0.1], [5.0, 5.0, 5.0]], np.float32)
    m = insert_np(m, pts, np.ones(2, bool), 1e-4)
    npts, nsq, nvalid = ms.query_knn(m, CFG, jnp.asarray([[0.0, 0.0, 0.0]], np.float32), 3)
    assert bool(nvalid[0, 0])
    assert not bool(nvalid[0, 1])  # far point not in the octant support


def test_evict_far(rng):
    m = ms.empty_map(CFG)
    near = rng.uniform(-2, 2, size=(50, 3)).astype(np.float32)
    cfg_small = MapConfig(cell_size=1.0, table_size=1 << 12, bucket_size=8,
                          cell_capacity=16, evict_radius=10.0)
    far = near + 50.0
    m = ms.insert(m, cfg_small, jnp.asarray(np.concatenate([near, far])),
                  jnp.ones(100, dtype=bool), 1e-4)
    before = int(ms.total_points(m))
    m = ms.evict_far(m, cfg_small, jnp.zeros(3, jnp.float32))
    after = int(ms.total_points(m))
    assert after < before
    # all remaining points near origin
    pts, valid = ms.extract_points(m)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert np.all(np.linalg.norm(pts, axis=-1) < 12.0)


def test_reinsert_after_evict_finds_slots(rng):
    """Eviction holes must not break lookup/insert chains."""
    cfg = MapConfig(cell_size=1.0, table_size=1 << 10, bucket_size=8,
                    cell_capacity=8, evict_radius=5.0)
    m = ms.empty_map(cfg)
    pts = rng.uniform(-3, 3, size=(200, 3)).astype(np.float32)
    m = ms.insert(m, cfg, jnp.asarray(pts), jnp.ones(200, bool), 0.1)
    m = ms.evict_far(m, cfg, jnp.asarray([100.0, 0.0, 0.0], jnp.float32))
    assert int(ms.total_points(m)) == 0
    m = ms.insert(m, cfg, jnp.asarray(pts), jnp.ones(200, bool), 0.1)
    assert int(ms.total_points(m)) > 100


def test_census_box(rng):
    m = ms.empty_map(CFG)
    pts = rng.uniform(-2, 2, size=(100, 3)).astype(np.float32)
    m = insert_np(m, pts, np.ones(100, bool), 1e-4)
    n = int(ms.census_box(m, CFG, jnp.zeros(3, jnp.float32),
                          jnp.asarray([100.0, 100.0, 100.0], jnp.float32)))
    assert n == int(ms.total_points(m))
    n0 = int(ms.census_box(m, CFG, jnp.asarray([1000.0, 0.0, 0.0], jnp.float32),
                           jnp.asarray([1.0, 1.0, 1.0], jnp.float32)))
    assert n0 == 0


def test_insert_jit_compatible(rng):
    m = ms.empty_map(CFG)
    pts = jnp.asarray(rng.uniform(-5, 5, size=(256, 3)).astype(np.float32))
    f = jax.jit(lambda m, p: ms.insert(m, CFG, p, jnp.ones(256, dtype=bool), 0.1))
    m = f(m, pts)
    m = f(m, pts + 100.0)
    assert int(ms.total_points(m)) > 0


def test_pack_unpack_roundtrip(rng):
    from superodom_tpu.mapstate import pack_cells, unpack_cells
    import jax.numpy as jnp
    cells = rng.integers(-511, 511, size=(1000, 3)).astype(np.int32)
    packed = pack_cells(jnp.asarray(cells))
    back = np.asarray(unpack_cells(packed))
    np.testing.assert_array_equal(back, cells)
