import numpy as np
import jax.numpy as jnp

from superodom_tpu import checkpoint as ck
from superodom_tpu.io.datasets import make_dataset
from superodom_tpu.runner import OdometryRunner

from test_pipeline import small_world, tiny_config


def test_checkpoint_roundtrip_resumes_identically(rng, tmp_path):
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=10, points_per_scan=2000, radius=1.2,
                      world=small_world())
    r = OdometryRunner(cfg)
    for s in ds.scans[:5]:
        r.process_scan(s.t_start, s.xyz_body, s.t_rel)

    path = str(tmp_path / "state.npz")
    ck.save_state(path, r.state)
    restored = ck.load_state(path, cfg)

    r2 = OdometryRunner(cfg)
    r2.state = restored
    for s in ds.scans[5:8]:
        out_a = r.process_scan(s.t_start, s.xyz_body, s.t_rel)
        out_b = r2.process_scan(s.t_start, s.xyz_body, s.t_rel)
    np.testing.assert_allclose(
        np.asarray(out_a.pose.t), np.asarray(out_b.pose.t), atol=1e-5
    )


def test_prior_map_export_import(rng, tmp_path):
    cfg = tiny_config()
    ds = make_dataset(rng, n_scans=8, points_per_scan=2000, radius=1.2,
                      world=small_world())
    r = OdometryRunner(cfg)
    for s in ds.scans:
        r.process_scan(s.t_start, s.xyz_body, s.t_rel)

    pcd = str(tmp_path / "map.pcd")
    ck.save_prior_map(pcd, r.state)

    from superodom_tpu.mapstate import total_points
    from superodom_tpu.pipeline import init_state

    n_before = int(total_points(r.state.surf_map))
    fresh = init_state(cfg)
    loaded = ck.load_prior_map(pcd, cfg, fresh, thin_res=0.0)
    n_after = int(total_points(loaded.surf_map))
    # thinning on insert may drop a few co-located points
    assert n_after > 0.9 * n_before
