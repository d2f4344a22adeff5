"""Batched multi-instance + sharded execution on the 8-device virtual CPU
mesh (the TPU-native scale-out story, SURVEY.md section 2.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superodom_tpu.parallel import batched_init_state, make_batched_step, make_mesh


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _cfg():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import _tiny_config

    return _tiny_config(max_points=1024, surf_cap=128)


def _inputs(cfg, batch):
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import _example_inputs

    return _example_inputs(cfg, batch=batch)


@needs_8
def test_batched_step_dp_mesh():
    cfg = _cfg()
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    state, scan, imu, avail = _inputs(cfg, batch=8)
    step_fn, shard_state = make_batched_step(cfg, mesh)
    state = shard_state(state)
    new_state, out = step_fn(state, scan, imu, avail)
    jax.block_until_ready(new_state)
    assert out.pose.t.shape == (8, 3)
    # every instance saw identical inputs -> identical outputs
    t = np.asarray(out.pose.t)
    np.testing.assert_allclose(t, np.broadcast_to(t[0], t.shape), atol=1e-5)


@needs_8
def test_batched_step_2d_mesh_map_sharded():
    """2D mesh: instances over 'data', each instance's hash table over
    'model' — exercises cross-shard gathers in the KNN path."""
    cfg = _cfg()
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    state, scan, imu, avail = _inputs(cfg, batch=8)
    step_fn, shard_state = make_batched_step(cfg, mesh)
    state = shard_state(state)
    # two steps so the second one queries a populated (sharded) map
    state, out1 = step_fn(state, scan, imu, avail)
    state, out2 = step_fn(state, scan, imu, avail)
    jax.block_until_ready(state)
    assert int(out2.surf_map_num[0]) > 0
    assert np.isfinite(np.asarray(out2.pose.t)).all()


@needs_8
def test_batched_matches_single_instance():
    """Sharded batched execution must agree with the single-instance path."""
    from superodom_tpu.pipeline import init_state, step

    cfg = _cfg()
    state1, scan, imu, avail = _inputs(cfg, batch=None)
    s1, out1 = jax.jit(lambda s, sc, im, av: step(cfg, s, sc, im, av))(
        state1, scan, imu, avail
    )

    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    stateb, scanb, imub, availb = _inputs(cfg, batch=8)
    step_fn, shard_state = make_batched_step(cfg, mesh)
    sb, outb = step_fn(shard_state(stateb), scanb, imub, availb)
    np.testing.assert_allclose(
        np.asarray(outb.pose.t)[3], np.asarray(out1.pose.t), atol=1e-4
    )


def test_graft_entry_single():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import entry

    fn, args = entry()
    new_state, out = jax.jit(fn)(*args)
    jax.block_until_ready(new_state)
    assert np.isfinite(np.asarray(out.pose.t)).all()


@needs_8
def test_graft_entry_multichip():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@needs_8
def test_64_instances_on_virtual_slice():
    """The BASELINE.json batched config: 64 independent odometry instances
    sharded over the mesh (8 per data shard here), tiny per-instance maps so
    the test stays light."""
    import dataclasses

    from superodom_tpu.config import MapConfig
    from superodom_tpu.parallel import batched_init_state

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, map=MapConfig(cell_size=2.0, table_size=1 << 10, bucket_size=8,
                           cell_capacity=16))
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    state, scan, imu, avail = _inputs(cfg, batch=64)
    step_fn, shard_state = make_batched_step(cfg, mesh)
    state = shard_state(state)
    state, out = step_fn(state, scan, imu, avail)
    state, out = step_fn(state, scan, imu, avail)
    jax.block_until_ready(state)
    assert out.pose.t.shape == (64, 3)
    assert np.isfinite(np.asarray(out.pose.t)).all()
    assert int(np.asarray(out.surf_map_num).min()) > 0


@needs_8
def test_data_parallel_step_has_no_collectives():
    """VERDICT round-2 weak #4: the linear-across-chips claim for
    independent instances rests on the compiled data-parallel step
    containing ZERO cross-instance collectives — instances must not
    synchronize.  Inspect the compiled HLO directly (model=1: the map is
    unsharded, so any collective would be an accidental resharding XLA
    inserted on our behalf)."""
    cfg = _cfg()
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    state, scan, imu, avail = _inputs(cfg, batch=8)
    step_fn, _ = make_batched_step(cfg, mesh)
    hlo = step_fn.lower(state, scan, imu, avail).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        # all-reduce-start etc. share the base-name prefix
        assert op not in hlo, f"unexpected {op} in data-parallel step HLO"
