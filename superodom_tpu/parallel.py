"""Batched multi-instance odometry over a device mesh.

The reference is a single-robot estimator; the TPU-native scale-out axis is
batch parallelism over independent odometry instances (multi-robot replay,
BASELINE.md north star: 64 instances on a v5e slice).  Each instance's whole
state — including its voxel-hash map — is a pytree leaf with a leading batch
dimension; instances are sharded across the mesh 'data' axis and each
instance's map table is sharded across the 'model' axis (map memory is the
per-instance HBM hog, so sharding the table dimension is what lets instance
count scale beyond one chip's HBM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from superodom_tpu.config import PipelineConfig
from superodom_tpu.frontend import ImuWindow, Scan
from superodom_tpu.pipeline import OdomState, init_state, step


def make_mesh(devices=None, data: int | None = None, model: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def _state_pspec(state: OdomState) -> OdomState:
    """PartitionSpecs for a batched OdomState: batch dim on 'data'; the map
    tables additionally sharded over 'model' on the table axis."""

    def default(leaf):
        return P("data")

    specs = jax.tree_util.tree_map(default, state)
    # shard each instance's hash table over 'model' along the bucket axis
    map_spec = type(state.surf_map)(
        keys=P("data", "model"),
        pts=P("data", "model"),
        cnt=P("data", "model"),
    )
    return specs._replace(edge_map=map_spec, surf_map=map_spec)


def batched_init_state(cfg: PipelineConfig, batch: int, dtype=jnp.float32) -> OdomState:
    one = init_state(cfg, dtype)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), one
    )


def make_batched_step(cfg: PipelineConfig, mesh: Mesh):
    """vmapped + sharded step over a batch of instances.

    Returns (step_fn, shard_state) where step_fn(state, scan, imu, avail) is
    jitted with explicit in/out shardings over the mesh.

    The ICP early-exit ``while_loop`` is statically replaced by the
    fixed-count masked-iteration variant: under vmap+sharding the loop's
    termination predicate must be agreed GLOBALLY, so XLA inserts an
    all-reduce (every instance waits for the slowest) plus per-iteration
    all-gathers of the loop carry — cross-instance collectives that break
    the independent-fleet scaling model.  A static loop keeps the compiled
    step collective-free (verified by
    test_parallel.test_data_parallel_step_has_no_collectives).
    """
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        registration=dataclasses.replace(cfg.registration,
                                         icp_early_exit=False),
    )
    dummy = init_state(cfg)
    state_spec = _state_pspec(dummy)
    scan_spec = Scan(
        xyz=P("data"), t_rel=P("data"), mask=P("data"), t_start=P("data"),
        ring=P("data"),
    )
    imu_spec = ImuWindow(
        t=P("data"), acc=P("data"), gyr=P("data"), q=P("data"), mask=P("data")
    )

    vstep = jax.vmap(lambda s, sc, im, av: step(cfg, s, sc, im, av))

    to_sharding = lambda spec: jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, p), spec,
        is_leaf=lambda x: isinstance(x, P),
    )

    if mesh.shape["model"] == 1:
        # Pure data parallelism: shard_map pins the instance axis MANUAL, so
        # cross-instance communication is impossible by construction — the
        # GSPMD propagator otherwise rewrites the vmapped top_k ops
        # (feature compaction, KNN select) as all-gather+sort across the
        # batch, serializing the fleet on ICI.  Each shard runs its
        # instances entirely locally.
        try:  # moved out of experimental in jax 0.8 (check_rep -> check_vma)
            from jax import shard_map
            rep_kw = {"check_vma": False}
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
            rep_kw = {"check_rep": False}

        local = shard_map(
            vstep, mesh=mesh,
            in_specs=(state_spec, scan_spec, imu_spec, P("data")),
            out_specs=(state_spec, P("data")),  # P is a pytree-prefix spec
            **rep_kw,
        )
        step_fn = jax.jit(local)
    else:
        # model-sharded map tables: the KNN path NEEDS cross-shard gathers
        # over 'model', so this variant stays under GSPMD
        step_fn = jax.jit(
            vstep,
            in_shardings=(
                to_sharding(state_spec),
                to_sharding(scan_spec),
                to_sharding(imu_spec),
                NamedSharding(mesh, P("data")),
            ),
            out_shardings=(to_sharding(state_spec), None),
        )

    def shard_state(state: OdomState) -> OdomState:
        return jax.device_put(state, to_sharding(state_spec))

    return step_fn, shard_state
