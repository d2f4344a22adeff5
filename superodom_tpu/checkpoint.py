"""Whole-estimator checkpoint / resume.

The reference's only resume path is localization mode against a prior PCD
map (laserMapping.cpp:163-177); mid-run state is unrecoverable.  Here the
entire estimator — pose, maps, smoother window, adaptive resolutions — is
one pytree (pipeline.OdomState), so checkpointing is a flat array dump and
resume is exact (see tests/test_pipeline.py::test_state_is_checkpointable).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from superodom_tpu.pipeline import OdomState, init_state
from superodom_tpu.config import PipelineConfig

_META = "superodom_state_meta"


def _norm_path(path: str) -> str:
    """np.savez appends '.npz' to suffix-less paths; normalize so save/load
    agree on the final filename."""
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: OdomState) -> None:
    """Serialize an OdomState to an .npz archive."""
    path = _norm_path(path)
    flat, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i:04d}": np.asarray(x) for i, x in enumerate(flat)}
    arrays[_META] = np.frombuffer(
        json.dumps({"n_leaves": len(flat)}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path: str, cfg: PipelineConfig) -> OdomState:
    """Restore an OdomState; the treedef comes from a fresh init_state(cfg),
    so the config must match the one the state was saved under."""
    template = init_state(cfg)
    ref_leaves, treedef = jax.tree_util.tree_flatten(template)
    data = np.load(_norm_path(path))
    meta = json.loads(bytes(data[_META]).decode())
    if meta["n_leaves"] != len(ref_leaves):
        raise ValueError(
            f"checkpoint {path!r} has {meta['n_leaves']} leaves but the "
            f"current config expects {len(ref_leaves)} — saved under an "
            "incompatible config or an older state layout"
        )
    leaves = []
    for i, ref in enumerate(ref_leaves):
        arr = data[f"leaf_{i:04d}"]
        if tuple(arr.shape) != tuple(np.shape(ref)):
            raise ValueError(
                f"checkpoint {path!r} leaf {i} has shape {tuple(arr.shape)} "
                f"but the current config expects {tuple(np.shape(ref))} — "
                "saved under an incompatible config or an older state layout "
                "(e.g. a different map table geometry)"
            )
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_prior_map(path: str, state: OdomState) -> None:
    """Export the surf map as a PCD prior for localization mode
    (the reverse of the reference's map_dir load)."""
    from superodom_tpu.io.pcd import write_pcd
    from superodom_tpu.mapstate import extract_points

    pts, valid = extract_points(state.surf_map)
    write_pcd(path, np.asarray(pts)[np.asarray(valid)])


def insert_prior_points(cfg: PipelineConfig, state: OdomState,
                        xyz: np.ndarray) -> OdomState:
    """Bulk-insert world-frame points into the surf map (the in-memory half
    of the reference's prior-map load, laserMapping.cpp:163-171)."""
    from superodom_tpu.mapstate import insert

    surf = state.surf_map
    # insert in bounded batches to keep scatter widths static-friendly
    batch = 65536
    res = cfg.sensor.default_plane_res
    for i in range(0, len(xyz), batch):
        chunk = xyz[i:i + batch]
        pad = batch - len(chunk)
        arr = np.pad(chunk, ((0, pad), (0, 0)))
        mask = np.arange(batch) < len(chunk)
        surf = insert(surf, cfg.map, jnp.asarray(arr), jnp.asarray(mask), res,
                      max_writes=batch)
    return state._replace(surf_map=surf)


def load_prior_map(path: str, cfg: PipelineConfig, state: OdomState,
                   thin_res: float = 0.0) -> OdomState:
    """Load a prior PCD into the surf map (reference initializationParam,
    laserMapping.cpp:163-171), thinning on the host first if requested."""
    from superodom_tpu.io.pcd import read_pcd
    from superodom_tpu import native

    xyz = read_pcd(path)
    if thin_res > 0:
        xyz = native.voxel_downsample(xyz, thin_res)
    return insert_prior_points(cfg, state, xyz)
