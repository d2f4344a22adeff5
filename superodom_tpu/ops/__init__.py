from superodom_tpu.ops.eigh3 import eigh3, solve3  # noqa: F401
from superodom_tpu.ops.voxel import (  # noqa: F401
    voxel_coords,
    hash_coords,
    voxel_downsample_centroid,
    voxel_downsample_scatter,
)
