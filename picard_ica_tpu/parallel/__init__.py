"""Device meshes, shardings, and explicit-psum SPMD kernels."""

from . import mesh, sharding
from .mesh import SAMPLE_AXIS, data_sharding, distributed_init, sample_mesh, shard_samples

__all__ = [
    "mesh",
    "sharding",
    "SAMPLE_AXIS",
    "sample_mesh",
    "data_sharding",
    "shard_samples",
    "distributed_init",
]
