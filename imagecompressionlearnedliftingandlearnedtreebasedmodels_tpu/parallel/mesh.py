"""Device mesh + sharding helpers.

Data parallelism over the batch axis replaces the reference's absent DDP;
gradients are combined by XLA-inserted psum over ICI when the jitted step
consumes a batch sharded over the ``data`` axis with replicated params.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; replicate everything else."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the H (row) dim of an NHWC image — used by tiled high-res
    encode where one image spans the mesh."""
    return NamedSharding(mesh, P(None, axis))


def shard_pytree(tree, sharding: NamedSharding):
    return jax.device_put(tree, sharding)
