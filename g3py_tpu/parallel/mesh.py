"""Device-mesh helpers."""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicate"]


def make_mesh(n_devices=None, axis_names=("dp",), shape=None):
    """1-D (default) or reshaped mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = np.array(devs[:n_devices])
    if shape is not None:
        devs = devs.reshape(shape)
    return Mesh(devs, axis_names)


def data_sharding(mesh, axis="dp", rank=2):
    """NamedSharding that splits the leading (data) axis."""
    spec = [axis] + [None] * (rank - 1)
    return NamedSharding(mesh, P(*spec))


def replicate(mesh):
    return NamedSharding(mesh, P())
