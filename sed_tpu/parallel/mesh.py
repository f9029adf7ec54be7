"""Device mesh and sharding helpers.

The reference's only distribution strategy is single-process
``torch.nn.DataParallel`` (``pytorch/main_strong.py:217``; SURVEY §2.12).
The TPU-native replacement is a 1-D data mesh: the batch is sharded over
the ``data`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI during ``jit`` compilation of the global-batch loss.
A second optional ``model`` axis is exposed for FSDP-style parameter
sharding of the larger models (Cnn_14*, 94 M params).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data',),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With the default 1-D ``('data',)`` axis this is pure data parallelism;
    pass ``axis_names=('data', 'model')`` and a 2-D ``shape`` for hybrid
    data x model sharding.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = 'data') -> dict:
    """Device-put every array in a batch dict with its batch axis sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
