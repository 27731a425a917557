"""Device mesh + sharding rules.

The reference is single-process single-device (SURVEY.md section 5.8); the
TPU-native scaling story is:

- **data axis**: shard the tile minibatch (inference) or the training batch
  over ICI; the ~137M-param U-Net replicates comfortably per chip.
- **model axis**: optional tensor parallelism — conv/dense kernels shard on
  their output-channel dim (column-parallel) where divisible; GSPMD inserts
  the collectives.

All sharding is jax.sharding.NamedSharding over a Mesh; compute code stays
single-device-pure and jit does the partitioning.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ('data', 'model'),
              devices=None) -> Mesh:
    """Default mesh: all devices on the data axis, model axis 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f'mesh {shape} != {n} devices'
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def mesh_from_config(conf, devices=None) -> Mesh:
    if conf.mesh_shape:
        shape = tuple(int(x) for x in conf.mesh_shape.split(','))
        return make_mesh(shape, devices=devices)
    return make_mesh(devices=devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / tile) axis over the data axis."""
    return NamedSharding(mesh, P('data'))


def canvas_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (B, H, W, C) canvas over rows; tile extraction reshapes keep
    the partition on the tile axis, so tiled sampling runs tile-data-parallel."""
    return NamedSharding(mesh, P(None, 'data', None, None))


def param_spec(path_leaf_shape, tp: int) -> P:
    """Tensor-parallel rule for one param: shard the output-channel (last)
    dim of conv/dense kernels over 'model' when divisible and large enough;
    replicate everything else (biases, norms, embeddings)."""
    name, shape = path_leaf_shape
    if tp <= 1:
        return P()
    if name == 'kernel' and len(shape) >= 2 and shape[-1] % tp == 0 and shape[-1] >= 2 * tp:
        return P(*([None] * (len(shape) - 1) + ['model']))
    return P()


def partition_params(params, mesh: Mesh):
    """NamedSharding tree for a param pytree under the mesh's model axis."""
    tp = mesh.shape['model']

    def spec_for(path, leaf):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        return NamedSharding(mesh, param_spec((name, leaf.shape), tp))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Device-put params according to partition_params."""
    shardings = partition_params(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
