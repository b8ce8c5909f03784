"""Device mesh + sharding helpers (SURVEY.md §2.12).

The reference is single-device; data parallelism here is first-class and
implemented the XLA-native way: build a ``Mesh`` over the available chips,
replicate parameters, shard the batch over the ``data`` axis, and jit the
train step — the partitioner inserts the gradient all-reduces (psum over ICI)
automatically. Because losses are global-batch means, the semantics equal
large-batch single-device training (and BatchNorm becomes sync-BN across the
mesh; per-chip stats equal the reference's single-GPU behavior when the mesh
has one device).

A second ``model`` axis is provisioned for tensor parallelism: the widest
conv kernels (the 1024-channel bottleneck stages) can be sharded on their
output-channel dimension via ``partition_params``. The model is ~60M params
so TP is not needed for capacity — the axis exists so the mesh API scales,
and the dry-run exercises it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """Mesh over ``devices`` shaped (data, model). ``model_parallel`` must
    divide the device count; data parallelism takes the rest."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    if jax.process_count() == 1:
        return jax.device_put(tree, replicated(mesh))
    # Multi-process: jax.device_put with a global sharding would run a
    # cross-process equality check (one collective per leaf). Every process
    # holds the same host value (deterministic init / restored checkpoint),
    # so assemble the replicated global array directly from per-device
    # copies — collective-free.
    s = replicated(mesh)
    local_devices = [d for d in s.device_set
                     if d.process_index == jax.process_index()]

    def put(x):
        x = np.asarray(x)
        shards = [jax.device_put(x, d) for d in local_devices]
        return jax.make_array_from_single_device_arrays(x.shape, s, shards)

    return jax.tree.map(put, tree)


def _tp_spec_for(path_leaf_shape, kernel_min_ch: int):
    """Partition rule: shard conv/dense kernels whose output channel dim is
    large and divisible on the model axis; replicate everything else."""
    shape = path_leaf_shape
    if len(shape) >= 2 and shape[-1] >= kernel_min_ch:
        return P(*((None,) * (len(shape) - 1) + (MODEL_AXIS,)))
    return P()


def partition_params(params, mesh: Mesh, kernel_min_ch: int = 512):
    """Tensor-parallel placement: output-channel-shard the widest kernels.

    XLA handles the resulting cross-shard contractions with collectives on
    the ``model`` axis; correctness is unchanged (tested in
    tests/test_parallel.py), only placement differs.
    """
    if mesh.shape[MODEL_AXIS] == 1:
        return replicate_tree(params, mesh)
    tp = mesh.shape[MODEL_AXIS]

    def place(leaf):
        shape = leaf.shape
        if (len(shape) >= 2 and shape[-1] >= kernel_min_ch
                and shape[-1] % tp == 0):
            spec = P(*((None,) * (len(shape) - 1) + (MODEL_AXIS,)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)
