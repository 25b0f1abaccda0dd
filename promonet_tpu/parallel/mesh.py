"""Device-mesh parallelism.

No reference counterpart (the reference is single-GPU; SURVEY.md §2.9).
Training shards the global batch over the 'data' axis of a
`jax.sharding.Mesh`; parameters and optimizer state are replicated.
Gradient all-reduce is inserted by XLA's sharding propagation (GSPMD)
under `jax.jit` and rides ICI within a slice. The design scales to
multi-axis meshes (e.g. ('data', 'model')) without touching the train
step: sharding is expressed entirely through in/out shardings.
"""
import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import promonet_tpu


def create_mesh(shape=None, axis_names=None, devices=None):
    """Create a device mesh

    Arguments
        shape: dict axis name -> size, e.g. {'data': 8}. Defaults to the
            configured MESH_SHAPE, else all devices on the 'data' axis.
        axis_names: ordering of axes; defaults to dict order
        devices: devices to use; defaults to jax.devices()
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = promonet_tpu.MESH_SHAPE
    if shape is None:
        shape = {'data': len(devices)}
    if axis_names is None:
        axis_names = tuple(shape.keys())
    sizes = tuple(shape[name] for name in axis_names)
    count = int(np.prod(sizes))
    mesh_devices = mesh_utils.create_device_mesh(
        sizes, devices=devices[:count])
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh, axis='data'):
    """Sharding that splits the leading (batch) axis over the data axis"""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh):
    """Fully-replicated sharding (parameters, optimizer state)"""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis='data'):
    """Place a host batch onto the mesh, sharded along the leading axis

    Non-array metadata (text, stems) is dropped — it cannot cross the
    jit boundary.
    """
    sharding = batch_sharding(mesh, axis)
    return {
        key: jax.device_put(np.asarray(value), sharding)
        for key, value in batch.items()
        if key not in ('text', 'stems')}


def replicate_batch(batch, mesh):
    """Place a host batch fully replicated (e.g. batch-size-1 validation
    batches that do not divide the data axis)"""
    sharding = replicated_sharding(mesh)
    return {
        key: jax.device_put(np.asarray(value), sharding)
        for key, value in batch.items()
        if key not in ('text', 'stems')}


def shard_pytree(pytree, mesh):
    """Replicate a pytree (params / optimizer state) across the mesh"""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), pytree)


def parameter_shardings(params, mesh, axis='model', min_size=64):
    """Tensor-parallel shardings for model parameters

    At these model sizes (~15-30M params) data parallelism alone is the
    right default (SURVEY.md §2.9); when a 'model' axis exists, wide
    convolution kernels shard their output-channel axis across it and
    XLA GSPMD inserts the matching all-gathers/reduce-scatters. Returns
    a pytree of NamedShardings aligned with `params`.

    Arguments
        params: parameter pytree
        mesh: a Mesh that includes `axis`
        min_size: smallest channel dimension worth sharding
    """
    if axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    size = mesh.shape[axis]

    def spec_for(leaf):
        # Conv kernels are (k, in, out) / (kh, kw, in, out); dense are
        # (in, out). Shard the trailing (output-feature) axis when it
        # divides the axis size and is large enough to matter.
        if (
            hasattr(leaf, 'ndim') and leaf.ndim >= 2 and
            leaf.shape[-1] >= min_size and leaf.shape[-1] % size == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (leaf.ndim - 1) + [axis])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def shard_parameters(params, mesh, axis='model', min_size=64):
    """Place parameters with tensor-parallel shardings"""
    shardings = parameter_shardings(params, mesh, axis, min_size)
    return jax.tree.map(jax.device_put, params, shardings)
