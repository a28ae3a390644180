"""Device-mesh construction and axis-name conventions.

The reference zoo scales with NCCL DDP (e.g. Lightning
``strategy="ddp_find_unused_parameters_true"`` at MoCE-IR-main/src/train.py:131,
raw ``dist.init_process_group`` at DarkIR-main/utils/test_utils.py:14-27).
Here a single `jax.sharding.Mesh` replaces all of that:

* ``data``    — batch-parallel axis (the DDP analog; gradient all-reduce is
                inserted by XLA from sharding constraints, not by hand).
* ``expert``  — expert-parallel axis for MoE decoders (the reference's
                SparseDispatcher routes within one GPU; we shard the expert
                bank over chips when it grows).
* ``spatial`` — spatial-parallel axis for whole-image tiled inference with
                halo exchange over ICI (the TPU analog of
                NeRD-Rain window_partitionx tiling, layers.py:249-304).

Collectives (psum/ppermute) ride ICI inside a slice and DCN across slices;
XLA picks the routing from the mesh's physical layout.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class AxisNames:
    data: str = "data"
    expert: str = "expert"
    spatial: str = "spatial"


AXES = AxisNames()


def make_mesh(
    mesh_shape: Sequence[int] | None = None,
    axis_names: Sequence[str] = ("data", "expert", "spatial"),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh over all (or given) devices.

    If ``mesh_shape`` is None, all devices go on the leading (data) axis and
    remaining axes get size 1 — the single-chip and pure-DP default. On a
    real pod, pass e.g. ``(4, 2, 1)`` for 4-way DP x 2-way EP.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != #devices {n}")
    return Mesh(devices.reshape(mesh_shape), axis_names=tuple(axis_names))


def data_parallel_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    return make_mesh(None, ("data",), devices)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of NHWC tensors over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = "data") -> int:
    size = mesh.shape[axis]
    if global_batch % size:
        raise ValueError(f"batch {global_batch} not divisible by mesh axis {axis}={size}")
    return global_batch // size
