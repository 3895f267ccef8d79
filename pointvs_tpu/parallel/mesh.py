"""Device mesh construction and sharding helpers."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(num_devices: Optional[int] = None,
             devices: Optional[Sequence] = None,
             axis_name: str = 'dp') -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices.

    Graph-level data parallelism is the right first axis for this workload
    (models are <10M params; ICI all-reduce of grads is tiny next to the
    per-device compute). The mesh generalises to more axes later (graph
    sharding for very large complexes).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def get_mesh_2d(n_dp: int, n_gp: int,
                devices: Optional[Sequence] = None,
                axis_names: Sequence[str] = ('dp', 'gp')) -> Mesh:
    """2-D mesh: data parallelism over graphs x edge parallelism within
    each graph. The gp axis is the minor (fastest-varying) one so its
    psums ride neighbouring-chip ICI links."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_dp * n_gp]).reshape(n_dp, n_gp)
    return Mesh(devices, tuple(axis_names))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh.

    Multi-process (--multihost): every process passes the same host
    values (same-seed init / restored checkpoint), assembled into a
    replicated global array per leaf."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name='dp'):
    """Place a [D, ...]-stacked GraphBatch sharded over the mesh axis
    (or a [D1, D2, ...]-stacked one over a tuple of axes).

    Multi-process (--multihost): each process passes only ITS device
    rows ([D_local, ...], the loader collates exactly those — see
    main.build_loaders); the rows concatenate in process order into the
    global [D_global, ...] batch over ICI+DCN."""
    if isinstance(axis_name, (tuple, list)):
        sharding = NamedSharding(mesh, P(*axis_name))
    else:
        sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.device_put(batch, sharding)
