"""Device-mesh construction and sharding helpers.

Replaces the reference's process pools / MPI ranks / GPU semaphores
(SURVEY §2.3) with a jax.sharding.Mesh: tiles and blocks are data-parallel
over the 'data' axis; large single blocks shard their z axis over 'z'
(the sequence-parallel analog — SURVEY §5 long-context mapping).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "default_mesh", "data_sharding", "block_sharding",
           "P"]


def make_mesh(n_devices: Optional[int] = None,
              z_parallel: int = 1) -> Mesh:
    """Mesh with axes ('data', 'z'): data-parallel over blocks/tiles, with
    optional intra-block z sharding."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % z_parallel == 0, (n, z_parallel)
    arr = np.array(devices).reshape(n // z_parallel, z_parallel)
    return Mesh(arr, ("data", "z"))


def default_mesh():
    """(mesh_or_None, plane_batch): the pipelines' shared policy — a
    ('data', 'z'=1) mesh when more than one device is visible, else no
    mesh with a 4-plane dispatch batch (amortizes remote-backend dispatch
    latency on a single device).  One home so process_images, tsv_tools
    and future callers cannot drift apart."""
    if len(jax.devices()) > 1:
        return make_mesh(), 1
    return None, 4


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def block_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard (batch, z, y, x): batch over 'data', z over 'z'."""
    spec = ["data", "z"] + [None] * (ndim - 2)
    return NamedSharding(mesh, P(*spec))


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map with varying-mesh-axes checking disabled: Pallas
    pallas_call outputs carry no `vma` annotation, so newer JAX versions
    reject kernels inside a checked shard_map (ValueError: vma ... must
    not be None).  All our shard_maps are pure per-device data
    parallelism, where the check adds nothing.  Falls back through the
    historical keyword spellings."""
    import jax

    try:
        from jax import shard_map as _sm
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return _sm(f, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, **kw)
        except TypeError:
            continue
    raise RuntimeError("no compatible shard_map signature")
