"""Device mesh construction and sharding helpers.

The reference is single-process, single-GPU ("cuda:0" hard-coded,
diffuser/utils/arrays.py:7; SURVEY.md section 2.10). Scale-out here is
TPU-native from the start:

- a ('data', 'seq') mesh: batch sharded over `data` for training; the time
  axis of long-horizon sampling shardable over `seq` (block-local attention
  maps onto neighbor halo exchange),
- sharding via NamedSharding + jit; XLA inserts psum/all_gather over ICI,
- multi-host: `jax.distributed.initialize()` then the same code — the mesh
  spans all processes' devices and each host feeds its local shard
  (host-sharded input pipeline in data/datasets.py + make_device_batch).
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Multi-host runtime init (SURVEY.md section 5 "Distributed comm
    backend"): call once per host before building the mesh; afterwards
    jax.devices() spans the pod slice and the same mesh/sharding code runs
    unchanged. No-op when already initialized or single-process with no
    coordinator configured.

    NOTE: must run before anything touches a backend — even
    jax.process_count() initializes one, after which distributed.initialize
    raises. So the already-initialized check reads the distributed client
    state directly instead of calling backend-touching APIs."""
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        # single-process run with no coordinator configured: nothing to do
        # (jax.distributed.initialize would try env-based auto-detection)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    data: int | None = None,
    seq: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'seq') mesh. Defaults to all devices on `data`."""
    devs = list(devices) if devices is not None else jax.devices()
    if data is None:
        data = len(devs) // seq
    if data * seq != len(devs):
        raise ValueError(f"mesh {data}x{seq} != {len(devs)} devices")
    arr = np.asarray(devs).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, D) with the horizon sharded over `seq` (long-horizon
    sampling; see models/local_attention.py for the halo-exchange mapping)."""
    return NamedSharding(mesh, P("data", "seq", None))


def shard_batch(mesh: Mesh, batch, global_rows: int | None = None):
    """Place a host pytree of arrays with the batch axis sharded on `data`.

    Under multi-host, each process passes its LOCAL equal slice of the
    batch axis and this uses make_array_from_process_local_data so the
    global array spans hosts. That equal-slice contract only works when
    the `data` axis is process-aligned (each process's devices own
    exactly its slice — the production pod layout: data across hosts, seq
    within a host). When the mesh's seq axis CROSSES processes (e.g. a
    2x2 data x seq grid over 4 single-device processes), data shards are
    replicated across processes and an equal split no longer matches the
    addressable shards — for that regime every process passes the GLOBAL
    batch and sets `global_rows` to its row count; the helper then slices
    out each process's addressable part.
    """
    sh = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            # global_shape must be explicit — otherwise the helper treats
            # the local slice as the whole array
            if global_rows is not None and x.shape[0] == global_rows:
                gshape = x.shape
            else:
                gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
