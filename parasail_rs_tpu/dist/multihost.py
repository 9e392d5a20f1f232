"""Multi-host process-group setup and cross-host result gathering.

The reference has no distributed layer at all (SURVEY.md §2.3/§5.8); the
TPU-native story is: one Python process per host, connected with
``jax.distributed.initialize``, a global mesh spanning every chip in the
slice, pair batches sharded over the global ``data`` axis (each host
feeds its addressable shard), and scores/ends gathered with
``multihost_utils``.  ICI carries in-slice collectives; DCN only sees
the batch scatter / result gather at the host boundary.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or bootstrap) the multi-host process group.

    On TPU pods with standard env metadata every argument is
    auto-detected; for CPU-based simulation pass all three explicitly
    (see tests/test_multihost.py).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data"):
    """A 1-D mesh over every device in the slice (all hosts)."""
    import jax

    return jax.make_mesh((len(jax.devices()),), (axis,))


def host_local_to_global(mesh, arrays: dict):
    """Assemble per-host shards into global batch-sharded arrays.

    Each process passes ITS slice of the batch (same order across
    processes); the result is a global jax.Array sharded over ``data``.
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return {
        k: multihost_utils.host_local_array_to_global_array(v, mesh, P("data"))
        for k, v in arrays.items()
    }


def global_to_host_local(mesh, out: dict):
    """Fetch the full (concatenated) per-pair outputs on every host
    (cross-host allgather over DCN)."""
    from jax.experimental import multihost_utils

    return {
        k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
        for k, v in out.items()
    }


def align_global(mesh, profile, qidx, ridx, qlen, rlen, *,
                 open_, ext, mode, free, outputs, width="32"):
    """Multi-host batched alignment: host-local shards in, full results
    out on every host."""
    from ..ops.wavefront import wavefront_align

    ins = host_local_to_global(mesh, {
        "profile": profile, "qidx": qidx, "ridx": ridx,
        "qlen": qlen, "rlen": rlen,
    })
    out = wavefront_align(
        ins["profile"], ins["qidx"], ins["ridx"], ins["qlen"], ins["rlen"],
        open_=np.int32(open_), ext=np.int32(ext),
        mode=mode, free=free, outputs=outputs, width=width,
    )
    return global_to_host_local(mesh, out)
