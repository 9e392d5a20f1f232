"""Data-parallel sharded alignment over a device mesh.

The TPU-native replacement for the reference's thread-level parallelism
(SURVEY.md §2.3: ``unsafe Send+Sync`` + ``Arc`` sharing,
src/aligner/mod.rs:533-535): a pair batch is sharded over the ``data``
axis of a 1-D mesh, every chip runs the same wavefront/scan kernel on its
shard, and per-pair outputs come back sharded the same way — XLA inserts
any collectives.  Profiles and matrices are tiny and replicated.

Multi-host: ``jax.distributed.initialize`` (driven by the caller) makes
``jax.devices()`` span hosts; ``sharded_align`` is unchanged — the mesh
covers the full slice and DCN only carries the batch scatter / result
gather at the host boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.wavefront import wavefront_align


def make_device_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), ("data",), devices=devs)


def sharded_align(
    mesh: Mesh,
    profile, qidx, ridx, qlen, rlen,
    *,
    open_, ext, mode, free, outputs, width="32",
):
    """Run the batched wavefront kernel with the batch sharded over
    ``mesh``'s ``data`` axis.

    The batch dim must divide the mesh size.  Returns the same dict as
    :func:`wavefront_align`, with every output sharded over ``data``.
    """
    batch_sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(jnp.asarray(x), batch_sharding)

    fn = functools.partial(
        wavefront_align, mode=mode, free=free, outputs=outputs, width=width)
    return fn(
        put(profile), put(qidx), put(ridx), put(qlen), put(rlen),
        open_=jnp.asarray(open_, jnp.int32), ext=jnp.asarray(ext, jnp.int32),
    )


def gather_scores(out: dict) -> dict:
    """Fetch sharded per-pair outputs to host numpy (cross-host: each
    process receives the full batch via the addressable-shards gather
    jax performs on device_get)."""
    return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
