"""Data-parallel sharded alignment over a device mesh.

The TPU-native replacement for the reference's thread-level parallelism
(SURVEY.md §2.3: ``unsafe Send+Sync`` + ``Arc`` sharing,
src/aligner/mod.rs:533-535): a pair batch is sharded over the ``data``
axis of a 1-D mesh, every chip runs the same kernel on its shard via
``shard_map``, and per-pair outputs come back sharded the same way.
Profiles and matrices are tiny and replicated.

Routing matches the single-chip engine (engine/dispatch.py): the Pallas
prefix-scan kernel is the production path on TPU — the reference's hot
loop (src/aligner/mod.rs:397-452) sharded, not the debug fallback — with
the XLA wavefront kernel taking over for configurations outside the scan
kernel's exactness/memory envelope.

Multi-host: ``jax.distributed.initialize`` (driven by the caller) makes
``jax.devices()`` span hosts; ``sharded_align`` is unchanged — the mesh
covers the full slice and DCN only carries the batch scatter / result
gather at the host boundary.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.scan_kernel import LANES, scan_fits, scan_score_align
from ..ops.wavefront import wavefront_align

_STATS_OUTPUTS = ("stats", "stats_table", "stats_rowcol")


def make_device_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), ("data",), devices=devs)


def plan_sharded_route(
    *, outputs: str, gap_open: int, gap_extend: int,
    score_values, Qp: int, Rp: int, shard_batch: int,
) -> str:
    """Pick "scan" / "trace_walk" (Pallas) or "wavefront" for a sharded
    batch — the same gates as engine.dispatch.plan_route, per shard.

    "trace_walk" mirrors the single-chip route for stats at
    gap_open <= gap_extend: each shard runs the trace kernel and counts
    matches/similar/length along the device traceback walk
    (ops/trace_walk) — entirely inside shard_map, flags never leave the
    shard's device.
    """
    vals = np.asarray(score_values)
    if outputs in _STATS_OUTPUTS and gap_open <= gap_extend:
        from ..engine import dispatch as _dispatch

        if (outputs == "stats"
                and not (vals.min() < -128 or vals.max() > 127)
                and scan_fits(Qp, Rp, "trace", A=int(vals.shape[-1]))
                and Qp + Rp <= _dispatch.WAVEFRONT_TPU_MAX_SPAN
                and shard_batch * Qp * Rp <= 2 << 30
                and (os.environ.get("PT_FORCE_PALLAS") == "1"
                     or jax.default_backend() == "tpu")):
            return "trace_walk"
        return "wavefront"
    if vals.min() < -128 or vals.max() > 127:
        return "wavefront"
    from ..ops.scan_kernel import _gsel, _npk

    A = int(np.asarray(score_values).shape[-1])
    if not scan_fits(Qp, Rp, outputs, A=A):
        return "wavefront"
    cell_bytes = shard_batch * Qp * Rp
    in_bytes = shard_batch * Qp * _npk(A) * 4 if _gsel(A) else cell_bytes
    out_bytes = {"trace": 2, "table": 4, "stats_table": 16}.get(
        outputs, 0) * cell_bytes
    if in_bytes + out_bytes > 2 << 30:
        return "wavefront"
    if os.environ.get("PT_FORCE_PALLAS") == "1":
        return "scan"
    return "scan" if jax.default_backend() == "tpu" else "wavefront"


@functools.lru_cache(maxsize=128)
def _sharded_fn(mesh: Mesh, mode: str, free, outputs: str, width: str,
                shared: bool, kernel: str, interpret: bool,
                hmax_bound=None):
    """jit(shard_map(kernel)) for one (mesh, config) combination, cached so
    repeated dispatches reuse the compiled executable."""
    from .seqpar import _shard_map

    axis = mesh.axis_names[0]
    want_stats = outputs in _STATS_OUTPUTS

    def local(profile, qidx, ridx, qlen, rlen, open_, ext):
        if kernel == "trace_walk":
            # stats at open <= ext: trace kernel + device walk per shard
            # (the single-chip route under shard_map; see
            # engine.dispatch._execute_stats_via_walk)
            from ..ops.trace_walk import _walk_impl

            out = scan_score_align(
                profile, ridx, qlen, rlen, None,
                open_=open_, ext=ext, mode=mode, free=free, width=width,
                outputs="trace", interpret=interpret,
                hmax_bound=hmax_bound)
            trace = out.pop("trace_table")
            Qp, Rp = trace.shape[1], trace.shape[2]
            is_local = mode == "sw"
            qb, _qe, db, _de = (True,) * 4 if is_local else free
            m, s, ln = _walk_impl(
                trace, qidx, ridx, out["end_query"], out["end_ref"],
                Qp, Rp, is_local, qb, db, sub=profile)
            out.update(matches=m, similar=s, length=ln)
            return out
        if kernel == "scan":
            return scan_score_align(
                profile, ridx, qlen, rlen, qidx if want_stats else None,
                open_=open_, ext=ext, mode=mode, free=free, width=width,
                outputs=outputs, interpret=interpret,
                hmax_bound=hmax_bound)
        return wavefront_align(
            profile, qidx, ridx, qlen, rlen, open_=open_, ext=ext,
            mode=mode, free=free, outputs=outputs, width=width)

    qspec = P() if shared else P(axis)
    fn = _shard_map(
        local, mesh,
        in_specs=(qspec, qspec, P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
    )
    return jax.jit(fn)


def sharded_align(
    mesh: Mesh,
    profile, qidx, ridx, qlen, rlen,
    *,
    open_, ext, mode, free, outputs, width="32", route="auto",
):
    """Run the production alignment kernel with the batch sharded over
    ``mesh``'s first axis.

    ``route``: "auto" picks the Pallas scan kernel whenever the engine's
    own dispatch gates would (TPU backend or PT_FORCE_PALLAS=1), else the
    XLA wavefront; "scan"/"wavefront" force a kernel.  The batch is padded
    internally to whatever the route needs (a multiple of devices, and of
    128 lanes per device for the scan kernel); outputs are sliced back to
    the true batch.  Returns the same dict as :func:`wavefront_align`,
    with every output sharded over the mesh axis.

    ``profile``/``qidx`` with a leading dim of 1 (profile reuse — one
    query against many references) are replicated across the mesh rather
    than sharded.
    """
    ndev = math.prod(mesh.devices.shape)
    axis = mesh.axis_names[0]
    profile = np.asarray(profile)
    qidx = np.asarray(qidx)
    ridx = np.asarray(ridx)
    qlen = np.asarray(qlen, np.int32)
    rlen = np.asarray(rlen, np.int32)
    B, Rp = ridx.shape
    Qp = profile.shape[1]
    shared = profile.shape[0] == 1

    if route == "auto":
        unit = ndev * LANES
        shard_b = (B + unit - 1) // unit * unit // ndev
        route = plan_sharded_route(
            outputs=outputs, gap_open=int(open_), gap_extend=int(ext),
            score_values=profile, Qp=Qp, Rp=Rp, shard_batch=shard_b)
    unit = ndev * LANES if route in ("scan", "trace_walk") else ndev
    Bp = (B + unit - 1) // unit * unit

    def padb(x):
        if Bp == x.shape[0]:
            return x
        return np.pad(x, [(0, Bp - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    batch_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put(x, is_shared):
        return jax.device_put(jnp.asarray(x), rep if is_shared else
                              batch_sharding)

    interpret = jax.default_backend() != "tpu"
    hb = None
    if route in ("scan", "trace_walk"):
        # packed-candidate gate (see engine.dispatch._hmax_bound)
        smax = int(max(abs(int(profile.min())), abs(int(profile.max()))))
        raw = (smax + int(open_) + int(ext)) * (Qp + Rp)
        hb = 1 << max(1, raw - 1).bit_length()
    fn = _sharded_fn(mesh, mode, tuple(free), outputs, width, shared,
                     route, interpret, hb)
    out = fn(
        put(profile if shared else padb(profile), shared),
        put(qidx if shared else padb(qidx), shared),
        put(padb(ridx), False), put(padb(qlen), False),
        put(padb(rlen), False),
        jnp.asarray(open_, jnp.int32), jnp.asarray(ext, jnp.int32),
    )
    if Bp != B:
        # slicing a sharded array needs an explicit result sharding; keep
        # the batch axis sharded when the true batch still divides the mesh
        crop = NamedSharding(mesh, P(axis) if B % ndev == 0 else P())
        out = {k: v.at[:B].get(out_sharding=crop) for k, v in out.items()}
    return out


def gather_scores(out: dict) -> dict:
    """Fetch sharded per-pair outputs to host numpy (cross-host: each
    process receives the full batch via the addressable-shards gather
    jax performs on device_get)."""
    return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}
