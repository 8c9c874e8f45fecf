"""Spatial (image-height) sharding — the TPU analog of sequence parallelism.

The reference has no long-axis parallelism (SURVEY.md §5: it processes whole
frames per GPU at fixed sizes). On TPU the natural way to scale the long
axis — image resolution — is to shard H over the mesh and let XLA's SPMD
partitioner insert the halo exchanges every convolution needs at shard
boundaries, the cross-device ``psum``s behind InstanceNorm's spatial
statistics, and the collectives behind region-wise mask pooling. No manual
``ppermute`` choreography: the partitioner derives all of it from one
``NamedSharding`` on the inputs, and the collectives ride ICI.

Use case: frames whose activations exceed one chip's HBM (e.g. ×8 SR of
large endoscopy stills), or latency-critical single-frame inference where
batch parallelism gives nothing. For batched throughput, plain data
parallelism (``endosr/parallel/mesh.py``) is the right axis.

The functions here are model-agnostic: they wrap any ``fn(params, *arrays)``
whose array arguments are NHWC images sharded on axis 1 (H). Every shipped
generator qualifies: convs, SEAN/SPADE modulation, pixel-shuffle and
interpolation are all height-local or reduce over the full image (psum).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from endosr.parallel.mesh import get_mesh

__all__ = ["spatial_jit", "shard_spatial", "spatial_forward"]


def _h_sharding(mesh: Mesh, axis: str) -> NamedSharding:
    return NamedSharding(mesh, P(None, axis))


def _check_min_rows(h: int, n: int, min_rows: int = 4) -> None:
    """Reject degenerate shards at every entry point (not just
    spatial_forward): XLA's halo exchange reaches only nearest neighbors,
    so a 3×3 stride-2 conv whose input shards hold a single row silently
    corrupts (needs rows from TWO devices away — measured H=16 over 8
    devices diverges ~9e-2 while H≥24 is exact). Shipped generators
    downsample H by ≤4 before any strided conv, so H ≥ 4·mesh keeps every
    such input at ≥2 rows per shard. Callers whose fn has no strided conv
    may pass a smaller ``min_rows``."""
    if h < min_rows * n:
        raise ValueError(
            f"spatial sharding needs H ≥ {min_rows}·mesh ({min_rows * n}), "
            f"got {h} — smaller frames don't need sharding; run them on one "
            "chip (pass min_rows to relax for stride-1-only programs)")


def shard_spatial(arrays, mesh: Mesh | None = None, axis: str = "data",
                  min_rows: int = 4):
    """Device-put NHWC arrays with H (axis 1) sharded over the mesh.

    H must divide by the mesh size — callers pad to a multiple first
    (flagship shapes are powers of two, so this is free in practice).
    """
    mesh = mesh or get_mesh()
    s = _h_sharding(mesh, axis)

    def put(x):
        assert x.ndim >= 2 and x.shape[1] % mesh.devices.size == 0, (
            f"H={x.shape[1]} must divide the {mesh.devices.size}-way mesh")
        _check_min_rows(x.shape[1], mesh.devices.size, min_rows)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, arrays)


def spatial_jit(fn, mesh: Mesh | None = None, axis: str = "data",
                n_array_args: int | None = None, min_rows: int = 4):
    """jit ``fn(params, *arrays)`` with every array input/output H-sharded.

    ``params`` (first argument) is replicated; all remaining arguments and
    all outputs carry ``P(None, axis)``. XLA's SPMD partitioner turns the
    single-device program into the per-shard program + halo exchanges.
    """
    mesh = mesh or get_mesh()
    s = _h_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())

    def shardings_for(args):
        return tuple(jax.tree_util.tree_map(lambda _: s, a) for a in args)

    def wrapped(params, *arrays):
        return fn(params, *arrays)

    n = n_array_args
    if n is None:
        # build lazily at first call so we can mirror the pytree structure;
        # keyed by the params/arrays treedefs — in_shardings bake the first
        # call's tree structure, so a differently-structured params tree
        # must get its own compiled entry, not a mis-sharded reuse
        _cache = {}

        def call(params, *arrays):
            for a in jax.tree_util.tree_leaves(arrays):
                if hasattr(a, "ndim") and a.ndim >= 2:
                    _check_min_rows(a.shape[1], mesh.devices.size, min_rows)
            key = (jax.tree_util.tree_structure(params),
                   jax.tree_util.tree_structure(arrays))
            if key not in _cache:
                _cache[key] = jax.jit(
                    wrapped,
                    in_shardings=(jax.tree_util.tree_map(lambda _: rep, params),
                                  *shardings_for(arrays)),
                    out_shardings=s,
                )
            return _cache[key](params, *arrays)

        return call

    jitted = jax.jit(
        wrapped,
        in_shardings=(rep,) + (s,) * n,
        out_shardings=s,
    )

    def call_static(params, *arrays):
        for a in arrays:
            if hasattr(a, "ndim") and a.ndim >= 2:
                _check_min_rows(a.shape[1], mesh.devices.size, min_rows)
        return jitted(params, *arrays)

    return call_static


def spatial_forward(net, params, lq, depth_map, depth_mask,
                    mesh: Mesh | None = None, axis: str = "data"):
    """H-sharded DepthNet-family forward: one call, SPMD over the mesh.

    ``net``: a flax module with ``apply({'params': ...}, lq, depth, mask)``
    (DepthNet, SFTMD variants, …). Inputs are host or device arrays; they are
    placed with H sharded, the jitted forward runs with halo exchanges over
    ICI, and the SR output comes back H-sharded (device_get assembles it).
    """
    mesh = mesh or get_mesh()
    _check_min_rows(lq.shape[1], mesh.devices.size)
    fwd = spatial_jit(
        lambda p, a, d, m: net.apply({"params": p}, a, d, m),
        mesh=mesh, axis=axis, n_array_args=3,
    )
    lq, depth_map, depth_mask = shard_spatial(
        (lq, depth_map, depth_mask), mesh, axis)
    return fwd(params, lq, depth_map, depth_mask)
