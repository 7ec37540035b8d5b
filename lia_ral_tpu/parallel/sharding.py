"""Sharded sufficient-statistics accumulation.

The reference's threaded EM (``AccumulateStat.cpp:234-299``: dynamic
segment queue, per-thread MixtureStat, ``addAccEM`` merge) maps exactly to:
shard the frame axis over the "data" mesh axis, run the chunked stat
kernel per shard, ``psum`` the EmStats pytree over the axis.  The merge is
associative, so sharded == serial to float tolerance — the property the
reference implicitly tests by keeping threaded and unthreaded paths
(SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..gmm.kernels import EmStats, em_stats_chunked
from ..gmm.model import GmmDiag


def shard_frames(x: jax.Array, w: jax.Array, n_shards: int,
                 ) -> tuple[jax.Array, jax.Array]:
    """Pad the frame axis to a multiple of n_shards (zero weights on pad)."""
    n = x.shape[0]
    pad = (-n) % n_shards
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    return x, w


def sharded_em_stats(
    mesh: Mesh,
    x: jax.Array,
    w: jax.Array,
    gmm: GmmDiag,
    chunk: int = 4096,
) -> EmStats:
    """EM sufficient stats with the frame axis sharded over mesh axis
    "data"; the model is replicated; stats are psum-merged over ICI."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=P(),
    )
    def _stats(xs, ws, g):
        local = em_stats_chunked(xs, ws, g, chunk=chunk)
        return jax.lax.psum(local, axis_name="data")

    n_data = mesh.shape["data"]
    x, w = shard_frames(x, w, n_data)
    return _stats(x, w, gmm)


def sharded_stats_fn(mesh: Mesh, chunk: int = 4096):
    """stats_fn drop-in for gmm.em.train_model / map_adapt.adapt_model:
    same (x, w, gmm) → EmStats signature, jitted over the mesh."""

    @jax.jit
    def fn(x, w, gmm):
        return sharded_em_stats(mesh, x, w, gmm, chunk=chunk)

    return fn


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_along_axis(mesh: Mesh, arr: jax.Array, axis_name: str = "data"):
    """Place an array with its leading axis sharded over ``axis_name``."""
    spec = P(axis_name)
    return jax.device_put(arr, NamedSharding(mesh, spec))
