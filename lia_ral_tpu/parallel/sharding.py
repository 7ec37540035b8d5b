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


def sharded_em_stats_2d(
    mesh: Mesh,
    x: jax.Array,
    w: jax.Array,
    gmm: GmmDiag,
    chunk: int = 4096,
) -> EmStats:
    """2-D sharded stats: frames over "data" AND components over "model".

    For UBMs/T-matrices beyond one chip's HBM (SURVEY.md §2.6 "model
    sharding"): each device holds K/m components; the posterior
    normalisation needs the global logsumexp over K, realised as
    pmax/psum collectives over the "model" axis before the local stat
    matmuls.  Outputs stay component-sharded; frame-axis reduction is a
    psum over "data".
    """
    from ..gmm.kernels import weighted_logdens

    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    k, d = gmm.means.shape
    assert k % n_model == 0, (k, n_model)
    x, w = shard_frames(x, w, n_data)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"),
                  GmmDiag(weights=P("model"), means=P("model"),
                          cov_inv=P("model"))),
        out_specs=EmStats(n=P("model"), sum_x=P("model"), sum_xx=P("model"),
                          llk=P(), count=P()),
    )
    def _stats(xs, ws, g):
        nloc = xs.shape[0]
        pad = (-nloc) % chunk
        xs = jnp.concatenate([xs, jnp.zeros((pad, d), xs.dtype)])
        ws = jnp.concatenate([ws, jnp.zeros((pad,), ws.dtype)])

        def body(acc, blk):
            xb, wb = blk
            ld = weighted_logdens(xb, g)                   # (B, K/m)
            m_loc = jnp.max(ld, axis=-1)
            m_glob = jax.lax.pmax(m_loc, axis_name="model")
            s_loc = jnp.sum(jnp.exp(ld - m_glob[:, None]), axis=-1)
            s_glob = jax.lax.psum(s_loc, axis_name="model")
            llk = jnp.log(s_glob) + m_glob                 # (B,)
            post = jnp.exp(ld - llk[:, None])              # local slice of γ
            pw = post * wb[:, None]
            return EmStats(
                n=acc.n + jnp.sum(pw, axis=0),
                sum_x=acc.sum_x + jnp.dot(
                    pw.T, xb, preferred_element_type=jnp.float32),
                sum_xx=acc.sum_xx + jnp.dot(
                    pw.T, xb * xb, preferred_element_type=jnp.float32),
                llk=acc.llk + jnp.sum(llk * wb) / n_model,
                count=acc.count + jnp.sum(wb) / n_model,
            ), None

        # varying over BOTH mesh axes (data via ws, model via g)
        zero = jnp.sum(ws[:1]) * 0.0 + jnp.sum(g.weights[:1]) * 0.0
        init = jax.tree.map(
            lambda z: z + zero.astype(z.dtype),
            EmStats.zeros(k // n_model, d, xs.dtype))
        acc, _ = jax.lax.scan(body, init,
                              (xs.reshape(-1, chunk, d),
                               ws.reshape(-1, chunk)))
        # frame-axis merge over "data"; llk/count also merged over "model"
        # (pre-divided above so the double psum is exact)
        return EmStats(
                n=jax.lax.psum(acc.n, "data"),
                sum_x=jax.lax.psum(acc.sum_x, "data"),
                sum_xx=jax.lax.psum(acc.sum_xx, "data"),
                llk=jax.lax.psum(acc.llk, ("data", "model")),
                count=jax.lax.psum(acc.count, ("data", "model")),
            )

    return _stats(x, w, gmm)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_along_axis(mesh: Mesh, arr: jax.Array, axis_name: str = "data"):
    """Place an array with its leading axis sharded over ``axis_name``."""
    spec = P(axis_name)
    return jax.device_put(arr, NamedSharding(mesh, spec))


def sharded_tv_e_step(mesh: Mesh, stats, model, chunk: int = 64):
    """TV E-step with the speaker axis sharded over mesh axis "data".

    The reference threads estimateAandC over speakers with shared A/C
    accumulators under mutexes (AccumulateTVStat.cpp:1798-1799,1944);
    here each device accumulates its speaker shard's TvAccums and the
    pytree is psum-merged over ICI.  The per-speaker i-vector posteriors
    w stay sharded (all_gather-free — they are consumed shard-local by
    downstream per-speaker work).

    Returns (w (S,R) sharded over "data", TvAccums replicated).
    """
    from ..fa.stats import BwStats
    from ..fa.tv import tv_e_step

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P()),
        out_specs=(P("data"), P()),
        check_vma=False,   # scan carry starts unvarying (zeros init)
    )
    def _estep(n_loc, f_loc, mdl):
        w, acc = tv_e_step(BwStats(n=n_loc, f=f_loc), mdl, chunk=chunk)
        return w, jax.lax.psum(acc, axis_name="data")

    return _estep(stats.n, stats.f, model)
