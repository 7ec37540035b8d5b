import numpy as np

import jax
import jax.numpy as jnp

from lia_ral_tpu.gmm import GmmDiag, em_stats_chunked, train_model, TrainCfg, mixture_init
from lia_ral_tpu.parallel import make_mesh, sharded_em_stats, sharded_stats_fn


def random_gmm(rng, k, d):
    w = rng.random(k) + 0.1
    w /= w.sum()
    return GmmDiag.create(w, rng.standard_normal((k, d)),
                          rng.random((k, d)) + 0.5)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_equals_serial(rng):
    """psum-merged sharded stats == single-device stats (the reference's
    threaded==unthreaded oracle, SURVEY.md §4)."""
    k, d, n = 6, 5, 1000
    gmm = random_gmm(rng, k, d)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.random(n), jnp.float32)
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    serial = em_stats_chunked(x, w, gmm, chunk=128)
    shard = sharded_em_stats(mesh, x, w, gmm, chunk=128)
    for a, b in zip(jax.tree.leaves(serial), jax.tree.leaves(shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_unpadded_frame_count(rng):
    """n not divisible by n_shards: pad frames must not change stats."""
    k, d, n = 4, 3, 1001   # 1001 % 8 != 0
    gmm = random_gmm(rng, k, d)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.ones(n, jnp.float32)
    mesh = make_mesh()
    st = sharded_em_stats(mesh, x, w, gmm, chunk=64)
    assert abs(float(st.count) - n) < 0.5


def test_train_model_with_sharded_stats(rng):
    """Full EM loop with the mesh-sharded accumulator converges the same
    direction as the serial one."""
    d, k, n = 4, 8, 4000
    centers = rng.standard_normal((k, d)) * 3
    x = jnp.asarray(centers[rng.integers(0, k, n)]
                    + rng.standard_normal((n, d)) * 0.5, jnp.float32)
    w = jnp.ones(n, jnp.float32)
    mesh = make_mesh()
    cfg = TrainCfg(nb_train_it=3, bagged_frame_probability=1.0)
    init = mixture_init(jax.random.key(0), x, w, k, 1.0)
    serial = train_model(jax.random.key(1), x, w, init, cfg)
    sharded = train_model(jax.random.key(1), x, w, init, cfg,
                          stats_fn=sharded_stats_fn(mesh, chunk=512))
    np.testing.assert_allclose(np.asarray(serial.means),
                               np.asarray(sharded.means),
                               rtol=5e-3, atol=5e-3)


def test_2d_sharded_equals_serial(rng):
    """data x model 2-D sharding == serial stats (components sharded,
    softmax normalisation via cross-axis collectives)."""
    from lia_ral_tpu.parallel import make_mesh, sharded_em_stats_2d
    from lia_ral_tpu.gmm import em_stats_chunked
    k, d, n = 8, 5, 1000
    gmm = random_gmm(rng, k, d)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.random(n), jnp.float32)
    mesh = make_mesh(n_data=4, n_model=2)
    serial = em_stats_chunked(x, w, gmm, chunk=128)
    shard = sharded_em_stats_2d(mesh, x, w, gmm, chunk=128)
    for a, b in zip(jax.tree.leaves(serial), jax.tree.leaves(shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_sharded_tv_e_step_equals_serial(rng):
    """Speaker-sharded TV E-step psum == serial (the reference's threaded
    estimateAandC under mutexes, AccumulateTVStat.cpp:1944)."""
    from lia_ral_tpu.fa.stats import BwStats
    from lia_ral_tpu.fa.tv import TvModel, init_t, tv_e_step
    from lia_ral_tpu.parallel.sharding import sharded_tv_e_step

    k, d, r, s = 4, 3, 2, 16
    gmm = random_gmm(rng, k, d)
    model = init_t(jax.random.PRNGKey(0), r, gmm)
    stats = BwStats(
        n=jnp.asarray(rng.random((s, k)) * 20 + 1, jnp.float32),
        f=jnp.asarray(rng.standard_normal((s, k, d)) * 5, jnp.float32))
    mesh = make_mesh()
    w_ser, acc_ser = tv_e_step(stats, model, chunk=4)
    w_sh, acc_sh = sharded_tv_e_step(mesh, stats, model, chunk=2)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w_ser),
                               rtol=2e-3, atol=2e-3)
    for a, b in zip(jax.tree.leaves(acc_ser), jax.tree.leaves(acc_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
