"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY.md
section 4 item 6 — the TPU analogue of multi-node tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpde_tpu.ops.stencils import laplacian
from dpde_tpu.parallel import make_mesh, replicate, shard_batch
from dpde_tpu.parallel.spatial import shard_field, sharded_laplacian


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {"X": np.zeros((16, 4, 4, 2), np.float32), "labels": None}
    sb = shard_batch(mesh, batch)
    assert sb["labels"] is None
    # 16 rows over 8 devices -> 2 rows per device
    shard_sizes = {s.data.shape[0] for s in sb["X"].addressable_shards}
    assert shard_sizes == {2}


def test_shard_batch_indivisible_replicates():
    mesh = make_mesh()
    sb = shard_batch(mesh, {"X": np.zeros((3, 4), np.float32)})
    assert all(s.data.shape[0] == 3 for s in sb["X"].addressable_shards)


def test_replicate():
    mesh = make_mesh()
    tree = replicate(mesh, {"w": np.ones((4, 4), np.float32)})
    assert all(s.data.shape == (4, 4)
               for s in tree["w"].addressable_shards)


def test_sharded_laplacian_matches_single_device():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    u = rng.standard_normal((2, 64, 32)).astype(np.float32)
    want = np.asarray(laplacian(jnp.asarray(u), 0.5))
    us = shard_field(mesh, jnp.asarray(u))
    got = np.asarray(sharded_laplacian(mesh, us, 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_laplacian_grad_matches():
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    u = rng.standard_normal((64, 16)).astype(np.float32)

    f_ref = lambda x: jnp.sum(jnp.cos(laplacian(x, 1.0)))
    f_sh = lambda x: jnp.sum(jnp.cos(sharded_laplacian(mesh, x, 1.0)))
    g_ref = np.asarray(jax.grad(f_ref)(jnp.asarray(u)))
    g_sh = np.asarray(jax.grad(f_sh)(shard_field(mesh, jnp.asarray(u))))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-4, atol=1e-5)


def test_dp_train_step_matches_single_device():
    """The gradient all-reduce over the mesh must reproduce the
    single-device step exactly (modulo fp reduction order)."""
    from dpde_tpu.models import Denoiser, EDMLoss, EDMUNet
    from dpde_tpu.models.ema import EMAConfig
    from dpde_tpu.training import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    net = EDMUNet(img_channels=2, label_dim=2, base_channels=32,
                  channel_mults=(1,), num_res_blocks=1)
    x0 = jnp.zeros((1, 8, 8, 2))
    params = net.init(jax.random.PRNGKey(0), x0, jnp.ones(1),
                      jnp.zeros((1, 2)), None)
    apply_fn = lambda p, xx, ss, ll, oo, train=False, rngs=None: \
        net.apply(p, xx, ss, ll, oo, train=train)
    den = Denoiser(apply_fn, params)
    tx = make_optimizer(1e-3)
    step_fn = make_train_step(den, EDMLoss(), tx, EMAConfig())

    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 8, 8, 2)).astype(np.float32)
    labels = np.zeros((8, 2), np.float32)
    key = jax.random.PRNGKey(3)

    # single device
    s1 = init_train_state(params, tx)
    s1, loss1, _ = step_fn(s1, key, jnp.asarray(x), jnp.asarray(labels),
                           None)

    # 8-device mesh
    mesh = make_mesh()
    with mesh:
        s2 = init_train_state(params, tx)
        from dpde_tpu.training.state import TrainState

        s2 = TrainState(*replicate(mesh, tuple(s2)))
        sb = shard_batch(mesh, {"X": x, "labels": labels})
        s2, loss2, _ = step_fn(s2, key, sb["X"], sb["labels"], None)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dp_guided_sampling_matches_single_device():
    """Data-parallel sampling (VERDICT round-1 item 6): the flattened
    item x sample batch sharded over the mesh must produce the same
    samples as the unsharded run — items are independent, XLA only adds
    the per-item guidance reductions over ICI."""
    from dpde_tpu.models import Denoiser, EDMUNet
    from dpde_tpu.parallel.mesh import batch_sharding
    from dpde_tpu.sampling import JointSampler, pde_losses

    net = EDMUNet(img_channels=2, label_dim=2, base_channels=32,
                  channel_mults=(1, 2), num_res_blocks=1)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 2)),
                      jnp.ones(1), jnp.zeros((1, 2)), None)
    apply_fn = lambda p, xx, ss, ll, oo, train=False, rngs=None: \
        net.apply(p, xx, ss, ll, oo, train=train)
    den = Denoiser(apply_fn, params)

    s_per, k = 4, 4                      # 16 rows over 8 devices
    b = s_per * k
    rng = np.random.default_rng(5)
    h = w = 16
    mask = np.zeros((h, w), bool)
    mask[1:-1, 1:-1] = rng.random((h - 2, w - 2)) < 0.3
    obs_a = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    obs_u = rng.standard_normal((b, h, w, 1)).astype(np.float32)
    labels = rng.uniform(0.2, 1.0, (b, 2)).astype(np.float32)
    latents = rng.standard_normal((b, h, w, 2)).astype(np.float32)

    sampler = JointSampler(den, (h, w), 2, s_per, ch_a=1,
                           loss_fn=pde_losses.heat_loss2,
                           loss_kwargs={"dx": 1 / (w - 1)}, num_steps=5)

    x_ref, l_ref = sampler.sample(
        jax.random.PRNGKey(0), jnp.asarray(labels), obs_a, obs_u,
        mask, mask, 2.0, 0.5, 1.0, return_losses=True,
        latents=jnp.asarray(latents))

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    put = lambda a: jax.device_put(jnp.asarray(a), sh)
    x_dp, l_dp = sampler.sample(
        jax.random.PRNGKey(0), put(labels), put(obs_a), put(obs_u),
        mask, mask, 2.0, 0.5, 1.0, return_losses=True,
        latents=put(latents))

    np.testing.assert_allclose(np.asarray(x_dp), np.asarray(x_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(l_dp, l_ref, rtol=1e-3, atol=1e-5)
