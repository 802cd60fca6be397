"""Fused NeRFAE Pallas kernel vs the pure-JAX oracle (interpret mode):
forward parity AND gradient parity — including gradients through the
latent L2-normalize between the encoder and density-transform MLPs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_atlas_tpu import models
from nerf_atlas_tpu.ops.pallas.render_ae import (
    fused_ae_render, fused_ae_render_train)

pytestmark = pytest.mark.slow  # interpret-mode Pallas


def _setup(n, steps, seed=0):
  model = models.NeRFAE(refl_kind="view", steps=steps, t_near=2.0,
                        t_far=6.0)
  key = jax.random.PRNGKey(seed)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  return model, params, rays


def test_fused_ae_render_matches_oracle():
  model, params, rays = _setup(64, 16)
  oracle = model.apply(params, rays)
  fused = fused_ae_render(params, rays, steps=16, t_near=2.0, t_far=6.0,
                          block_rays=32, interpret=True)
  np.testing.assert_allclose(np.asarray(fused[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)
  acc = oracle["weights"].sum(-1)
  np.testing.assert_allclose(np.asarray(fused[:, 3]), np.asarray(acc),
                             atol=2e-2)


def test_fused_ae_grad_matches_oracle():
  model, params, rays = _setup(32, 16, seed=3)
  target = jax.random.uniform(jax.random.PRNGKey(5), (32, 3))

  def loss_fused(p):
    out = fused_ae_render_train(p, rays, steps=16, t_near=2.0, t_far=6.0,
                                block_rays=16, bwd_block_rays=16,
                                interpret=True)
    return (jnp.mean((out[:, :3] - target) ** 2)
            + jnp.mean((out[:, 3] - 0.7) ** 2))

  def loss_oracle(p):
    out = model.apply(p, rays)
    acc = out["weights"].sum(-1)
    return (jnp.mean((out["rgb"] - target) ** 2)
            + jnp.mean((acc - 0.7) ** 2))

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)

  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  num, den = 0.0, 0.0
  enc_checked = 0
  for path, g_fused in flat_f:
    g_orc = flat_o[path]
    gf_n = np.asarray(g_fused, np.float64)
    go_n = np.asarray(g_orc, np.float64)
    num += np.sum((gf_n - go_n) ** 2)
    den += np.sum(go_n ** 2)
    if np.linalg.norm(go_n) < 1e-12:
      assert np.linalg.norm(gf_n) < 1e-6, jax.tree_util.keystr(path)
      continue
    cos = (gf_n * go_n).sum() / max(
        np.linalg.norm(gf_n) * np.linalg.norm(go_n), 1e-20)
    assert cos > 0.97, (jax.tree_util.keystr(path), cos)
    if "encode" in jax.tree_util.keystr(path):
      enc_checked += 1
  assert np.sqrt(num / den) < 0.05, np.sqrt(num / den)
  # the AE path's whole point: encoder weights get real, correctly-
  # directed gradients THROUGH the normalize + both downstream MLPs
  assert enc_checked > 10, enc_checked


def test_fused_ae_sharded_grad_matches_single():
  """shard_map multi-chip fused NeRFAE path: psum'ed weight cotangents
  match the single-shard kernel (8-device virtual CPU mesh, interpret)."""
  from nerf_atlas_tpu.ops.pallas.render_ae import (
      fused_ae_render_train_sharded)
  from nerf_atlas_tpu.parallel import make_mesh
  mesh = make_mesh(8)
  model, params, rays = _setup(128, 8, seed=11)  # 8 x 16-ray blocks
  target = jax.random.uniform(jax.random.PRNGKey(5), (128, 3))
  kw = dict(steps=8, t_near=2.0, t_far=6.0, block_rays=16,
            bwd_block_rays=16, interpret=True)

  def loss(p, sharded):
    out = (fused_ae_render_train_sharded(p, rays, mesh=mesh, **kw)
           if sharded else fused_ae_render_train(p, rays, **kw))
    return jnp.mean((out[:, :3] - target) ** 2)

  ls, gs = jax.value_and_grad(loss)(params, True)
  l1, g1 = jax.value_and_grad(loss)(params, False)
  np.testing.assert_allclose(float(ls), float(l1), rtol=1e-3)
  flat_s = jax.tree_util.tree_leaves_with_path(gs)
  flat_1 = dict(jax.tree_util.tree_leaves_with_path(g1))
  for path, g_shard in flat_s:
    a = np.asarray(g_shard, np.float64)
    b = np.asarray(flat_1[path], np.float64)
    denom = max(np.linalg.norm(b), 1e-12)
    assert np.linalg.norm(a - b) / denom < 1e-2, (
        jax.tree_util.keystr(path), np.linalg.norm(a - b) / denom)


def test_fused_ae_train_step_matches_vjp_path():
  """One-kernel NeRFAE train step vs value_and_grad over the two-kernel
  custom-VJP path (identical kernel math — tight match)."""
  from nerf_atlas_tpu.ops.pallas.render_ae import fused_ae_train_step
  model, params, rays = _setup(32, 16, seed=3)
  target = jax.random.uniform(jax.random.PRNGKey(5), (32, 3))

  def loss_vjp(p):
    out = fused_ae_render_train(p, rays, steps=16, t_near=2.0, t_far=6.0,
                                block_rays=16, bwd_block_rays=16,
                                interpret=True)
    return jnp.mean((out[:, :3] - target) ** 2)

  lo, go = jax.value_and_grad(loss_vjp)(params)
  lf, gf = fused_ae_train_step(params, rays, target, steps=16, t_near=2.0,
                               t_far=6.0, bwd_block_rays=16,
                               interpret=True)
  np.testing.assert_allclose(float(lf), float(lo), rtol=1e-5)
  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  assert len(flat_f) == len(flat_o) and flat_f
  for path, g_fused in flat_f:
    np.testing.assert_allclose(np.asarray(g_fused),
                               np.asarray(flat_o[path]),
                               rtol=1e-4, atol=5e-6,
                               err_msg=jax.tree_util.keystr(path))
