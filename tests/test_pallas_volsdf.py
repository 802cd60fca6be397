"""Fused VolSDF Pallas kernel vs the pure-JAX oracle (interpret mode):
forward parity AND gradient parity — including the learned Laplace
density scale's cotangent (accumulated in-kernel as a [1,1] column sum)
and the SDF MLP gradients through the Laplace CDF + sphere bias."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_atlas_tpu import models
from nerf_atlas_tpu.ops.pallas.render_volsdf import (
    fused_volsdf_render, fused_volsdf_render_train)

pytestmark = pytest.mark.slow  # interpret-mode Pallas


def _setup(n, steps, seed=0, **model_kw):
  model = models.VolSDF(sdf_kind="mlp", refl_kind="view", steps=steps,
                        t_near=2.0, t_far=6.0, **model_kw)
  key = jax.random.PRNGKey(seed)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  return model, params, rays


@pytest.mark.parametrize("sphere_init", [True, False])
def test_fused_volsdf_render_matches_oracle(sphere_init):
  model, params, rays = _setup(
      64, 16, sdf_kwargs={"sphere_init": sphere_init})
  oracle = model.apply(params, rays)
  fused = fused_volsdf_render(params, rays, steps=16, t_near=2.0,
                              t_far=6.0, block_rays=32, interpret=True,
                              sphere_init=sphere_init)
  np.testing.assert_allclose(np.asarray(fused[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)
  acc = oracle["weights"].sum(-1)
  np.testing.assert_allclose(np.asarray(fused[:, 3]), np.asarray(acc),
                             atol=2e-2)


def test_fused_volsdf_grad_matches_oracle():
  model, params, rays = _setup(32, 16, seed=3)
  target = jax.random.uniform(jax.random.PRNGKey(5), (32, 3))

  def loss_fused(p):
    out = fused_volsdf_render_train(p, rays, steps=16, t_near=2.0,
                                    t_far=6.0, block_rays=16,
                                    bwd_block_rays=16, interpret=True)
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
  shape_checked = 0
  for path, g_fused in flat_f:
    key = jax.tree_util.keystr(path)
    g_orc = flat_o[path]
    gf_n = np.asarray(g_fused, np.float64)
    go_n = np.asarray(g_orc, np.float64)
    if "FourierEncoder" in key:
      # stop-grad random features in the oracle; the fused path returns
      # exact zeros for them
      assert np.linalg.norm(gf_n) == 0.0 and np.linalg.norm(go_n) == 0.0
      continue
    num += np.sum((gf_n - go_n) ** 2)
    den += np.sum(go_n ** 2)
    if np.linalg.norm(go_n) < 1e-12:
      assert np.linalg.norm(gf_n) < 1e-6, key
      continue
    cos = (gf_n * go_n).sum() / max(
        np.linalg.norm(gf_n) * np.linalg.norm(go_n), 1e-20)
    assert cos > 0.97, (key, cos)
    if "shape" in key:
      shape_checked += 1
  assert np.sqrt(num / den) < 0.05, np.sqrt(num / den)
  # the VolSDF path's whole point: SDF MLP weights AND the learned scale
  # get real, correctly-directed gradients through the Laplace density
  assert shape_checked > 10, shape_checked
  scale_path = [p for p, _ in flat_f
                if "density_scale" in jax.tree_util.keystr(p)]
  assert scale_path, "density_scale missing from fused grads"


def test_fused_volsdf_eikonal_grad_matches_oracle():
  """The in-kernel eikonal (dual analytic-grad path, SURVEY §7 hard
  part): forward residual parity AND the weight gradients of the
  eikonal loss term — which the oracle computes by grad-of-grad through
  the SDF MLP — must match the hand-derived transpose-chain adjoint.
  leaky-relu makes the adjoint exact a.e. (no activation second
  derivatives)."""
  model, params, rays = _setup(32, 16, seed=7, with_normals=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (32, 3))
  LAM = 0.1

  def loss_fused(p):
    out = fused_volsdf_render_train(p, rays, steps=16, t_near=2.0,
                                    t_far=6.0, block_rays=16,
                                    bwd_block_rays=16, interpret=True,
                                    want_eikonal=True)
    assert out.shape[-1] == 5
    return (jnp.mean((out[:, :3] - target) ** 2)
            + LAM * jnp.mean(out[:, 4]))

  def loss_oracle(p):
    out = model.apply(p, rays)
    return (jnp.mean((out["rgb"] - target) ** 2)
            + LAM * out["eikonal"])

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)

  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  num, den = 0.0, 0.0
  for path, g_fused in flat_f:
    key = jax.tree_util.keystr(path)
    gf_n = np.asarray(g_fused, np.float64)
    go_n = np.asarray(flat_o[path], np.float64)
    if "FourierEncoder" in key:
      assert np.linalg.norm(gf_n) == 0.0 and np.linalg.norm(go_n) == 0.0
      continue
    num += np.sum((gf_n - go_n) ** 2)
    den += np.sum(go_n ** 2)
    if np.linalg.norm(go_n) < 1e-12:
      assert np.linalg.norm(gf_n) < 1e-6, key
      continue
    cos = (gf_n * go_n).sum() / max(
        np.linalg.norm(gf_n) * np.linalg.norm(go_n), 1e-20)
    assert cos > 0.95, (key, cos)
  assert np.sqrt(num / den) < 0.07, np.sqrt(num / den)

  # the eikonal term must actually move the SDF weights: zeroing it
  # changes the shape-MLP gradient direction
  def loss_fused_nolam(p):
    out = fused_volsdf_render_train(p, rays, steps=16, t_near=2.0,
                                    t_far=6.0, block_rays=16,
                                    bwd_block_rays=16, interpret=True,
                                    want_eikonal=True)
    return jnp.mean((out[:, :3] - target) ** 2)

  g0 = jax.grad(loss_fused_nolam)(params)
  diff = False
  flat_0 = dict(jax.tree_util.tree_leaves_with_path(g0))
  for path, g_fused in flat_f:
    if "shape" in jax.tree_util.keystr(path) and "kernel" in \
        jax.tree_util.keystr(path):
      if not np.allclose(np.asarray(g_fused), np.asarray(flat_0[path])):
        diff = True
  assert diff, "eikonal cotangent did not reach the SDF weights"


def test_fused_volsdf_train_gate(monkeypatch):
  """Driver gate logic (backend mocked to 'tpu'): the default volsdf
  recipe engages the fused path, the eikonal regularizer stays fused
  (in-kernel column), any OTHER active regularizer falls back to the
  oracle, and CLI-shaped sdf_kwargs={'sphere_init': ...} is accepted."""
  from nerf_atlas_tpu.train import driver as driver_lib
  from nerf_atlas_tpu.data import sampler as sampler_lib
  from nerf_atlas_tpu.data import cameras as cam_lib
  from nerf_atlas_tpu.data.synthetic import hemisphere_poses

  monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
  model, params, rays = _setup(
      16, 8, with_normals=True, sdf_kwargs={"sphere_init": True})
  poses = hemisphere_poses(3, seed=0)
  cam = cam_lib.NeRFCamera.from_json_transforms(poses, 0.69, 8)
  pix = jnp.zeros((3, 8, 8, 3))
  ds = sampler_lib.RayDataset(pixels=pix, camera=cam, times=None, size=8)

  def gate(**cfg_kw):
    cfg = driver_lib.TrainConfig(batch_size=128, **cfg_kw)
    return driver_lib._fused_train_fn(model, cfg, ds, None, params,
                                      None) is not None

  assert gate(reg_coeffs={"eikonal": 0.1}), "eikonal must stay fused"
  assert gate(reg_coeffs={"eikonal": 0.1, "volsdf_scale": 1e-5}), (
      "the scale anneal reads only the param — must stay fused")
  assert not gate(reg_coeffs={"eikonal": 0.1, "surface_eikonal": 0.1}), (
      "other regularizers must fall back to the oracle")
  model_no_norm, params, rays = _setup(16, 8)
  model = model_no_norm
  assert gate(), "default volsdf recipe must engage the fused path"


def test_fused_volsdf_sharded_grad_matches_single():
  """shard_map multi-chip fused VolSDF path: psum'ed weight cotangents
  (incl. the scalar scale) match the single-shard kernel (8-device
  virtual CPU mesh, interpret)."""
  from nerf_atlas_tpu.ops.pallas.render_volsdf import (
      fused_volsdf_render_train_sharded)
  from nerf_atlas_tpu.parallel import make_mesh
  mesh = make_mesh(8)
  model, params, rays = _setup(128, 8, seed=11)  # 8 x 16-ray blocks
  target = jax.random.uniform(jax.random.PRNGKey(5), (128, 3))
  kw = dict(steps=8, t_near=2.0, t_far=6.0, block_rays=16,
            bwd_block_rays=16, interpret=True)

  def loss(p, sharded):
    out = (fused_volsdf_render_train_sharded(p, rays, mesh=mesh, **kw)
           if sharded else fused_volsdf_render_train(p, rays, **kw))
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


@pytest.mark.parametrize("eik", [0.0, 1e-2])
def test_fused_volsdf_train_step_matches_vjp_path(eik):
  """One-kernel VolSDF train step (in-kernel L2 + optional in-kernel
  eikonal term) vs value_and_grad over the two-kernel custom-VJP path."""
  from nerf_atlas_tpu.ops.pallas.render_volsdf import (
      fused_volsdf_render_train, fused_volsdf_train_step)
  model, params, rays = _setup(32, 16, seed=3)
  target = jax.random.uniform(jax.random.PRNGKey(5), (32, 3))
  want_eik = eik != 0.0

  def loss_vjp(p):
    out = fused_volsdf_render_train(p, rays, steps=16, t_near=2.0,
                                    t_far=6.0, block_rays=16,
                                    bwd_block_rays=16, interpret=True,
                                    want_eikonal=want_eik)
    main = jnp.mean((out[:, :3] - target) ** 2)
    if want_eik:
      main = main + eik * jnp.mean(out[:, 4])
    return main

  lo, go = jax.value_and_grad(loss_vjp)(params)
  lf, gf = fused_volsdf_train_step(params, rays, target, steps=16,
                                   t_near=2.0, t_far=6.0,
                                   bwd_block_rays=16, interpret=True,
                                   eikonal_weight=eik)
  np.testing.assert_allclose(float(lf), float(lo), rtol=1e-5)
  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  assert len(flat_f) == len(flat_o) and flat_f
  for path, g_fused in flat_f:
    np.testing.assert_allclose(np.asarray(g_fused),
                               np.asarray(flat_o[path]),
                               rtol=1e-4, atol=5e-6,
                               err_msg=jax.tree_util.keystr(path))
