"""Golden quality tests: flagship PlainNeRF-CP convergence and SDF-fit
surface rendering on the procedural scene (SURVEY §4 strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_atlas_tpu import models
from nerf_atlas_tpu.data import loaders, sampler, synthetic
import pytest

pytestmark = pytest.mark.slow  # 400-600-step convergence fits


def test_plain_cp_fits_synthetic_scene():
  bundle = loaders.synthetic_spheres(size=32, num_views=6)
  ds = sampler.RayDataset.from_bundle(bundle, size=32)
  model = models.PlainNeRF(steps=32, t_near=1.5, t_far=4.5, enc_kind="cp")
  rays0, _, _ = ds.sample_rays(jax.random.PRNGKey(9), 64)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays0, train=True)
  opt = optax.adam(1e-3)
  state = opt.init(params)

  @jax.jit
  def step(params, state, key):
    k1, k2 = jax.random.split(key)
    rays, pix, _ = ds.sample_rays(k1, 1024)

    def loss_fn(p):
      out = model.apply(p, rays, train=True, rngs={"sampler": k2})
      return jnp.mean((out["rgb"] - pix[..., :3]) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(params)
    up, state2 = opt.update(g, state)
    return optax.apply_updates(params, up), state2, loss

  key = jax.random.PRNGKey(3)
  for i in range(400):
    key, k = jax.random.split(key)
    params, state, loss = step(params, state, k)
  psnr = -10 * np.log10(max(float(loss), 1e-10))
  assert psnr > 20, psnr


def test_sdf_direct_fit_and_surface_render():
  """Fit the MLP SDF to the analytic scene SDF by regression, then check
  the surface renderer's silhouette against ground truth."""
  shape = models.load_sdf_shape("mlp")
  key = jax.random.PRNGKey(0)
  pts0 = jax.random.uniform(key, (2048, 3), minval=-1.2, maxval=1.2)
  params = shape.init(jax.random.PRNGKey(1), pts0)
  opt = optax.adam(2e-3)
  state = opt.init(params)

  @jax.jit
  def step(params, state, k):
    pts = jax.random.uniform(k, (2048, 3), minval=-1.2, maxval=1.2)
    target = synthetic.scene_sdf(pts)

    def loss_fn(p):
      sd, _ = shape.apply(p, pts)
      # weight toward the zero set: surface accuracy is what the
      # renderer consumes
      w = jnp.exp(-jnp.abs(target) / 0.2)
      return jnp.sum(w * (sd - target) ** 2) / jnp.sum(w)

    loss, g = jax.value_and_grad(loss_fn)(params)
    up, state2 = opt.update(g, state)
    return optax.apply_updates(params, up), state2, loss

  for i in range(600):
    key, k = jax.random.split(key)
    params, state, loss = step(params, state, k)
  assert float(loss) < 6e-3, float(loss)

  # march rays at the fitted SDF; silhouette should match the analytic one
  from nerf_atlas_tpu.ops import march
  bundle = loaders.synthetic_spheres(size=24, num_views=1)
  ds = sampler.RayDataset.from_bundle(bundle, size=24)
  rays = ds.view_rays(0)
  sdf_fn = lambda p: shape.apply(params, p)[0]
  _, hits, _, _ = march.bisect(sdf_fn, rays[:, :3], rays[:, 3:],
                               iters=64, near=1.0, far=5.0)
  gt_alpha = np.asarray(ds.pixels[0][..., 3]).reshape(-1) > 0.5
  agree = (np.asarray(hits) == gt_alpha).mean()
  assert agree > 0.9, agree
