"""Model zoo: shape checks for every registered model + a golden
convergence test (TinyNeRF fits the procedural scene)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_atlas_tpu import models
from nerf_atlas_tpu.data import loaders, sampler
from nerf_atlas_tpu.refl import Point


RAYS = None


def _rays(n=8):
  # rays from z=3 toward origin
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.0]]), (n, 1))
  r_d = jnp.tile(jnp.array([[0.0, 0, -1.0]]), (n, 1))
  r_d = r_d + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (n, 3))
  return jnp.concatenate([r_o, r_d], -1)


SMALL = dict(steps=16, t_near=2.0, t_far=4.0)


@pytest.mark.parametrize("kind,kwargs", [
    ("tiny", {}),
    ("plain", {}),
    ("plain", {"mip": "cone"}),
    ("ae", {}),
    ("coarse_fine", {"fine_steps": 8}),
    ("volsdf", {}),
])
def test_model_forward_shapes(kind, kwargs):
  model = models.load_model(kind, **SMALL, **kwargs)
  rays = _rays(4)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  out = model.apply(params, rays, train=True,
                    rngs={"sampler": jax.random.PRNGKey(2)})
  assert out["rgb"].shape == (4, 3)
  assert jnp.isfinite(out["rgb"]).all()
  # eval mode needs no rng
  out_eval = model.apply(params, rays)
  assert out_eval["rgb"].shape == (4, 3)


def test_sdf_model_forward():
  model = models.SDF(march_steps=32, t_near=0.1, t_far=6.0)
  rays = _rays(4)
  params = model.init(jax.random.PRNGKey(0), rays)
  out = model.apply(params, rays)
  assert out["rgb"].shape == (4, 3)
  assert out["throughput"].shape == (4, 1)
  assert jnp.isfinite(out["throughput"]).all()


def test_sdf_shapes_zoo():
  pts = jax.random.normal(jax.random.PRNGKey(0), (10, 3)) * 0.5
  for kind in models.SDF_KINDS:
    shape = models.load_sdf_shape(kind)
    params = shape.init(jax.random.PRNGKey(1), pts)
    sd, latent = shape.apply(params, pts)
    assert sd.shape == (10,), kind
    assert jnp.isfinite(sd).all(), kind


def test_volsdf_eikonal_trainable():
  """Eikonal term must be double-differentiable."""
  model = models.VolSDF(**SMALL, with_normals=True)
  rays = _rays(2)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)

  def loss_fn(p):
    out = model.apply(p, rays, train=True,
                      rngs={"sampler": jax.random.PRNGKey(2)})
    return jnp.mean(out["rgb"] ** 2) + out["eikonal"]

  g = jax.grad(loss_fn)(params)
  flat = jax.tree_util.tree_leaves(g)
  assert all(bool(jnp.isfinite(x).all()) for x in flat)


def test_volsdf_with_lights_direct():
  lights = Point.make(np.array([[2.0, 2.0, 2.0]]), intensity=20.0)
  model = models.VolSDF(**SMALL, refl_kind="diffuse", occ_kind="all-learned",
                        integrator_kind="direct")
  rays = _rays(2)
  init_rngs = {"params": jax.random.PRNGKey(0),
               "sampler": jax.random.PRNGKey(1)}
  params = model.init(init_rngs, rays, train=True,
                      view_idx=jnp.zeros((2,), jnp.int32), lights=lights)
  out = model.apply(params, rays, train=True, lights=lights,
                    view_idx=jnp.zeros((2,), jnp.int32),
                    rngs={"sampler": jax.random.PRNGKey(2)})
  assert out["rgb"].shape == (2, 3)
  assert jnp.isfinite(out["rgb"]).all()


@pytest.mark.slow
def test_tiny_nerf_fits_synthetic_scene():
  """Golden convergence: 300 steps of TinyNeRF on the procedural spheres
  raises PSNR on held-out pixels by a clear margin (SURVEY §4 strategy)."""
  bundle = loaders.synthetic_spheres(size=32, num_views=6)
  ds = sampler.RayDataset.from_bundle(bundle, size=32)
  model = models.TinyNeRF(steps=32, t_near=1.5, t_far=4.5,
                          sky_kind="black", density_noise=0.0)
  rays0, pix0, _ = ds.sample_rays(jax.random.PRNGKey(9), 256)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays0, train=True)
  opt = optax.adam(5e-4)
  state = opt.init(params)

  @jax.jit
  def step(params, state, key):
    k1, k2 = jax.random.split(key)
    rays, pix, _ = ds.sample_rays(k1, 1024)

    def loss_fn(p):
      out = model.apply(p, rays, train=True, rngs={"sampler": k2})
      return jnp.mean((out["rgb"] - pix[..., :3]) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(params)
    updates, state2 = opt.update(g, state)
    return optax.apply_updates(params, updates), state2, loss

  key = jax.random.PRNGKey(42)
  first_loss = None
  for i in range(300):
    key, k = jax.random.split(key)
    params, state, loss = step(params, state, k)
    if i == 0:
      first_loss = float(loss)
  final_loss = float(loss)
  psnr0 = -10 * np.log10(first_loss)
  psnr1 = -10 * np.log10(final_loss)
  assert psnr1 > psnr0 + 6, (psnr0, psnr1)
  assert psnr1 > 18, psnr1
