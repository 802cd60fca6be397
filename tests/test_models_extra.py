"""Dynamic wrappers, voxels, and the long-tail models: forward shapes +
finiteness + a dynamic golden convergence test."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_atlas_tpu import models


def _rays(n=4):
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.0]]), (n, 1))
  r_d = jnp.tile(jnp.array([[0.0, 0, -1.0]]), (n, 1))
  r_d = r_d + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (n, 3))
  return jnp.concatenate([r_o, r_d], -1)


SMALL = dict(steps=8, t_near=2.0, t_far=4.0)
CANON = {"canonical_kwargs": {"steps": 8}}
RNGS = {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)}
SAMPLE = {"sampler": jax.random.PRNGKey(2)}


@pytest.mark.parametrize("kind,kwargs", [
    ("voxel", {"resolution": 8}),
    ("mpi", {"n_planes": 8}),
    ("rig", {"n_points": 8}),
    ("spline", {}),
    ("hist", {"bins": 8}),
    ("bendy", {}),
    ("recurrent", {}),
])
def test_static_model_forward(kind, kwargs):
  model = models.load_model(kind, **SMALL, **kwargs)
  rays = _rays()
  params = model.init(RNGS, rays, train=True)
  out = model.apply(params, rays, train=True, rngs=SAMPLE)
  assert out["rgb"].shape == (4, 3), kind
  assert bool(jnp.isfinite(out["rgb"]).all()), kind
  out_eval = model.apply(params, rays)
  assert out_eval["rgb"].shape == (4, 3)


@pytest.mark.parametrize("kind,kwargs", [
    ("plain", {"spline_points": 0}),
    ("plain", {"spline_points": 4}),
    ("ae", {}),
    ("long", {"segments": 3, "spline_points": 3}),
    ("rig", {"n_points": 8}),
    ("voxel", {"resolution": 8, "warp_resolution": 8}),
])
def test_dyn_model_forward(kind, kwargs):
  model = models.load_dyn_model(kind, **SMALL, **kwargs)
  rays = _rays()
  times = jnp.array([0.0, 0.3, 0.7, 1.0])
  params = model.init(RNGS, rays, times=times, train=True)
  out = model.apply(params, rays, times=times, train=True, rngs=SAMPLE)
  assert out["rgb"].shape == (4, 3), kind
  assert bool(jnp.isfinite(out["rgb"]).all()), kind


def test_dyn_spline_zero_at_t0():
  """Spline dynamics with pinned first control point: t=0 is canonical
  (zero deformation)."""
  model = models.load_dyn_model("plain", **SMALL, spline_points=4,
                                with_rigidity=False)
  rays = _rays()
  times = jnp.zeros((4,))
  params = model.init(RNGS, rays, times=times, train=True)
  out = model.apply(params, rays, times=times, train=True, rngs=SAMPLE)
  np.testing.assert_allclose(np.asarray(out["dp"]), 0.0, atol=1e-6)


def test_long_dyn_c0_continuity():
  """The poly-Bezier segments share endpoints: delta_x approached from
  both sides of a segment boundary must agree (C0 stitch)."""
  model = models.LongDynamicNeRF(**SMALL, canonical_kind="tiny",
                                 segments=3, spline_points=3,
                                 with_rigidity=False)
  rays = _rays()
  times = jnp.array([0.0, 0.3, 0.7, 1.0])
  params = model.init(RNGS, rays, times=times, train=True)
  pts = jax.random.uniform(jax.random.PRNGKey(4), (16, 3), minval=-1,
                           maxval=1)
  boundary = 1.0 / 3.0
  eps = 1e-4
  lo = model.apply(params, pts, jnp.full((16, 1), boundary - eps),
                   method="delta_x")
  hi = model.apply(params, pts, jnp.full((16, 1), boundary + eps),
                   method="delta_x")
  np.testing.assert_allclose(np.asarray(lo), np.asarray(hi), atol=5e-3)
  # and t=0 is canonical (first control point pinned to zero)
  dp0 = model.apply(params, pts, jnp.zeros((16, 1)), method="delta_x")
  np.testing.assert_allclose(np.asarray(dp0), 0.0, atol=1e-6)


def test_voxel_upsample_params():
  model = models.NeRFVoxel(resolution=8, **SMALL)
  rays = _rays()
  params = model.init(RNGS, rays, train=True)
  up = models.upsample_params(params, 16)
  assert up["params"]["sigma_grid"].shape == (16, 16, 16, 1)
  # a model built at the new resolution accepts the upsampled params
  model16 = models.NeRFVoxel(resolution=16, **SMALL)
  out = model16.apply(up, rays)
  assert bool(jnp.isfinite(out["rgb"]).all())


def test_pixel_single_forward():
  model = models.SinglePixelNeRF(**SMALL, feat_size=16)
  rays = _rays()
  image = jnp.ones((32, 32, 3))
  uv = jnp.zeros((4, 2))
  params = model.init(RNGS, rays, train=True, image=image, uv=uv)
  out = model.apply(params, rays, train=True, image=image, uv=uv,
                    rngs=SAMPLE)
  assert out["rgb"].shape == (4, 3)


@pytest.mark.slow
def test_dynamic_voxel_fits_moving_scene():
  """Golden dynamic convergence: DynamicNeRF (direct warp) improves on
  the orbiting-sphere scene."""
  from nerf_atlas_tpu.data import loaders, sampler
  bundle = loaders.synthetic_spheres(size=24, num_views=6, dynamic=True)
  ds = sampler.RayDataset.from_bundle(bundle, size=24)
  model = models.load_dyn_model(
      "plain", steps=24, t_near=1.5, t_far=4.5, spline_points=0,
      with_rigidity=False, canonical_kwargs={"steps": 24})
  rays0, pix0, t0 = ds.sample_rays(jax.random.PRNGKey(9), 64)
  params = model.init(RNGS, rays0, times=t0, train=True)
  opt = optax.adam(1e-3)
  state = opt.init(params)

  @jax.jit
  def step(params, state, key):
    k1, k2 = jax.random.split(key)
    rays, pix, t = ds.sample_rays(k1, 512)

    def loss_fn(p):
      out = model.apply(p, rays, times=t, train=True, rngs={"sampler": k2})
      return jnp.mean((out["rgb"] - pix[..., :3]) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(params)
    updates, state2 = opt.update(g, state)
    return optax.apply_updates(params, updates), state2, loss

  key = jax.random.PRNGKey(7)
  losses = []
  for i in range(120):
    key, k = jax.random.split(key)
    params, state, loss = step(params, state, k)
    losses.append(float(loss))
  assert np.mean(losses[-10:]) < np.mean(losses[:10]) / 3, (
      losses[:5], losses[-5:])
