"""Reflectance zoo, lights, occlusion: shapes, ranges, physics sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_atlas_tpu import refl as refl_lib
from nerf_atlas_tpu.refl import brdf as brdf_lib


N = 6
KEY = jax.random.PRNGKey(0)
X = jax.random.uniform(KEY, (N, 3), minval=-1, maxval=1)
VIEW = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
NORMAL = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
LIGHT = jax.random.normal(jax.random.PRNGKey(3), (N, 3))


@pytest.mark.parametrize("kind", list(brdf_lib.REFL_KINDS))
def test_refl_forward(kind):
  r = refl_lib.load_refl(kind)
  params = r.init(jax.random.PRNGKey(0), X, view=VIEW, normal=NORMAL,
                  light=LIGHT)
  out = r.apply(params, X, view=VIEW, normal=NORMAL, light=LIGHT)
  assert out.shape == (N, 3), kind
  assert bool(jnp.isfinite(out).all()), kind


def test_diffuse_follows_cosine():
  """Diffuse shading scales with n·l and is zero for backfacing light."""
  r = refl_lib.load_refl("diffuse")
  n = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (3, 1))
  x = jnp.zeros((3, 3))
  lights = jnp.array([[0.0, 0, 1.0],          # head-on
                      [0.70710678, 0, 0.70710678],  # 45 deg
                      [0.0, 0, -1.0]])        # behind
  params = r.init(jax.random.PRNGKey(0), x, normal=n, light=lights)
  out = r.apply(params, x, normal=n, light=lights)
  ratio = out[1] / jnp.maximum(out[0], 1e-9)
  np.testing.assert_allclose(ratio, 0.70710678, rtol=1e-4)
  np.testing.assert_allclose(out[2], 0.0, atol=1e-7)


def test_rusin_params_ranges():
  p = brdf_lib.rusin_params(VIEW, LIGHT, NORMAL)
  assert p.shape == (N, 3)
  th, td, pd = p[..., 0], p[..., 1], p[..., 2]
  assert (th >= 0).all() and (th <= np.pi + 1e-5).all()
  assert (td >= 0).all() and (td <= np.pi + 1e-5).all()
  assert (pd >= 0).all() and (pd <= np.pi + 1e-5).all()


def test_cook_torrance_energy_reasonable():
  r = refl_lib.load_refl("cook-torrance")
  n = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (N, 1))
  v = jnp.tile(jnp.array([[0.0, 0, -1.0]]), (N, 1))
  l = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (N, 1))
  params = r.init(jax.random.PRNGKey(0), X, view=v, normal=n, light=l)
  out = r.apply(params, X, view=v, normal=n, light=l)
  assert bool((out >= 0).all())
  assert bool((out < 50).all())  # no explosion


def test_point_light_inverse_square():
  light = refl_lib.Point.make(np.array([[0.0, 0.0, 2.0]]), intensity=100.0)
  pts = jnp.array([[0.0, 0, 1.0], [0.0, 0, 0.0]])  # dist 1 and 2
  d, spec = light(pts)
  assert d.shape == (2, 1, 3) and spec.shape == (2, 1, 3)
  np.testing.assert_allclose(spec[0, 0, 0] / spec[1, 0, 0], 4.0, rtol=1e-5)
  np.testing.assert_allclose(d[0, 0], [0, 0, 1.0], atol=1e-6)


def test_light_field():
  f = refl_lib.Field()
  pts = X
  params = f.init(jax.random.PRNGKey(0), pts)
  d, spec = f.apply(params, pts)
  assert d.shape == (N, 1, 3) and spec.shape == (N, 1, 3)
  assert bool((spec >= 0).all())


@pytest.mark.parametrize("kind", ["hard", "learned", "learned-const",
                                  "all-learned", "joint-all-const"])
def test_occlusion_kinds(kind):
  occ = refl_lib.load_occlusion(kind)
  isect = lambda pts, d: jnp.linalg.norm(pts, axis=-1) < 0.5
  params = occ.init(jax.random.PRNGKey(0), X, LIGHT, isect)
  att = occ.apply(params, X, LIGHT, isect)
  assert att.shape == (N, 1)
  assert bool((att >= 0).all() and (att <= 1).all())


def test_occlusion_hard_matches_visibility():
  occ = refl_lib.load_occlusion("hard")
  isect = lambda pts, d: pts[..., 0] > 0
  params = occ.init(jax.random.PRNGKey(0), X, LIGHT, isect)
  att = occ.apply(params, X, LIGHT, isect)
  np.testing.assert_allclose(att[..., 0], (X[:, 0] <= 0).astype(jnp.float32))


def test_weighted_choice_is_convex_mix():
  r = refl_lib.load_refl("weighted", subrefl_kinds=("diffuse", "view"))
  params = r.init(jax.random.PRNGKey(0), X, view=VIEW, normal=NORMAL,
                  light=LIGHT)
  out = r.apply(params, X, view=VIEW, normal=NORMAL, light=LIGHT)
  assert out.shape == (N, 3) and bool(jnp.isfinite(out).all())


def test_alternating_freeze():
  r = refl_lib.load_refl("alternating")
  params = r.init(jax.random.PRNGKey(0), X, view=VIEW, normal=NORMAL,
                  light=LIGHT)

  def loss(p, frozen):
    out = r.apply(p, X, view=VIEW, normal=NORMAL, light=LIGHT,
                  frozen=frozen)
    return jnp.sum(out ** 2)

  g = jax.grad(loss)(params, "learned")
  # the frozen (learned/Rusin) branch gets zero gradient
  learned_grads = g["params"]["learned"]
  assert all(float(jnp.abs(x).sum()) == 0
             for x in jax.tree_util.tree_leaves(learned_grads))
  analytic_grads = g["params"]["analytic"]
  assert any(float(jnp.abs(x).sum()) > 0
             for x in jax.tree_util.tree_leaves(analytic_grads))
