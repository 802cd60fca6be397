"""Closed-form unit tests for the render core (SURVEY.md §4 strategy)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_atlas_tpu.ops import (
    bezier, grid, integrate, march, mip, rays, sampling, sh,
)
from nerf_atlas_tpu.ops import math as nmath


def test_exclusive_cumprod():
  t = jnp.array([[2.0, 3.0, 4.0], [1.0, 0.5, 2.0]])
  out = integrate.exclusive_cumprod(t, axis=-1)
  np.testing.assert_allclose(out, [[1, 2, 6], [1, 1, 0.5]], rtol=1e-6)


def test_alpha_composite_weights_sum_to_opacity():
  alpha = jnp.array([0.1, 0.2, 0.5, 1.0])
  w = integrate.alpha_composite(alpha)
  # weights telescope: sum w = 1 - prod(1 - alpha)
  np.testing.assert_allclose(
      w.sum(), 1 - jnp.prod(1 - alpha + 1e-10), rtol=1e-5)


def test_constant_density_transmittance():
  """Uniform sigma: alpha_i = 1 - exp(-sigma*dt); analytic weights."""
  sigma = 3.0
  T = 32
  ts = jnp.linspace(0.0, 1.0, T)
  r_d = jnp.array([[0.0, 0.0, 1.0]])
  # invert softplus(d - 1) = sigma  =>  d = 1 + log(exp(sigma) - 1)
  density = jnp.full((1, T), 1 + math.log(math.exp(sigma) - 1))
  alpha, weights = integrate.alpha_from_density(density, ts, r_d)
  dt = ts[1] - ts[0]
  expected_alpha = 1 - math.exp(-sigma * dt)
  np.testing.assert_allclose(alpha[0, :-1], expected_alpha, rtol=1e-4)
  # last alpha uses the 1e10 tail -> 1
  assert alpha[0, -1] > 0.999
  trans = np.cumprod(np.concatenate([[1.0], 1 - np.asarray(alpha[0, :-1])]))
  np.testing.assert_allclose(weights[0], trans * np.asarray(alpha[0]),
                             rtol=1e-3)


def test_volumetric_integrate_shapes_and_value():
  w = jnp.array([[0.25, 0.75]])
  other = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
  out = integrate.volumetric_integrate(w, other)
  np.testing.assert_allclose(out, [[0.25, 0.75, 0.0]])


def test_compute_pts_linear():
  ray = jnp.array([[0.0, 0, 0, 0, 0, 2.0]])  # origin 0, dir 2z
  pts, ts, r_o, r_d = rays.compute_pts_ts(ray, 1.0, 2.0, 5)
  np.testing.assert_allclose(ts, jnp.linspace(1, 2, 5))
  np.testing.assert_allclose(pts[0, :, 2], 2 * ts, rtol=1e-6)
  assert pts.shape == (1, 5, 3)


def test_compute_ts_lindisp():
  ts = rays.compute_ts(1.0, 4.0, 3, lindisp=True)
  np.testing.assert_allclose(ts, [1.0, 1.6, 4.0], rtol=1e-5)


def test_stratified_stays_in_bins():
  key = jax.random.PRNGKey(0)
  ts = rays.compute_ts(0.0, 1.0, 16, perturb=1.0, key=key)
  base = np.linspace(0, 1, 16)
  mids = 0.5 * (base[:-1] + base[1:])
  lower = np.concatenate([mids, base[-1:]])
  upper = np.concatenate([base[:1], mids])
  lo = np.minimum(lower, upper)
  hi = np.maximum(lower, upper)
  assert np.all(np.asarray(ts) >= lo - 1e-6)
  assert np.all(np.asarray(ts) <= hi + 1e-6)


def test_de_casteljau_matches_bernstein():
  key = jax.random.PRNGKey(1)
  N = 5
  coeffs = jax.random.normal(key, (N, 1, 3))
  t = jnp.array(0.37)
  out = bezier.de_casteljau(coeffs, t, N)
  # closed-form Bernstein
  bern = sum(
      math.comb(N - 1, i) * (1 - t) ** (N - 1 - i) * t**i * coeffs[i]
      for i in range(N))
  np.testing.assert_allclose(out, bern, rtol=1e-5)


def test_bezier_derivative_matches_finite_difference():
  key = jax.random.PRNGKey(2)
  N = 4
  coeffs = jax.random.normal(key, (N, 1, 3))
  t = jnp.array(0.4)
  d = bezier.bezier_derivative(coeffs, t, N)
  eps = 1e-3
  fd = (bezier.de_casteljau(coeffs, t + eps, N)
        - bezier.de_casteljau(coeffs, t - eps, N)) / (2 * eps)
  np.testing.assert_allclose(d, fd.squeeze(0) if fd.ndim == 3 else fd,
                             rtol=1e-2, atol=1e-2)


def test_cubic_bezier_fast_path():
  key = jax.random.PRNGKey(3)
  coeffs = jax.random.normal(key, (4, 2, 3))
  t = jnp.array(0.62)
  np.testing.assert_allclose(
      bezier.cubic_bezier(coeffs, t, 4),
      bezier.de_casteljau(coeffs, t, 4), rtol=1e-5)


def test_arc_len_straight_line():
  # control points on a straight segment of length 2
  coeffs = jnp.stack([jnp.zeros(3), jnp.array([0, 0, 1.0]),
                      jnp.array([0, 0, 2.0])])[:, None, :]
  out = bezier.arc_len(coeffs, samples=64)
  np.testing.assert_allclose(out, 2.0, rtol=1e-3)


def test_sh_orthonormality():
  """Monte-Carlo: int Y_i Y_j dOmega = delta_ij (deg<=2, 200k samples)."""
  key = jax.random.PRNGKey(4)
  n = 200_000
  v = jax.random.normal(key, (n, 3))
  v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
  S = sh.sh_size(2)
  basis = jnp.stack(
      [sh.eval_sh(2, jnp.eye(S)[None, None, i].repeat(n, 0), v)
       for i in range(S)], axis=-1).squeeze(1)  # [n, S]
  gram = (basis.T @ basis) / n * 4 * math.pi
  np.testing.assert_allclose(gram, np.eye(S), atol=0.08)


def test_ipe_matches_monte_carlo():
  """E[sin(2^k x)] under N(mu, var) vs direct sampling."""
  key = jax.random.PRNGKey(5)
  mu = jnp.array([[0.3, -0.2, 0.7]])
  var = jnp.array([[0.05, 0.1, 0.02]])
  feats = mip.integrated_pos_enc_diag(mu, var, 0, 3)  # [1, 18]
  samples = mu + jnp.sqrt(var) * jax.random.normal(key, (200_000, 3))
  scales = np.array([1.0, 2.0, 4.0])
  mc_sin = np.stack([np.asarray(jnp.mean(jnp.sin(s * samples), axis=0))
                     for s in scales]).reshape(-1)
  mc_cos = np.stack([np.asarray(jnp.mean(jnp.cos(s * samples), axis=0))
                     for s in scales]).reshape(-1)
  np.testing.assert_allclose(feats[0, :9], mc_sin, atol=5e-3)
  np.testing.assert_allclose(feats[0, 9:], mc_cos, atol=5e-3)


def test_sample_pdf_concentrates_mass():
  z = jnp.broadcast_to(jnp.linspace(0, 1, 16), (8, 16))
  w = jnp.zeros((8, 16)).at[:, 8].set(100.0)  # all mass near z=8/15
  out = sampling.sample_pdf(z, w, N=32, key=jax.random.PRNGKey(6))
  center = 8 / 15
  frac_near = jnp.mean((jnp.abs(out - center) < 0.1).astype(jnp.float32))
  assert frac_near > 0.9
  assert bool(jnp.all(out >= 0)) and bool(jnp.all(out <= 1))


def test_sample_pdf_uniform_weights_uniform_samples():
  z = jnp.broadcast_to(jnp.linspace(0, 1, 16), (4, 16))
  w = jnp.ones((4, 16))
  out = sampling.sample_pdf(z, w, N=512, key=jax.random.PRNGKey(7))
  assert abs(float(out.mean()) - 0.5) < 0.05


@pytest.mark.parametrize("dense", [False, True])
def test_sampling_dense_forms_match_gather_oracle(dense, monkeypatch):
  """Both backend-dispatch arms of sampling.py must be EXACT vs a numpy
  searchsorted/sort oracle, including ties and degenerate all-zero
  weights. dense=True forces the TPU compare-reduce forms (matmul
  cumsum, rank-count sort, counting merge) on the CPU test host."""
  if dense:
    monkeypatch.setattr(sampling, "_dense",
                        lambda T: T <= sampling._DENSE_MAX)
  rng = np.random.default_rng(0)
  B, T, N = 17, 64, 48
  z = np.sort(rng.uniform(2, 6, (B, T)).astype(np.float32), -1)
  w = rng.uniform(0, 1, (B, T)).astype(np.float32)
  w[3, :] = 0.0   # degenerate: uniform fallback via eps
  w[5, 10] = 100.0

  def oracle(z, w, N, eps=1e-5):
    w = w + eps
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, N), z.shape[:-1] + (N,))
    out = np.empty(u.shape)
    z_ext = np.concatenate([z, z[..., -1:]], -1)
    for b in range(z.shape[0]):
      inds = np.searchsorted(cdf[b], u[b], side="right")
      lo = np.maximum(inds - 1, 0)
      hi = np.minimum(inds, cdf.shape[-1] - 1)
      denom = cdf[b][hi] - cdf[b][lo]
      denom = np.where(denom < 1e-5, 1.0, denom)
      t = (u[b] - cdf[b][lo]) / denom
      out[b] = z_ext[b][lo] + t * (z_ext[b][hi] - z_ext[b][lo])
    return np.sort(out, -1)

  got = np.asarray(sampling.sample_pdf(jnp.asarray(z), jnp.asarray(w), N=N))
  want = oracle(z.astype(np.float64), w.astype(np.float64), N)
  np.testing.assert_allclose(got, want, atol=5e-5)

  # counting merge vs sort-concat: exact under heavy ties, incl. 1-D bcast
  q = lambda a: np.sort(np.round(a * 8) / 8, -1).astype(np.float32)
  c, f = q(rng.uniform(2, 6, (B, T))), q(rng.uniform(2, 6, (B, T)))
  got_m = np.asarray(sampling.merge_ts(jnp.asarray(c), jnp.asarray(f)))
  assert np.array_equal(got_m, np.sort(np.concatenate([c, f], -1), -1))
  z1 = np.linspace(2, 6, T, dtype=np.float32)
  got_1 = np.asarray(sampling.merge_ts(jnp.asarray(z1), jnp.asarray(f)))
  want_1 = np.sort(np.concatenate([np.broadcast_to(z1, (B, T)), f], -1), -1)
  assert np.array_equal(got_1, want_1)

  # rank-count sort: exact with duplicates
  x = (np.round(rng.uniform(0, 1, (B, 96)) * 16) / 16).astype(np.float32)
  assert np.array_equal(np.asarray(sampling._sort_last(jnp.asarray(x))),
                        np.sort(x, -1))


def test_march_sphere_analytic():
  """Rays toward a unit sphere at origin: hit distance = |o| - 1."""
  def sdf_fn(p):
    return jnp.linalg.norm(p, axis=-1) - 1.0

  d1 = jnp.array([0.5, 0, 3.0])
  d1 = d1 / jnp.linalg.norm(d1)
  r_o = jnp.array([[0.0, 0, -3.0], [0, 0, -3.0], [2.5, 0, -3.0]])
  r_d = jnp.stack([jnp.array([0.0, 0, 1.0]), d1, jnp.array([0.0, 0, 1.0])])
  pts, hits, _, tput = march.bisect(sdf_fn, r_o, r_d, iters=128,
                                    near=0.0, far=6.0)
  assert bool(hits[0]) and bool(hits[1]) and not bool(hits[2])
  np.testing.assert_allclose(pts[0], [0, 0, -1.0], atol=1e-3)
  # ray 1 hits the sphere off-axis; surface point has |p| = 1
  np.testing.assert_allclose(jnp.linalg.norm(pts[1]), 1.0, atol=1e-3)
  # miss ray's throughput is its closest approach distance - 1
  np.testing.assert_allclose(tput[2, 0], 1.5, atol=0.05)


def test_sphere_march_analytic():
  def sdf_fn(p):
    return jnp.linalg.norm(p, axis=-1) - 1.0

  r_o = jnp.array([[0.0, 0, -3.0]])
  r_d = jnp.array([[0.0, 0, 1.0]])
  pts, hits, t, _ = march.sphere_march(sdf_fn, r_o, r_d, iters=64,
                                       near=0.0, far=6.0)
  assert bool(hits[0])
  np.testing.assert_allclose(t[0, 0], 2.0, atol=5e-3)


def test_grid_lookup_linear_field_exact():
  """Trilinear interp reproduces a linear function exactly."""
  R = 8
  axes = jnp.linspace(-1, 1, R)
  X, Y, Z = jnp.meshgrid(axes, axes, axes, indexing="ij")
  g = (2 * X - 3 * Y + 0.5 * Z)[..., None]
  key = jax.random.PRNGKey(8)
  pts = jax.random.uniform(key, (100, 3), minval=-0.99, maxval=0.99)
  vals = grid.grid_lookup(g, pts)
  expected = (2 * pts[:, 0] - 3 * pts[:, 1] + 0.5 * pts[:, 2])[:, None]
  np.testing.assert_allclose(vals, expected, atol=1e-5)


def test_total_variation_zero_for_constant():
  g = jnp.ones((4, 4, 4, 2))
  assert float(grid.total_variation(g)) == 0.0


def test_dir_elev_azim_roundtrip():
  key = jax.random.PRNGKey(9)
  d = jax.random.normal(key, (64, 3))
  d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
  elaz = nmath.dir_to_elev_azim(d)
  # reference convention: elev = acos(z) -> reconstruct directly
  elev, azim = elaz[..., 0], elaz[..., 1]
  rec = jnp.stack([jnp.sin(elev) * jnp.cos(azim),
                   jnp.sin(elev) * jnp.sin(azim),
                   jnp.cos(elev)], axis=-1)
  np.testing.assert_allclose(rec, d, atol=1e-3)


def test_laplace_cdf_properties():
  s = 0.1
  x = jnp.linspace(-1, 1, 101)
  c = nmath.laplace_cdf(x, s)
  assert abs(float(nmath.laplace_cdf(jnp.array(0.0), s)) - 0.5) < 1e-6
  assert bool(jnp.all(jnp.diff(c) >= 0))  # monotone
  assert float(c[0]) < 1e-4 and float(c[-1]) > 1 - 1e-4


def test_sigmoid_kinds_ranges():
  v = jnp.linspace(-10, 10, 101)
  fat = nmath.fat_sigmoid(v)
  thin = nmath.thin_sigmoid(v)
  assert float(fat.min()) < 0 and float(fat.max()) > 1
  assert float(thin.min()) > 0 and float(thin.max()) < 1
  for kind in nmath.SIGMOID_KINDS:
    out = nmath.load_sigmoid(kind)(v)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_coordinate_system_orthonormal():
  key = jax.random.PRNGKey(10)
  n = jax.random.normal(key, (32, 3))
  frame = nmath.coordinate_system(n)  # [32, 3, 3] columns s,t,n
  gram = jnp.einsum("bij,bik->bjk", frame, frame)
  np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), (32, 3, 3)),
                             atol=1e-4)


def test_bg_white_plus_weights_is_one():
  alpha = jnp.array([[0.3, 0.2, 0.1, 0.8]])
  w = integrate.alpha_composite(alpha)
  # white bg: rendered white scene stays white-ish: sum(w) + leftover == 1
  leftover = integrate.bg_white(w)
  total = w[..., :-1].sum(axis=-1, keepdims=True) + leftover
  np.testing.assert_allclose(total, 1.0, rtol=1e-6)


def test_depth_from_weights():
  ts = jnp.array([1.0, 2.0, 3.0])
  w = jnp.array([[0.0, 1.0, 0.0]])
  np.testing.assert_allclose(
      integrate.depth_from_weights(w, ts), [[2.0]])
