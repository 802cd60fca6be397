"""The regularizer menu: each term reads the model's output dict and/or
samples random points, weighted by a config coefficient.

Capability parity: the ~20 optional regularizers assembled in the
reference's train loop (/root/reference/runner.py:681-808): latent L2,
eikonal, smooth normals/surface, delta-x (deformation magnitude), voxel
TV (sigma/rgb/bezier/rigidity), NR-NeRF-style offset, spline length,
occlusion smoothness/decay, dynamic divergence.

Pure functions: reg(out_dict, model_apply, params, key, cfg) -> scalar.
The driver sums `cfg[name] * reg(...)` for every nonzero coefficient.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def latent_l2(out, **_):
  return out.get("latent_l2", 0.0)


def eikonal(out, **_):
  return out.get("eikonal", 0.0)


def delta_x(out, **_):
  """Mean squared deformation — keeps dynamics minimal (D-NeRF reg)."""
  dp = out.get("dp")
  return 0.0 if dp is None else jnp.mean(jnp.square(dp))


def offset_nrnerf(out, **_):
  """NR-NeRF offset loss (reference runner.py:776-781):
  weights.detach() · (‖dp‖^(2−rigidity) + 3e-3·rigidity) — rigid points
  (rigidity→1) pay ~‖dp‖, free points (→0) pay ‖dp‖², so non-rigid
  motion is cheaper. The norm is eps-safened: the warp MLP is
  zero-initialized (zero_last), so the exact ‖0‖^a autograd NaNs on the
  very first training step (the reference inherits that NaN from
  torch's vector_norm/pow at 0)."""
  dp, rig = out.get("dp"), out.get("rigidity")
  if dp is None:
    return 0.0
  norm = jnp.sqrt(jnp.sum(jnp.square(dp), axis=-1, keepdims=True) + 1e-12)
  if rig is not None:
    val = norm ** (2.0 - rig) + 3e-3 * rig
  else:
    val = jnp.square(norm)
  w = out.get("weights")
  if w is not None and w.shape == val.shape[:-1]:
    val = jax.lax.stop_gradient(w)[..., None] * val
  return jnp.mean(val)


def rigidity_sparsity(out, **_):
  r = out.get("rigidity")
  return 0.0 if r is None else jnp.mean(jnp.abs(r))


def voxel_tv_sigma(out, **_):
  return out.get("tv_sigma", 0.0)


def voxel_tv_refl(out, **_):
  return out.get("tv_refl", 0.0)


def voxel_tv_bezier(out, **_):
  return out.get("tv_bezier", 0.0)


def voxel_tv_rigidity(out, **_):
  return out.get("tv_rigidity", 0.0)


def weight_sparsity(out, **_):
  """Encourage opaque-or-empty rays (beta/entropy-style prior)."""
  w = out.get("weights")
  if w is None:
    return 0.0
  acc = jnp.clip(jnp.sum(w, axis=-1), 1e-5, 1 - 1e-5)
  return jnp.mean(-acc * jnp.log(acc) - (1 - acc) * jnp.log(1 - acc))


def volsdf_scale(out, **_):
  """Anneal the Laplace scale downward (sharper surfaces)."""
  return out.get("scale", 0.0)


def occ_decay(out, **_):
  """Decay learned occlusion toward 'visible' — shadows must earn their
  keep from data (reference runner.py:766)."""
  return out.get("occ_decay", 0.0)


def surface_eikonal(out, **_):
  """Eikonal weighted toward the surface: ray-sample eikonal residuals
  weighted by the volume-rendering weights (the reference evaluates at
  ray-surface intersections, runner.py:215 --surface-eikonal; the
  weight distribution concentrates exactly there)."""
  n, w = out.get("normals"), out.get("weights")
  if n is None or w is None:
    return 0.0
  ei = jnp.square(jnp.linalg.norm(n, axis=-1) - 1.0)
  return jnp.sum(w * ei) / (jnp.sum(w) + 1e-8)


REGULARIZERS: Dict[str, Callable] = {
    "latent_l2": latent_l2,
    "eikonal": eikonal,
    "delta_x": delta_x,
    "offset": offset_nrnerf,
    "rigidity_sparsity": rigidity_sparsity,
    "tv_sigma": voxel_tv_sigma,
    "tv_refl": voxel_tv_refl,
    "tv_bezier": voxel_tv_bezier,
    "tv_rigidity": voxel_tv_rigidity,
    "weight_sparsity": weight_sparsity,
    "volsdf_scale": volsdf_scale,
    "occ_decay": occ_decay,
    "surface_eikonal": surface_eikonal,
}


def total_regularizer(out: Dict[str, Any], coeffs: Dict[str, float]):
  """Sum of coeff * reg for every nonzero out-dict coefficient.

  Point-sampled names (POINT_REGULARIZERS) are someone else's job —
  `point_regularizers` dispatches them with extra model evaluations —
  so they are skipped here, NOT KeyErrors: cfg.reg_coeffs carries both
  families in one dict."""
  total = 0.0
  for name, c in coeffs.items():
    if not c:
      continue
    fn = REGULARIZERS.get(name)
    if fn is None:
      if name not in POINT_REGULARIZERS:
        raise KeyError(f"unknown regularizer '{name}'")
      continue
    total = total + c * fn(out)
  return total


# --- point-sampled regularizers (need extra model evaluations) -----------
#
# Each samples random points (and directions/times) and evaluates the
# model through a named flax method: `normals`, `sdf_value`,
# `occ_attenuation`, `query`, `delta_x`. The driver dispatches these by
# coefficient name via `point_regularizers` below. Reference analogs:
# runner.py:681-808 (smooth normals :711, smooth surface :730, smooth occ
# :745-765, view variance :701, dyn divergence :694-698, spline length
# :784, spline pt0 :788, random eikonal :692).

def _perturbation(key, n: int, eps: float, eps_rng: bool):
  """Smoothing offset: fixed-radius gaussian, or random-radius when
  eps_rng (--smooth-eps / --smooth-eps-rng, reference runner.py:219-225)."""
  k1, k2 = jax.random.split(key)
  d = jax.random.normal(k1, (n, 3))
  d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
  r = jax.random.uniform(k2, (n, 1), maxval=eps) if eps_rng else eps
  return d * r


def smooth_normals(model_apply, params, key, n: int = 512,
                   eps: float = 1e-2, method: str = "normals",
                   eps_rng: bool = False, ords=(2,)):
  """E‖n(x) − n(x+ε)‖ over random points — smooth shading fields.
  `ords` selects the vector-norm order(s) (--smooth-n-ord)."""
  k1, k2 = jax.random.split(key)
  pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
  delta = _perturbation(k2, n, eps, eps_rng)
  n0 = model_apply(params, pts, method=method)
  n1 = model_apply(params, pts + delta, method=method)
  total = 0.0
  for o in ords:
    if o == 2:
      # norm² as a direct sum of squares: mathematically identical, but
      # autodiff of norm(x)**2 is NaN at x == 0 (0/0 inside the norm)
      total = total + jnp.mean(jnp.sum(jnp.square(n0 - n1), axis=-1))
    else:
      total = total + jnp.mean(
          jnp.linalg.norm(n0 - n1, ord=o, axis=-1))
  return total


def eikonal_random(model_apply, params, key, n: int = 512,
                   method: str = "normals"):
  """Eikonal on uniform random points (not just ray samples)."""
  pts = jax.random.uniform(key, (n, 3), minval=-1.5, maxval=1.5)
  g = model_apply(params, pts, method=method)
  return jnp.mean(jnp.square(jnp.linalg.norm(g, axis=-1) - 1.0))


def smooth_surface(model_apply, params, key, n: int = 512,
                   eps: float = 1e-2, sharp: float = 8.0,
                   eps_rng: bool = False):
  """Normal smoothness weighted toward the zero set: points with small
  |sdf| dominate (exp(−sharp·|sdf|) weighting)."""
  k1, k2 = jax.random.split(key)
  pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
  delta = _perturbation(k2, n, eps, eps_rng)
  sd = model_apply(params, pts, method="sdf_value")
  w = jnp.exp(-sharp * jnp.abs(jax.lax.stop_gradient(sd)))
  n0 = model_apply(params, pts, method="normals")
  n1 = model_apply(params, pts + delta, method="normals")
  return jnp.mean(w * jnp.sum(jnp.square(n0 - n1), axis=-1))


def smooth_occ(model_apply, params, key, n: int = 512, eps: float = 1e-2):
  """E‖att(x, l) − att(x+ε, l)‖² over random points and light dirs."""
  k1, k2, k3 = jax.random.split(key, 3)
  pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
  dirs = jax.random.normal(k2, (n, 3))
  dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, -1, keepdims=True), 1e-8)
  delta = eps * jax.random.normal(k3, (n, 3))
  a0 = model_apply(params, pts, dirs, method="occ_attenuation")
  a1 = model_apply(params, pts + delta, dirs, method="occ_attenuation")
  return jnp.mean(jnp.square(a0 - a1))


def view_variance(model_apply, params, key, n: int = 256):
  """Penalize view dependence of radiance inside occupied space: the same
  point queried from two random view dirs should agree, weighted by
  (stop-gradient) density."""
  k1, k2, k3 = jax.random.split(key, 3)
  pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
  v1 = jax.random.normal(k2, (n, 3))
  v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, -1, keepdims=True), 1e-8)
  v2 = jax.random.normal(k3, (n, 3))
  v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, -1, keepdims=True), 1e-8)
  o1 = model_apply(params, pts, method="query", view=v1)
  o2 = model_apply(params, pts, method="query", view=v2)
  density, rgb1 = o1[0], o1[1]
  rgb2 = o2[1]
  w = 1.0 - jnp.exp(-0.1 * jax.nn.relu(jax.lax.stop_gradient(density)))
  return jnp.mean(w[..., None] * jnp.square(rgb1 - rgb2))


def dyn_divergence(model_apply, params, key, n: int = 512):
  """Divergence penalty on the deformation field via the Hutchinson
  estimator: E[(εᵀ J_dp ε)²] with Rademacher ε (--dyn-diverge-decay)."""
  k1, k2, k3 = jax.random.split(key, 3)
  pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
  t = jax.random.uniform(k2, (n, 1))
  eps = jax.random.rademacher(k3, (n, 3), dtype=pts.dtype)

  def dp_fn(p):
    return model_apply(params, p, t, method="delta_x")

  _, jv = jax.jvp(dp_fn, (pts,), (eps,))
  div_est = jnp.sum(eps * jv, axis=-1)
  return jnp.mean(jnp.square(div_est))


def ffjord_div(model_apply, params, key, n: int = 512):
  """FFJORD stochastic divergence (first moment, not squared —
  reference runner.py:698-700 uses the raw estimator)."""
  k1, k2, k3 = jax.random.split(key, 3)
  pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
  t = jax.random.uniform(k2, (n, 1))
  eps = jax.random.rademacher(k3, (n, 3), dtype=pts.dtype)

  def dp_fn(p):
    return model_apply(params, p, t, method="delta_x")

  _, jv = jax.jvp(dp_fn, (pts,), (eps,))
  return jnp.mean(jnp.abs(jnp.sum(eps * jv, axis=-1)))


def spline_length(model_apply, params, key, n: int = 256, t_samples: int = 8):
  """Arc length of each point's deformation path over t ∈ [0,1] — short
  trajectories are physically plausible (reference runner.py:784)."""
  pts = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
  ts = jnp.linspace(0.0, 1.0, t_samples)
  ptsb = jnp.broadcast_to(pts, (t_samples, n, 3))
  tb = jnp.broadcast_to(ts[:, None, None], (t_samples, n, 1))
  dp = model_apply(params, ptsb, tb, method="delta_x")
  # eps-safe norm: the warp is zero-initialized, so the exact-zero diffs
  # at step 1 would NaN the gradient (same hazard as offset_nrnerf)
  seg = jnp.sqrt(
      jnp.sum(jnp.square(dp[1:] - dp[:-1]), axis=-1) + 1e-12)
  return jnp.mean(jnp.sum(seg, axis=0))


def ae_latent_l2(model_apply, params, key, n: int = 1024):
  """Point-sampled form of latent_l2 for the FUSED NeRFAE paths: mean
  pre-normalization encoder norm² over uniform random points. The
  oracle path reads the exact per-ray-sample value from the out dict
  (reference runner.py:681, src/nerf.py:810-812); the fused kernels
  don't emit the raw encoding, so the fused branches evaluate this
  estimator instead — same quantity, Monte-Carlo over space. Under
  normalize_latent this penalty is what prevents the encoder-norm
  runaway that froze the latent direction (the round-4 `ae` collapse;
  BENCH_NOTES round-5 entry)."""
  pts = jax.random.uniform(key, (n, 3), minval=-1.3, maxval=1.3)
  raw = model_apply(params, pts, method="encode_raw")
  return jnp.mean(jnp.sum(jnp.square(raw), -1))


def spline_pt0(model_apply, params, key, n: int = 256):
  """Pin the t=0 deformation to zero (canonical frame at t=0)."""
  pts = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
  dp0 = model_apply(params, pts, jnp.zeros((n, 1)), method="delta_x")
  return jnp.mean(jnp.square(dp0))


POINT_REGULARIZERS: Dict[str, Callable] = {
    "smooth_normals": smooth_normals,
    "eikonal_random": eikonal_random,
    "smooth_surface": smooth_surface,
    "smooth_occ": smooth_occ,
    "view_variance": view_variance,
    "dyn_divergence": dyn_divergence,
    "ffjord_div": ffjord_div,
    "spline_length": spline_length,
    "spline_pt0": spline_pt0,
}

# regs that take the smoothing knobs (--smooth-eps / --smooth-eps-rng /
# --smooth-n-ord)
_SMOOTH_REGS = {"smooth_normals": ("eps", "eps_rng", "ords"),
                "smooth_surface": ("eps", "eps_rng"),
                "smooth_occ": ("eps",)}


def point_regularizers(model, params, key, coeffs: Dict[str, float],
                       smooth_opts: Dict[str, Any] = None):
  """Sum of coeff * point-sampled reg for every nonzero coefficient.
  Traced inside the jitted train step (extra model evaluations)."""
  total = 0.0
  active = [(n, c) for n, c in coeffs.items()
            if c and n in POINT_REGULARIZERS]
  if not active:
    return total
  keys = jax.random.split(key, len(active))
  for k, (name, c) in zip(keys, active):
    kwargs = {}
    if smooth_opts and name in _SMOOTH_REGS:
      kwargs = {kk: smooth_opts[kk] for kk in _SMOOTH_REGS[name]
                if kk in smooth_opts}
    total = total + c * POINT_REGULARIZERS[name](model.apply, params, k,
                                                 **kwargs)
  return total
