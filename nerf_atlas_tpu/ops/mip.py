"""MipNeRF integrated positional encoding (IPE).

Casts each ray segment as a conic frustum (or cylinder), fits a Gaussian,
and computes E[sin] of the positionally-encoded Gaussian — the closed forms
from MipNeRF. Behavior parity: /root/reference/src/utils.py:23-141.

TPU-first layout: segments live on the trailing sample axis (t0/t1 are
[..., T]) and outputs are [..., T, 2*(max_deg-min_deg)*3]; the reference
instead moves time to the front. `radii` is an explicit argument — for flat
ray tiles there is no image neighborhood to difference, so the caller
supplies the per-ray footprint (pixel_radii helper) instead of the
reference's radii_x finite difference over the image grid.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


def expected_sin(x, x_var):
  """E[sin(z)], Var[sin(z)] for z ~ N(x, x_var)."""
  y = jnp.exp(-0.5 * x_var) * jnp.sin(x)
  y_var = jnp.maximum(
      0.5 * (1 - jnp.exp(-2 * x_var) * jnp.cos(2 * x)) - y**2, 0.0)
  return y, y_var


def lift_gaussian(r_d, t_mean, t_var, r_var):
  """Lift a 1-D Gaussian along the ray to a 3-D diagonal Gaussian.

  r_d: [..., 3]; t_mean/t_var/r_var: [..., T].
  Returns (mean [..., T, 3], cov_diag [..., T, 3]).
  """
  mean = t_mean[..., :, None] * r_d[..., None, :]
  magn_sq = jnp.maximum(jnp.sum(r_d**2, axis=-1, keepdims=True), 1e-10)
  outer_diag = r_d**2
  null_outer_diag = 1 - outer_diag / magn_sq
  t_cov_diag = t_var[..., :, None] * outer_diag[..., None, :]
  xy_cov_diag = r_var[..., :, None] * null_outer_diag[..., None, :]
  return mean, t_cov_diag + xy_cov_diag


def conical_frustum_to_gaussian(r_d, t0, t1, rad):
  """Gaussian fit of the conic frustum between t0 and t1 with base radius rad."""
  mu = (t1 + t0) / 2
  hw = (t1 - t0) / 2
  mu2 = mu * mu
  hw2 = hw * hw
  hw4 = hw2 * hw2
  denom = 3 * mu2 + hw2
  t_mean = mu + (2 * mu * hw2) / denom
  # MipNeRF closed form: hw^2/3 − … (the reference's src/utils.py:31 has a
  # dimensionally-wrong hw/3 — a latent bug we do not reproduce)
  t_var = hw2 / 3 - (4 / 15) * ((hw4 * (12 * mu2 - hw2)) / denom**2)
  r_var = rad * rad * (mu2 / 4 + (5 / 12) * hw2 - (4 / 15) * hw4 / denom)
  return lift_gaussian(r_d, t_mean, t_var, r_var)


def cylinder_to_gaussian(r_d, t0, t1, rad):
  t_mean = (t1 + t0) / 2
  r_var = rad * rad / 4
  t_var = (t1 - t0) ** 2 / 12
  return lift_gaussian(r_d, t_mean, t_var, r_var)


def integrated_pos_enc_diag(x, x_cov, min_deg: int, max_deg: int):
  """IPE features: E[sin] at 2^min_deg..2^(max_deg-1) scales, sin+cos pairs.

  x, x_cov: [..., 3] -> [..., 2*(max_deg-min_deg)*3].
  """
  scales = jnp.exp2(jnp.arange(min_deg, max_deg, dtype=x.dtype))
  shape = x.shape[:-1] + (-1,)
  y = (x[..., None, :] * scales[:, None]).reshape(shape)
  y_var = (x_cov[..., None, :] * (scales**2)[:, None]).reshape(shape)
  return expected_sin(
      jnp.concatenate([y, y + 0.5 * math.pi], axis=-1),
      jnp.concatenate([y_var, y_var], axis=-1),
  )[0]


def pixel_radii(focal, dtype=jnp.float32):
  """Per-pixel cone base radius for a pinhole camera with `focal` (in px):
  adjacent ray directions differ by ~1/focal; MipNeRF scales by 2/sqrt(12)."""
  return jnp.asarray(focal, dtype) ** -1 * (2.0 / math.sqrt(12.0))


def radii_from_dirs(r_d_grid):
  """Reference-parity footprint from an image grid of directions
  (src/utils.py:77-81): finite difference along the x axis of [..., H, W, 3].
  Returns [..., H, W, 1]."""
  dx = jnp.sqrt(jnp.sum(
      (r_d_grid[..., :-1, :, :] - r_d_grid[..., 1:, :, :]) ** 2, axis=-1))
  dx = jnp.concatenate([dx, dx[..., -2:-1, :]], axis=-2)
  return dx[..., None] * 2 / math.sqrt(12)


@dataclass(frozen=True)
class ConicGaussian:
  """Cone-footprint IPE; call with rays + segment bounds."""
  min_deg: int = 0
  max_deg: int = 16

  def size(self) -> int:
    return self.max_deg - self.min_deg

  def __call__(self, r_o, r_d, t0, t1, rad):
    mean, cov = conical_frustum_to_gaussian(r_d, t0, t1, rad)
    mean = mean + r_o[..., None, :]
    return integrated_pos_enc_diag(mean, cov, self.min_deg, self.max_deg)


@dataclass(frozen=True)
class CylinderGaussian:
  min_deg: int = 0
  max_deg: int = 16

  def size(self) -> int:
    return self.max_deg - self.min_deg

  def __call__(self, r_o, r_d, t0, t1, rad):
    mean, cov = cylinder_to_gaussian(r_d, t0, t1, rad)
    mean = mean + r_o[..., None, :]
    return integrated_pos_enc_diag(mean, cov, self.min_deg, self.max_deg)


def load_mip(kind):
  """kind: None | 'cone' | 'cylinder' (reference src/utils.py:119-124)."""
  if kind is None:
    return None
  if kind == "cone":
    return ConicGaussian()
  if kind == "cylinder":
    return CylinderGaussian()
  raise NotImplementedError(f"Unknown mip kind {kind}")


def mip_segments(ts):
  """Segment bounds (t0, t1) for IPE from sample ts [..., T].

  The reference appends a 1e10 tail (src/nerf.py:257-261), but that
  overflows the conic-frustum variance in float32 (hw^4 ≈ 6e38 → inf →
  NaN features) — a latent reference bug. Intended behavior: the tail
  segment reuses the last finite segment width, keeping every IPE
  feature finite.
  """
  last_dt = ts[..., -1:] - ts[..., -2:-1]
  end_val = ts[..., -1:] + jnp.maximum(last_dt, 1e-5)
  ts_ext = jnp.concatenate([ts, end_val], axis=-1)
  return ts_ext[..., :-1], ts_ext[..., 1:]
