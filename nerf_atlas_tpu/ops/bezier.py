"""Bezier spline kit: de Casteljau evaluation, derivatives, Frenet frames,
cubic fast path, and arc-length quadrature.

Behavior parity: /root/reference/src/nerf.py:1172-1206, 1509-1523.
Control points live on axis 0 ([N, ...]); N is static so the de Casteljau
reduction unrolls into N-1 fused multiply-adds — pure VPU work that XLA
fuses into the surrounding spline-deformation computation.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import normalize


def de_casteljau(coeffs, t, N: int):
  """Evaluate a Bezier curve with N control points (axis 0) at t.

  t broadcasts against coeffs[i]; returns the same shape as one control
  point (leading singleton squeezed, as in the reference).
  """
  betas = coeffs
  m1t = 1 - t
  for _ in range(1, N):
    betas = betas[:-1] * m1t + betas[1:] * t
  return betas.squeeze(0) if betas.shape[0] == 1 else betas


def bezier_derivative(coeffs, t, N: int, deriv: int = 1):
  """Evaluate the `deriv`-th derivative of the Bezier curve at t.

  Uses the correct degree factor (N-1) — the reference scales by N, an
  off-by-one it only ever uses through normalized quantities.
  """
  assert deriv >= 0, "Must take a positive number of derivatives"
  for _ in range(deriv):
    coeffs = (N - 1) * (coeffs[1:] - coeffs[:-1])
    N -= 1
  return de_casteljau(coeffs, t, N)


def frenet_normal(coeffs, t, N: int):
  """Frenet normal of the curve at t (for rig-point orientation)."""
  a = normalize(bezier_derivative(coeffs, t, N))
  b = normalize(a + bezier_derivative(coeffs, t, N, deriv=2))
  r = normalize(jnp.cross(a, b))
  return normalize(jnp.cross(a, r))


def cubic_bezier(coeffs, t, N: int):
  """Closed-form cubic evaluation (fast path for N=4)."""
  assert N == 4, f"Must be cubic, got {N}"
  m1t = 1 - t
  m1t_sq, t_sq = m1t * m1t, t * t
  k = jnp.stack([m1t_sq * m1t, 3 * m1t_sq * t, 3 * t_sq * m1t, t_sq * t],
                axis=0)
  if k.ndim < coeffs.ndim:  # scalar / low-rank t: pad for broadcasting
    k = k.reshape(k.shape + (1,) * (coeffs.ndim - k.ndim))
  return jnp.sum(k * coeffs, axis=0)


def arc_len(ctrl_pts, samples: int = 16):
  """Approximate arc length by piecewise-linear quadrature over `samples`
  uniformly spaced evaluations. ctrl_pts: [N, ..., 3]; returns [...]."""
  N = ctrl_pts.shape[0]
  t = jnp.linspace(0.0, 1.0, samples, dtype=ctrl_pts.dtype)
  # broadcast t over a new sample axis right after the control-point axis
  t_shaped = t.reshape((1, samples) + (1,) * (ctrl_pts.ndim - 1))
  pts = de_casteljau(ctrl_pts[:, None], t_shaped, N)  # [samples, ..., 3]
  return jnp.sum(
      jnp.linalg.norm(pts[1:] - pts[:-1], axis=-1), axis=0)
