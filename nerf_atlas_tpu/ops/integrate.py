"""Volumetric integration: density→alpha, transmittance, weighted sums,
and sky/background models.

Reference semantics being matched (src/nerf.py:22-109):
  - sigma = softplus(density - 1)  (or relu);
  - dists = diff(ts) with a 1e10 tail, clamped >= 1e-5, scaled by ||r_d||;
  - alpha = 1 - exp(-sigma * dists);
  - weights = alpha * exclusive_cumprod(1 - alpha + 1e-10)  along samples;
  - image = sum_T weights * rgb  (+ background on leftover transmittance).

TPU-first layout: the sample axis T is LAST on density/ts/alpha/weights
([..., T]) and second-to-last on per-sample features ([..., T, C]).
The exclusive product is a parallel prefix scan along T (XLA lowers
cumprod to a log-depth associative scan); a fused Pallas kernel replaces
this path for the flagship models in ops/pallas.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def exclusive_cumprod(t, axis: int = -1):
  """Exclusive running product along `axis`: out[0]=1, out[i]=prod(t[:i])."""
  cp = jnp.cumprod(t, axis=axis)
  cp = jnp.roll(cp, 1, axis=axis)
  # zero out the wrapped element -> 1
  idx = [slice(None)] * cp.ndim
  idx[axis] = slice(0, 1)
  return cp.at[tuple(idx)].set(1.0)


def dists_from_ts(ts, r_d=None):
  """Segment lengths between consecutive t samples, with an infinite tail.

  ts: [T] or [..., T]; r_d: optional [..., 3] (scales by direction norm so
  sigma is per-world-unit even for unnormalized directions).
  Returns [..., T] broadcastable against density.
  """
  end_val = jnp.full_like(ts[..., :1], 1e10)
  dists = jnp.concatenate([ts[..., 1:] - ts[..., :-1], end_val], axis=-1)
  dists = jnp.maximum(dists, 1e-5)
  if r_d is not None:
    dists = dists * jnp.linalg.norm(r_d, axis=-1, keepdims=True)
  return dists


def alpha_from_density(density, ts, r_d=None, *, softplus: bool = True):
  """density [..., T] -> (alpha [..., T], weights [..., T])."""
  sigma = jax.nn.softplus(density - 1) if softplus else jax.nn.relu(density)
  dists = dists_from_ts(ts, r_d)
  alpha = 1 - jnp.exp(-sigma * dists)
  return alpha, alpha_composite(alpha)


def alpha_composite(alpha, axis: int = -1):
  """weights_i = alpha_i * prod_{j<i} (1 - alpha_j)."""
  return alpha * exclusive_cumprod(1.0 - alpha + 1e-10, axis=axis)


def volumetric_integrate(weights, other):
  """weights [..., T], other [..., T, C] -> [..., C]."""
  return jnp.sum(weights[..., None] * other, axis=-2)


def sparse_volumetric_integrate(weights, other, eps: float = 1e-3):
  """Masked variant: tiny-weight samples contribute a constant instead of
  their (expensive) value — numerically matches the reference's sparse path
  (src/nerf.py:88-92)."""
  vals = jnp.where(weights[..., None] > eps, other, jnp.full_like(other, 1e-3))
  return jnp.sum(weights[..., None] * vals, axis=-2)


def depth_from_weights(weights, ts):
  """Expected termination depth along each ray: sum_T w * t."""
  if ts.ndim == 1:
    ts = jnp.broadcast_to(ts, weights.shape)
  return jnp.sum(weights * ts, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# backgrounds (reference src/nerf.py:95-109)
# the leftover transmittance is 1 - sum of all-but-last weights; the last
# sample's weight is excluded because its bin is the infinite tail.
# ---------------------------------------------------------------------------

def leftover_transmittance(weights):
  return 1 - jnp.sum(weights[..., :-1], axis=-1, keepdims=True)


def bg_black(weights, *, key=None, elaz_r_d=None):
  del key, elaz_r_d
  return jnp.zeros(weights.shape[:-1] + (1,), weights.dtype)


def bg_white(weights, *, key=None, elaz_r_d=None):
  del key, elaz_r_d
  return leftover_transmittance(weights)


def bg_random(weights, *, key=None, elaz_r_d=None):
  del elaz_r_d
  rem = leftover_transmittance(weights)
  if key is None:
    return jnp.zeros_like(rem)  # eval mode: no random bg
  return jax.random.uniform(key, rem.shape, rem.dtype) * rem


SKY_KINDS = {
    "black": bg_black,
    "white": bg_white,
    "random": bg_random,
    "mlp": "MLP_MARKER",  # resolved by the model (needs parameters)
}


def load_sky(kind: str) -> Callable:
  fn = SKY_KINDS.get(kind)
  if fn is None:
    raise NotImplementedError(f"Unknown bg kind {kind}")
  return fn
